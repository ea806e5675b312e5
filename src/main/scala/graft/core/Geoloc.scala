package graft.core

/** Non-affine georeferencing: ground control points and rational polynomial
  * coefficients — the reference's GCP/RPC surface
  * (rioxarray/rioxarray.py:982-1134 write/get, raster_array.py:355-375 merge
  * into reproject kwargs; storage format _spatial_utils.py:271-303).
  *
  * The reference delegates the actual solve/warp to GDAL's transformers; here
  * the solvers are re-derived from the public math: a 4-5-point plane
  * homography (GDAL 3.11+ METHOD=GCP_HOMOGRAPHY default, OSGeo/gdal#11949),
  * an order-1 least-squares polynomial for larger GCP sets, and the RPC00B
  * rational-cubic ground→image model. All solves are tiny (driver-side,
  * deterministic Gaussian elimination); the per-pixel warp stays pure Column
  * arithmetic so the distributed path never leaves codegen. */
final case class Gcp(row: Double, col: Double, x: Double, y: Double,
                     z: Double = 0.0, id: String = "", info: String = "")

/** 2-D polynomial transform of order 2 or 3: out = Σ cᵢ·termᵢ(u, v) per
  * coordinate, monomial order fixed (see [[Poly2D.terms]]) so the scalar,
  * Column and SQL evaluations stay in arithmetic lockstep. */
final case class Poly2D(cx: Array[Double], cy: Array[Double], order: Int) {
  require(cx.length == Poly2D.nTerms(order) && cy.length == cx.length)

  def apply(u: Double, v: Double): (Double, Double) = {
    val t = Poly2D.terms(u, v, order)
    var x = 0.0; var y = 0.0; var i = 0
    while (i < t.length) { x += cx(i) * t(i); y += cy(i) * t(i); i += 1 }
    (x, y)
  }
}

object Poly2D {
  def nTerms(order: Int): Int = order match {
    case 2 => 6
    case 3 => 10
    case o => throw new IllegalArgumentException(s"poly order 2 or 3, got $o")
  }

  /** Monomial basis in the FIXED order [1, u, v, u², u·v, v²] (+ order 3:
    * [u³, u²·v, u·v², v³]); every evaluator (scalar here,
    * WarpOps.poly2dColumns, WarpOps.poly2dSql) iterates this order with
    * left-to-right addition for bit-identical sums. */
  def terms(u: Double, v: Double, order: Int): Array[Double] = {
    val base = Array(1.0, u, v, u * u, u * v, v * v)
    if (order == 2) base
    else base ++ Array(u * u * u, u * u * v, u * v * v, v * v * v)
  }
}

/** Plane projective transform image(col,row) → ground(x,y), row-major 3x3
  * with m(8) normalized to 1 after fit. Closed under inversion (adjugate),
  * which is what makes the inverse warp a pure projection. */
final case class Homography(m: Array[Double]) {
  require(m.length == 9, "homography is 3x3 row-major")

  def apply(c: Double, r: Double): (Double, Double) = {
    val w = m(6) * c + m(7) * r + m(8)
    ((m(0) * c + m(1) * r + m(2)) / w, (m(3) * c + m(4) * r + m(5)) / w)
  }

  /** Adjugate transpose-of-cofactors inverse; scale-invariant (homographies
    * are projective), so no division by the determinant is needed. */
  def invert: Homography = {
    val a = m
    Homography(Array(
      a(4) * a(8) - a(5) * a(7), a(2) * a(7) - a(1) * a(8), a(1) * a(5) - a(2) * a(4),
      a(5) * a(6) - a(3) * a(8), a(0) * a(8) - a(2) * a(6), a(2) * a(3) - a(0) * a(5),
      a(3) * a(7) - a(4) * a(6), a(1) * a(6) - a(0) * a(7), a(0) * a(4) - a(1) * a(3)))
  }

  def isAffine: Boolean = m(6) == 0.0 && m(7) == 0.0
}

object Geoloc {

  /** Deterministic Gaussian elimination with partial pivoting (in-place on
    * copies). n is at most 8 here — driver-side cost is nil. */
  def solve(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val n = b0.length
    val a = a0.map(_.clone()); val b = b0.clone()
    var i = 0
    while (i < n) {
      var p = i; var j = i + 1
      while (j < n) { if (math.abs(a(j)(i)) > math.abs(a(p)(i))) p = j; j += 1 }
      if (p != i) { val t = a(i); a(i) = a(p); a(p) = t; val tb = b(i); b(i) = b(p); b(p) = tb }
      require(a(i)(i) != 0.0, "singular GCP system (degenerate control points)")
      j = i + 1
      while (j < n) {
        val f = a(j)(i) / a(i)(i)
        var k = i
        while (k < n) { a(j)(k) -= f * a(i)(k); k += 1 }
        b(j) -= f * b(i)
        j += 1
      }
      i += 1
    }
    val x = new Array[Double](n)
    i = n - 1
    while (i >= 0) {
      var s = b(i); var k = i + 1
      while (k < n) { s -= a(i)(k) * x(k); k += 1 }
      x(i) = s / a(i)(i)
      i -= 1
    }
    x
  }

  /** Homography fit image(col,row)→ground(x,y). Exact for 4 GCPs (the 8x8
    * DLT system), least-squares via normal equations for more. */
  def fitHomography(gcps: Seq[Gcp]): Homography = {
    require(gcps.size >= 4, s"homography needs >= 4 GCPs, got ${gcps.size}")
    // rows of the DLT design matrix (unknowns h0..h7, h8 = 1)
    val rows = gcps.flatMap { g =>
      Seq(
        (Array(g.col, g.row, 1.0, 0.0, 0.0, 0.0, -g.col * g.x, -g.row * g.x), g.x),
        (Array(0.0, 0.0, 0.0, g.col, g.row, 1.0, -g.col * g.y, -g.row * g.y), g.y))
    }
    val h =
      if (gcps.size == 4) solve(rows.map(_._1).toArray, rows.map(_._2).toArray)
      else { // normal equations AᵀA h = AᵀB
        val ata = Array.fill(8)(new Array[Double](8)); val atb = new Array[Double](8)
        rows.foreach { case (r, v) =>
          var i = 0
          while (i < 8) {
            var j = 0
            while (j < 8) { ata(i)(j) += r(i) * r(j); j += 1 }
            atb(i) += r(i) * v; i += 1
          }
        }
        solve(ata, atb)
      }
    Homography(h :+ 1.0)
  }

  /** Order-1 polynomial (affine) least-squares fit image(col,row)→ground —
    * GDAL's GCP polynomial transformer at order 1. Exact for 3 GCPs. */
  def fitAffine(gcps: Seq[Gcp]): Affine = {
    require(gcps.size >= 3, s"affine GCP fit needs >= 3 GCPs, got ${gcps.size}")
    val ata = Array.fill(3)(new Array[Double](3))
    val atx = new Array[Double](3); val aty = new Array[Double](3)
    gcps.foreach { g =>
      val r = Array(g.col, g.row, 1.0)
      var i = 0
      while (i < 3) {
        var j = 0
        while (j < 3) { ata(i)(j) += r(i) * r(j); j += 1 }
        atx(i) += r(i) * g.x; aty(i) += r(i) * g.y; i += 1
      }
    }
    val cx = solve(ata, atx); val cy = solve(ata, aty)
    Affine(cx(0), cx(1), cx(2), cy(0), cy(1), cy(2))
  }

  /** General polynomial GCP fit at order 2 or 3 (GDAL GCP polynomial
    * transformer orders beyond the golden-matched order 1): least-squares
    * of each output coordinate over the monomial basis
    *   order 2: [1, u, v, u², u·v, v²]                  (>= 6 GCPs)
    *   order 3: [+ u³, u²·v, u·v², v³]                  (>= 10 GCPs)
    * `swap = false` fits image(col,row) → ground(x,y) (the forward
    * transformer); `swap = true` fits ground → image — GDAL's convention
    * for the inverse direction is exactly this second fit over the same
    * GCPs (no per-pixel iteration), which is what makes the order-2/3
    * warp fully distributable. */
  def fitPoly(gcps: Seq[Gcp], order: Int, swap: Boolean = false): Poly2D = {
    val nTerms = Poly2D.nTerms(order)
    require(gcps.size >= nTerms,
      s"order-$order polynomial fit needs >= $nTerms GCPs, got ${gcps.size}")
    val ata = Array.fill(nTerms)(new Array[Double](nTerms))
    val atx = new Array[Double](nTerms); val aty = new Array[Double](nTerms)
    gcps.foreach { g =>
      val (u, v, ox, oy) =
        if (swap) (g.x, g.y, g.col, g.row) else (g.col, g.row, g.x, g.y)
      val t = Poly2D.terms(u, v, order)
      var i = 0
      while (i < nTerms) {
        var j = 0
        while (j < nTerms) { ata(i)(j) += t(i) * t(j); j += 1 }
        atx(i) += t(i) * ox; aty(i) += t(i) * oy; i += 1
      }
    }
    Poly2D(solve(ata, atx), solve(ata, aty), order) // solve copies internally
  }

  /** GDAL 3.11+ method selection: homography for 4-5 GCPs, polynomial
    * (order 1 here) otherwise (reference golden
    * test_integration_rioxarray.py:1185-1194). 3 GCPs = exact affine. */
  def fitAuto(gcps: Seq[Gcp]): Homography = gcps.size match {
    case n if n >= 4 && n <= 5 => fitHomography(gcps)
    case _ =>
      val a = fitAffine(gcps)
      Homography(Array(a.a, a.b, a.c, a.d, a.e, a.f, 0.0, 0.0, 1.0))
  }

  /** Suggested warp output for a GCP-referenced source: GDAL's
    * SuggestedWarpOutput sampling (21 points per image edge through the
    * fitted transformer, square pixel sized so the transformed image
    * diagonal keeps its pixel count) — same scheme as
    * GridRef.suggestedWarpOutput but the georeferencing is the GCP
    * transform, not the raster's affine. Validated against the reference
    * golden (test_integration_rioxarray.py:1194-1233: 1027x923 at
    * 216.8587081056465). */
  def suggestedWarpOutputGcp(srcW: Int, srcH: Int, h: Homography,
                             gcpCrs: Crs, dstCrs: Crs, nodata: Double): GridRef =
    suggestedWarpOutputGcpFwd(srcW, srcH, (c, r) => h(c, r), gcpCrs, dstCrs, nodata)

  /** [[suggestedWarpOutputGcp]] over ANY image→ground transformer (the
    * order-2/3 polynomial warps reuse the identical edge-sampling). */
  def suggestedWarpOutputGcpFwd(srcW: Int, srcH: Int,
                                transform: (Double, Double) => (Double, Double),
                                gcpCrs: Crs, dstCrs: Crs, nodata: Double): GridRef = {
    val nSteps = 21
    def fwd(c: Double, r: Double): (Double, Double) = {
      val (gx, gy) = transform(c, r)
      if (gcpCrs == dstCrs) (gx, gy) else Crs.reprojectPoint(gx, gy, gcpCrs, dstCrs)
    }
    var minx = Double.PositiveInfinity; var miny = Double.PositiveInfinity
    var maxx = Double.NegativeInfinity; var maxy = Double.NegativeInfinity
    var iStep = 0
    while (iStep < nSteps) {
      val t = if (iStep == nSteps - 1) 1.0 else iStep.toDouble / (nSteps - 1)
      val pts = Array((t * srcW, 0.0), (t * srcW, srcH.toDouble),
                      (0.0, t * srcH), (srcW.toDouble, t * srcH))
      var j = 0
      while (j < 4) {
        val (px, py) = fwd(pts(j)._1, pts(j)._2)
        if (px < minx) minx = px; if (px > maxx) maxx = px
        if (py < miny) miny = py; if (py > maxy) maxy = py
        j += 1
      }
      iStep += 1
    }
    val (tlx, tly) = fwd(0, 0); val (brx, bry) = fwd(srcW, srcH)
    val dx = brx - tlx; val dy = bry - tly
    val pixel = math.sqrt(dx * dx + dy * dy) /
      math.sqrt(srcW.toDouble * srcW + srcH.toDouble * srcH)
    val nPixels = ((maxx - minx) / pixel + 0.5).toInt
    val nLines = ((maxy - miny) / pixel + 0.5).toInt
    GridRef(dstCrs, Affine.northUp(minx, maxy, pixel, pixel), nPixels, nLines, nodata)
  }
}

/** RPC00B rational polynomial camera model (public NITF/GDAL convention):
  * normalized ground (P=lat, L=lon, H=height) → normalized image (line,
  * sample), each as a ratio of 20-term cubic polynomials. Ground→image is
  * the model's native direction — exactly the direction an inverse warp
  * needs, so the distributed path has no iteration at all; image→ground
  * (needed only to size the destination grid) is a driver-side Newton
  * iteration. Term order below is the standard RPC00B sequence. */
final case class Rpc(
    lineOff: Double, sampOff: Double, latOff: Double, longOff: Double, heightOff: Double,
    lineScale: Double, sampScale: Double, latScale: Double, longScale: Double, heightScale: Double,
    lineNum: Array[Double], lineDen: Array[Double],
    sampNum: Array[Double], sampDen: Array[Double]) {
  require(Seq(lineNum, lineDen, sampNum, sampDen).forall(_.length == 20),
    "RPC00B polynomials have 20 coefficients")

  /** The 20 RPC00B monomials in standard order. Any engine evaluating the
    * same list left-to-right gets bit-identical sums — the SQL oracle mirrors
    * this exact sequence textually (WarpOps.rpcTermsSql). */
  def terms(p: Double, l: Double, h: Double): Array[Double] = Array(
    1.0, l, p, h, l * p, l * h, p * h, l * l, p * p, h * h,
    p * l * h, l * l * l, l * p * p, l * h * h, l * l * p, p * p * p,
    p * h * h, l * l * h, p * p * h, h * h * h)

  private def poly(c: Array[Double], t: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < 20) { s += c(i) * t(i); i += 1 }
    s
  }

  /** Ground (lon, lat degrees; height metres) → image (row=line, col=samp). */
  def groundToImage(lon: Double, lat: Double, height: Double): (Double, Double) = {
    val p = (lat - latOff) / latScale
    val l = (lon - longOff) / longScale
    val h = (height - heightOff) / heightScale
    val t = terms(p, l, h)
    (poly(lineNum, t) / poly(lineDen, t) * lineScale + lineOff,
     poly(sampNum, t) / poly(sampDen, t) * sampScale + sampOff)
  }

  /** Image (row, col) → ground (lon, lat) at fixed height: damped 2D Newton
    * on the ground→image model with numeric Jacobian. Driver-side only
    * (sizing the destination grid); the distributed warp never calls this. */
  def imageToGround(row: Double, col: Double, height: Double,
                    iters: Int = 20): (Double, Double) = {
    var lon = longOff; var lat = latOff
    val dl = 1e-7 * longScale; val dp = 1e-7 * latScale
    var i = 0
    while (i < iters) {
      val (r0, c0) = groundToImage(lon, lat, height)
      val (rl, cl) = groundToImage(lon + dl, lat, height)
      val (rp, cp) = groundToImage(lon, lat + dp, height)
      val j00 = (rl - r0) / dl; val j01 = (rp - r0) / dp
      val j10 = (cl - c0) / dl; val j11 = (cp - c0) / dp
      val det = j00 * j11 - j01 * j10
      require(det != 0.0, "degenerate RPC Jacobian")
      val er = row - r0; val ec = col - c0
      lon += (er * j11 - j01 * ec) / det
      lat += (j00 * ec - er * j10) / det
      i += 1
    }
    (lon, lat)
  }

  /** JSON dict in the reference's storage shape (rioxarray.py:1109 stores
    * rasterio RPC.to_dict(); keys follow that public naming). */
  def toJson: String = {
    def arr(a: Array[Double]) = a.map(Json.num).mkString("[", ", ", "]")
    s"""{"height_off": ${Json.num(heightOff)}, "height_scale": ${Json.num(heightScale)}, """ +
      s""""lat_off": ${Json.num(latOff)}, "lat_scale": ${Json.num(latScale)}, """ +
      s""""line_den_coeff": ${arr(lineDen)}, "line_num_coeff": ${arr(lineNum)}, """ +
      s""""line_off": ${Json.num(lineOff)}, "line_scale": ${Json.num(lineScale)}, """ +
      s""""long_off": ${Json.num(longOff)}, "long_scale": ${Json.num(longScale)}, """ +
      s""""samp_den_coeff": ${arr(sampDen)}, "samp_num_coeff": ${arr(sampNum)}, """ +
      s""""samp_off": ${Json.num(sampOff)}, "samp_scale": ${Json.num(sampScale)}}"""
  }
}

object Rpc {
  def fromJson(json: String): Rpc = {
    val n = Json.parse(json)
    def d(k: String) = n.get(k).asDouble()
    def a(k: String) = {
      val arr = n.get(k)
      Array.tabulate(arr.size())(i => arr.get(i).asDouble())
    }
    Rpc(d("line_off"), d("samp_off"), d("lat_off"), d("long_off"), d("height_off"),
        d("line_scale"), d("samp_scale"), d("lat_scale"), d("long_scale"), d("height_scale"),
        a("line_num_coeff"), a("line_den_coeff"), a("samp_num_coeff"), a("samp_den_coeff"))
  }
}

/** Minimal JSON helpers over the jackson-core shipped with Spark. */
object Json {
  def num(v: Double): String =
    if (v == v.toLong.toDouble && math.abs(v) < 1e15) v.toLong.toString else v.toString
  def str(s: String): String = {
    // control characters (newlines in CF long_name, tabs in multi-line WKT)
    // must be escaped or the emitted sidecar is invalid JSON and every
    // subsequent open of the store fails in parse (ADVICE r3)
    val b = new StringBuilder(s.length + 2).append('"')
    s.foreach {
      case '\\' => b.append("\\\\")
      case '"' => b.append("\\\"")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < 0x20 => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"').toString
  }
  def parse(s: String): com.fasterxml.jackson.databind.JsonNode =
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(s)

  /** String-map <-> JSON object (attrs persistence in the _grid sidecar). */
  def obj(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) => s"${str(k)}: ${str(v)}" }
      .mkString("{", ", ", "}")
  def toMap(json: String): Map[String, String] = {
    val node = parse(json)
    val it = node.fields()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue.asText()) }
    b.result()
  }
}
