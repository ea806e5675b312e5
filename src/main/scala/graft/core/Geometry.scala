package graft.core

/** Minimal planar geometry: WKT parse (POINT / POLYGON / MULTIPOLYGON),
  * bbox, ray-casting point-in-polygon with holes.
  *
  * Mirrors the semantics the reference gets from rasterio.features
  * geometry_mask (pixel-centre point-in-polygon, all_touched=False;
  * rioxarray/_spatial_utils.py:468-503) — re-implemented from the standard
  * even-odd crossing rule, not ported.
  */
final case class Ring(xs: Array[Double], ys: Array[Double]) {
  def size: Int = xs.length
}

final case class Polygon(shell: Ring, holes: Seq[Ring] = Nil) {
  lazy val bbox: Bounds = {
    var minx = Double.PositiveInfinity; var miny = Double.PositiveInfinity
    var maxx = Double.NegativeInfinity; var maxy = Double.NegativeInfinity
    var i = 0
    while (i < shell.size) {
      val x = shell.xs(i); val y = shell.ys(i)
      if (x < minx) minx = x; if (x > maxx) maxx = x
      if (y < miny) miny = y; if (y > maxy) maxy = y
      i += 1
    }
    Bounds(minx, miny, maxx, maxy)
  }

  /** Even-odd crossing test. The crossing predicate
    * `(y1 > py) != (y2 > py) && px < x1 + (py - y1) * (x2 - x1) / (y2 - y1)`
    * is written identically in the SQL oracles so results are bit-stable. */
  def contains(px: Double, py: Double): Boolean = {
    var inside = Geometry.ringCrossings(shell, px, py)
    holes.foreach { h => if (Geometry.ringCrossings(h, px, py)) inside = !inside }
    inside
  }
}

final case class Geom(polygons: Seq[Polygon]) {
  lazy val bbox: Bounds = polygons.map(_.bbox).reduce(_ union _)
  def contains(px: Double, py: Double): Boolean = polygons.exists(_.contains(px, py))
  /** All (x1,y1,x2,y2, ringId) edges — the relational form used by the
    * edge-join PIP pipeline and its SQL oracle. */
  def edges: Seq[(Double, Double, Double, Double)] =
    polygons.flatMap { p =>
      (p.shell +: p.holes.toIndexedSeq).flatMap { r =>
        (0 until r.size).map { i =>
          val j = (i + 1) % r.size
          (r.xs(i), r.ys(i), r.xs(j), r.ys(j))
        }
      }
    }
}

object Geometry {

  def ringCrossings(r: Ring, px: Double, py: Double): Boolean = {
    var inside = false
    var i = 0
    val n = r.size
    while (i < n) {
      val j = (i + 1) % n
      val x1 = r.xs(i); val y1 = r.ys(i)
      val x2 = r.xs(j); val y2 = r.ys(j)
      if ((y1 > py) != (y2 > py) &&
          px < x1 + (py - y1) * (x2 - x1) / (y2 - y1)) inside = !inside
      i += 1
    }
    inside
  }

  // ---- WKT ---------------------------------------------------------------

  def parseWkt(wkt: String): Geom = {
    val s = wkt.trim
    val upper = s.toUpperCase
    if (upper.startsWith("MULTIPOLYGON")) {
      val body = s.substring(s.indexOf('(') + 1, s.lastIndexOf(')'))
      Geom(splitTop(body).map(p => parsePolygonBody(stripParens(p))))
    } else if (upper.startsWith("POLYGON")) {
      val body = s.substring(s.indexOf('(') + 1, s.lastIndexOf(')'))
      Geom(Seq(parsePolygonBody(body)))
    } else if (upper.startsWith("POINT")) {
      val body = s.substring(s.indexOf('(') + 1, s.lastIndexOf(')'))
      val Array(x, y) = body.trim.split("\\s+").map(_.toDouble)
      // a point as a degenerate geom (bbox queries); contains() is false
      Geom(Seq(Polygon(Ring(Array(x), Array(y)))))
    } else throw new IllegalArgumentException(s"unsupported WKT: ${s.take(40)}")
  }

  private def stripParens(s: String): String = {
    val t = s.trim
    if (t.startsWith("(") && t.endsWith(")")) t.substring(1, t.length - 1) else t
  }

  /** Split on top-level commas (depth 0). */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var start = 0; var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.result()
  }

  private def parseRing(body: String): Ring = {
    val pts = body.trim.split(",").map { p =>
      val c = p.trim.split("\\s+")
      (c(0).toDouble, c(1).toDouble)
    }
    // drop closing point if it repeats the first
    val open = if (pts.length > 1 && pts.head == pts.last) pts.dropRight(1) else pts
    Ring(open.map(_._1), open.map(_._2))
  }

  private def parsePolygonBody(body: String): Polygon = {
    val rings = splitTop(body).map(r => parseRing(stripParens(r)))
    Polygon(rings.head, rings.tail)
  }

  def toWkt(g: Geom): String = {
    def ringStr(r: Ring): String = {
      val pts = (0 until r.size).map(i => s"${r.xs(i)} ${r.ys(i)}")
      val closed = pts :+ s"${r.xs(0)} ${r.ys(0)}"
      closed.mkString("(", ", ", ")")
    }
    def polyStr(p: Polygon): String =
      (p.shell +: p.holes.toIndexedSeq).map(ringStr).mkString("(", ", ", ")")
    if (g.polygons.size == 1) s"POLYGON ${polyStr(g.polygons.head)}"
    else s"MULTIPOLYGON ${g.polygons.map(polyStr).mkString("(", ", ", ")")}"
  }
}
