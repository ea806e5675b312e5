package graft.core

import java.util.Locale

/** Map projection: geodetic (lonDeg, latDeg) <-> planar (x, y).
  *
  * Pure JVM re-implementations (no PROJ available offline) of the five
  * projection families exercised by the reference test fixtures
  * (see the CRS strings of the reference test_data input fixtures and
  * rioxarray/crs.py:13-45 for accepted CRS input forms):
  * longlat, sinusoidal (sphere), transverse Mercator / UTM (ellipsoidal,
  * Karney series), Mercator (ellipsoidal), Web-Mercator (spherical 3857).
  * Transverse-Mercator uses the 6th-order Krueger-n series from
  * C.F.F. Karney, "Transverse Mercator with an accuracy of a few
  * nanometers", J. Geodesy 85(8), 2011 (public).
  */
sealed trait Projection extends Serializable {
  def forward(lonDeg: Double, latDeg: Double): (Double, Double)
  def inverse(x: Double, y: Double): (Double, Double)
  /** True when planar coords ARE degrees (identity projection). */
  def isGeographic: Boolean = false
}

object Projection {
  val D2R: Double = math.Pi / 180.0
  val R2D: Double = 180.0 / math.Pi
  /** WGS84 ellipsoid. */
  val WGS84_A = 6378137.0
  val WGS84_F = 1.0 / 298.257223563
}

case object LongLat extends Projection {
  def forward(lonDeg: Double, latDeg: Double): (Double, Double) = (lonDeg, latDeg)
  def inverse(x: Double, y: Double): (Double, Double) = (x, y)
  override def isGeographic: Boolean = true
}

/** Spherical sinusoidal (the MODIS grid: +proj=sinu +a=6371007.181 +b=...). */
final case class Sinusoidal(radius: Double, lon0Deg: Double = 0.0) extends Projection {
  import Projection._
  def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
    val lam = (lonDeg - lon0Deg) * D2R
    val phi = latDeg * D2R
    (radius * lam * math.cos(phi), radius * phi)
  }
  def inverse(x: Double, y: Double): (Double, Double) = {
    val phi = y / radius
    val lam = x / (radius * math.cos(phi))
    (lam * R2D + lon0Deg, phi * R2D)
  }
}

/** Shared ellipsoidal conformal-latitude helpers. */
object EllipsoidMath {
  /** isometric latitude psi(phi): asinh(tan phi) - e*atanh(e*sin phi) */
  def isometric(phiRad: Double, e: Double): Double = {
    val s = math.sin(phiRad)
    asinh(math.tan(phiRad)) - e * atanh(e * s)
  }
  /** Number of fixed-point iterations for the isometric-latitude inverse.
    * Fixed (no early stop) so the scalar path and the unrolled Catalyst
    * Column path produce bit-identical results. Convergence factor ~e^2
    * (0.0067 for WGS84): 8 iterations converge far below 1 ulp. */
  val InvIterations = 8

  /** inverse of isometric latitude by fixed-point iteration:
    * sin(phi) = tanh(psi + e*atanh(e*sin(phi))). */
  def isometricInv(psi: Double, e: Double): Double = {
    var sphi = math.tanh(psi)
    var i = 0
    while (i < InvIterations) {
      sphi = math.tanh(psi + e * atanh(e * sphi))
      i += 1
    }
    math.asin(math.max(-1.0, math.min(1.0, sphi)))
  }
  def asinh(v: Double): Double = {
    val av = math.abs(v)
    val r = math.log(av + math.sqrt(av * av + 1.0))
    if (v < 0) -r else r
  }
  def atanh(v: Double): Double = 0.5 * math.log((1.0 + v) / (1.0 - v))
}

/** Ellipsoidal Mercator (1SP): x = a*k0*lam, y = a*k0*psi(phi). */
final case class MercatorProj(aAxis: Double = Projection.WGS84_A,
                              flat: Double = Projection.WGS84_F,
                              k0: Double = 1.0,
                              lon0Deg: Double = 0.0) extends Projection {
  import Projection._
  private val e = math.sqrt(flat * (2.0 - flat))
  def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
    val lam = (lonDeg - lon0Deg) * D2R
    (aAxis * k0 * lam, aAxis * k0 * EllipsoidMath.isometric(latDeg * D2R, e))
  }
  def inverse(x: Double, y: Double): (Double, Double) = {
    val lam = x / (aAxis * k0)
    val phi = EllipsoidMath.isometricInv(y / (aAxis * k0), e)
    (lam * R2D + lon0Deg, phi * R2D)
  }
}

/** Spherical Web-Mercator, EPSG:3857. */
case object WebMercator extends Projection {
  import Projection._
  private val a = WGS84_A
  def forward(lonDeg: Double, latDeg: Double): (Double, Double) =
    (a * lonDeg * D2R, a * EllipsoidMath.asinh(math.tan(latDeg * D2R)))
  def inverse(x: Double, y: Double): (Double, Double) =
    ((x / a) * R2D, math.atan(math.sinh(y / a)) * R2D)
}

/** Ellipsoidal transverse Mercator (Karney 6th-order Krueger-n series). */
final case class TransverseMercator(lon0Deg: Double,
                                    k0: Double = 0.9996,
                                    falseE: Double = 500000.0,
                                    falseN: Double = 0.0,
                                    aAxis: Double = Projection.WGS84_A,
                                    flat: Double = Projection.WGS84_F) extends Projection {
  import Projection._
  import EllipsoidMath._

  private val e = math.sqrt(flat * (2.0 - flat))
  private val n = flat / (2.0 - flat)
  private val n2 = n * n; private val n3 = n2 * n; private val n4 = n3 * n
  private val n5 = n4 * n; private val n6 = n5 * n
  /** rectifying radius */
  private val A = aAxis / (1.0 + n) *
    (1.0 + n2 / 4.0 + n4 / 64.0 + n6 / 256.0)

  private val alpha = Array(
    n / 2.0 - 2.0 * n2 / 3.0 + 5.0 * n3 / 16.0 + 41.0 * n4 / 180.0 - 127.0 * n5 / 288.0 + 7891.0 * n6 / 37800.0,
    13.0 * n2 / 48.0 - 3.0 * n3 / 5.0 + 557.0 * n4 / 1440.0 + 281.0 * n5 / 630.0 - 1983433.0 * n6 / 1935360.0,
    61.0 * n3 / 240.0 - 103.0 * n4 / 140.0 + 15061.0 * n5 / 26880.0 + 167603.0 * n6 / 181440.0,
    49561.0 * n4 / 161280.0 - 179.0 * n5 / 168.0 + 6601661.0 * n6 / 7257600.0,
    34729.0 * n5 / 80640.0 - 3418889.0 * n6 / 1995840.0,
    212378941.0 * n6 / 319334400.0)

  private val beta = Array(
    n / 2.0 - 2.0 * n2 / 3.0 + 37.0 * n3 / 96.0 - n4 / 360.0 - 81.0 * n5 / 512.0 + 96199.0 * n6 / 604800.0,
    n2 / 48.0 + n3 / 15.0 - 437.0 * n4 / 1440.0 + 46.0 * n5 / 105.0 - 1118711.0 * n6 / 3870720.0,
    17.0 * n3 / 480.0 - 37.0 * n4 / 840.0 - 209.0 * n5 / 4480.0 + 5569.0 * n6 / 90720.0,
    4397.0 * n4 / 161280.0 - 11.0 * n5 / 504.0 - 830251.0 * n6 / 7257600.0,
    4583.0 * n5 / 161280.0 - 108847.0 * n6 / 3991680.0,
    20648693.0 * n6 / 638668800.0)

  def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
    var lam = (lonDeg - lon0Deg) * D2R
    // normalize to [-pi, pi]
    if (lam > math.Pi) lam -= 2 * math.Pi
    if (lam < -math.Pi) lam += 2 * math.Pi
    val phi = latDeg * D2R
    val sh = math.sinh(isometric(phi, e)) // sinh(psi) = tan(conformal lat)
    val cosLam = math.cos(lam)
    val xiP = math.atan2(sh, cosLam)
    val etaP = asinh(math.sin(lam) / math.hypot(sh, cosLam))
    var xi = xiP; var eta = etaP
    var j = 1
    while (j <= 6) {
      xi += alpha(j - 1) * math.sin(2.0 * j * xiP) * math.cosh(2.0 * j * etaP)
      eta += alpha(j - 1) * math.cos(2.0 * j * xiP) * math.sinh(2.0 * j * etaP)
      j += 1
    }
    (falseE + k0 * A * eta, falseN + k0 * A * xi)
  }

  def inverse(x: Double, y: Double): (Double, Double) = {
    val xi = (y - falseN) / (k0 * A)
    val eta = (x - falseE) / (k0 * A)
    var xiP = xi; var etaP = eta
    var j = 1
    while (j <= 6) {
      xiP -= beta(j - 1) * math.sin(2.0 * j * xi) * math.cosh(2.0 * j * eta)
      etaP -= beta(j - 1) * math.cos(2.0 * j * xi) * math.sinh(2.0 * j * eta)
      j += 1
    }
    val shEta = math.sinh(etaP)
    val cosXi = math.cos(xiP)
    val lam = math.atan2(shEta, cosXi)
    // tan(conformal lat) = sin(xi') / hypot(sinh(eta'), cos(xi'))
    val tauP = math.sin(xiP) / math.hypot(shEta, cosXi)
    val phi = isometricInv(asinh(tauP), e)
    (lam * R2D + lon0Deg, phi * R2D)
  }
}

/** Minimal CRS: canonical key + projection. Accepts the input forms the
  * reference fixtures use (proj4 fragments, epsg codes, fixture WKT) —
  * mirrors rioxarray/crs.py:13-45 `crs_from_user_input` scope. */
final case class Crs(key: String, proj: Projection) {
  def isGeographic: Boolean = proj.isGeographic
  override def equals(o: Any): Boolean = o match {
    case c: Crs => c.key == key
    case _ => false
  }
  override def hashCode(): Int = key.hashCode
}

object Crs {
  val MODIS_SINU: Crs = parse(
    "+a=6371007.181 +b=6371007.181 +lon_0=0 +no_defs +proj=sinu +units=m +x_0=0 +y_0=0")
  val WGS84: Crs = parse("epsg:4326")
  val WEB_MERCATOR: Crs = parse("epsg:3857")
  def utm(zone: Int, north: Boolean): Crs =
    parse(s"epsg:${(if (north) 32600 else 32700) + zone}")

  private def kv(p4: String): Map[String, String] =
    p4.trim.split("\\s+").filter(_.startsWith("+")).map { tok =>
      val t = tok.drop(1)
      val i = t.indexOf('=')
      if (i < 0) (t.toLowerCase(Locale.ROOT), "") else (t.take(i).toLowerCase(Locale.ROOT), t.drop(i + 1))
    }.toMap

  def parse(userInput: String): Crs = {
    val s = userInput.trim
    val ls = s.toLowerCase(Locale.ROOT)
    if (ls.startsWith("epsg:")) fromEpsg(ls.drop(5).toInt)
    else if (ls.startsWith("+")) fromProj4(s)
    else if (ls.startsWith("projcs") || ls.startsWith("geogcs") || ls.startsWith("projcrs") || ls.startsWith("geogcrs")) fromWkt(s)
    else if (ls.forall(_.isDigit)) fromEpsg(ls.toInt)
    else fromCanonicalKey(ls).getOrElse(
      throw new IllegalArgumentException(s"unsupported CRS input: $s"))
  }

  /** Round-trip of our own canonical keys (persisted in grid sidecars). */
  private def fromCanonicalKey(key: String): Option[Crs] = {
    def params(s: String): Map[String, Double] =
      s.split(":").drop(1).flatMap { kv =>
        val p = kv.split("=", 2)
        if (p.length == 2) Some(p(0) -> p(1).toDouble) else None
      }.toMap
    val p = params(key)
    if (key.startsWith("sinu:"))
      Some(Crs(key, Sinusoidal(p("a"), p.getOrElse("lon0", 0.0))))
    else if (key.startsWith("merc:"))
      Some(Crs(key, MercatorProj(k0 = p.getOrElse("k", 1.0), lon0Deg = p.getOrElse("lon0", 0.0))))
    else if (key.startsWith("tmerc:"))
      Some(Crs(key, TransverseMercator(p("lon0"), p.getOrElse("k", 1.0),
        p.getOrElse("x0", 0.0), p.getOrElse("y0", 0.0))))
    else None
  }

  def fromEpsg(code: Int): Crs = code match {
    case 4326 => Crs("epsg:4326", LongLat)
    case 3857 => Crs("epsg:3857", WebMercator)
    case c if c >= 32601 && c <= 32660 =>
      Crs(s"epsg:$c", TransverseMercator(lon0Deg = (c - 32600) * 6 - 183))
    case c if c >= 32701 && c <= 32760 =>
      Crs(s"epsg:$c", TransverseMercator(lon0Deg = (c - 32700) * 6 - 183, falseN = 10000000.0))
    case c => throw new IllegalArgumentException(s"unsupported EPSG:$c")
  }

  def fromProj4(p4: String): Crs = {
    val m = kv(p4)
    def d(k: String, dv: Double): Double = m.get(k).map(_.toDouble).getOrElse(dv)
    m.getOrElse("proj", "") match {
      case "sinu" =>
        val a = d("a", Projection.WGS84_A)
        Crs(s"sinu:a=$a:lon0=${d("lon_0", 0)}", Sinusoidal(a, d("lon_0", 0)))
      case "longlat" | "latlong" => Crs("epsg:4326", LongLat)
      case "utm" =>
        val zone = m("zone").toInt
        val south = m.contains("south")
        fromEpsg((if (south) 32700 else 32600) + zone)
      case "merc" =>
        // fixture form: +proj=merc +lon_0=0 +k=1 +ellps=WGS84 +datum=WGS84
        Crs(s"merc:k=${d("k", 1)}:lon0=${d("lon_0", 0)}",
          MercatorProj(k0 = d("k", 1.0), lon0Deg = d("lon_0", 0)))
      case "tmerc" =>
        Crs(s"tmerc:lon0=${d("lon_0", 0)}:k=${d("k", 1)}:x0=${d("x_0", 0)}:y0=${d("y_0", 0)}",
          TransverseMercator(d("lon_0", 0), d("k", 1.0), d("x_0", 0), d("y_0", 0)))
      case p => throw new IllegalArgumentException(s"unsupported +proj=$p")
    }
  }

  /** Just enough WKT1 to cover the fixture files (UTM TM + geographic) plus
    * the projections [[toWkt]] emits (sinusoidal, Mercator_1SP) and an
    * AUTHORITY["EPSG", n] fallback, so every engine CRS round-trips through
    * the CF convention's crs_wkt / spatial_ref attributes. */
  def fromWkt(wkt: String): Crs = {
    def param(name: String): Option[Double] = {
      val r = ("""PARAMETER\["""" + name + """",([-0-9.eE]+)\]""").r
      r.findFirstMatchIn(wkt).map(_.group(1).toDouble)
    }
    if (wkt.contains("\"Transverse_Mercator\"")) {
      val lon0 = param("central_meridian").getOrElse(0.0)
      val k0 = param("scale_factor").getOrElse(1.0)
      val fe = param("false_easting").getOrElse(0.0)
      val fn = param("false_northing").getOrElse(0.0)
      val zone = math.round((lon0 + 183) / 6).toInt
      if (k0 == 0.9996 && fe == 500000.0 && (fn == 0.0 || fn == 10000000.0) && zone >= 1 && zone <= 60)
        fromEpsg((if (fn == 0.0) 32600 else 32700) + zone)
      else Crs(s"tmerc:lon0=$lon0:k=$k0:x0=$fe:y0=$fn", TransverseMercator(lon0, k0, fe, fn))
    } else if (wkt.contains("\"Sinusoidal\"")) {
      val a = """SPHEROID\["[^"]*",([-0-9.eE]+)""".r
        .findFirstMatchIn(wkt).map(_.group(1).toDouble)
        .getOrElse(Projection.WGS84_A)
      val lon0 = param("longitude_of_center").getOrElse(0.0)
      Crs(s"sinu:a=$a:lon0=$lon0", Sinusoidal(a, lon0))
    } else if (wkt.contains("\"Mercator_1SP\"")) {
      """AUTHORITY\["EPSG","(\d+)"\]\]\s*$""".r.findFirstMatchIn(wkt.trim) match {
        case Some(m) => fromEpsg(m.group(1).toInt)
        case None =>
          val lon0 = param("central_meridian").getOrElse(0.0)
          val k0 = param("scale_factor").getOrElse(1.0)
          Crs(s"merc:k=$k0:lon0=$lon0", MercatorProj(k0 = k0, lon0Deg = lon0))
      }
    } else if (wkt.toUpperCase(Locale.ROOT).startsWith("GEOGCS")) {
      Crs("epsg:4326", LongLat)
    } else throw new IllegalArgumentException("unsupported WKT CRS")
  }

  private val Wgs84Geogcs: String =
    """GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],""" +
      """PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433],AUTHORITY["EPSG","4326"]]"""

  /** WKT1 emitter for the projections the engine carries; parseable back by
    * [[fromWkt]] (roundtrip spec-gated). The CF convention layer writes this
    * into spatial_ref / crs_wkt, like the reference's crs.to_wkt()
    * (_convention/cf.py:193-196). */
  def toWkt(crs: Crs): String = crs.proj match {
    case LongLat => Wgs84Geogcs
    case Sinusoidal(r, lon0) =>
      s"""PROJCS["unnamed",GEOGCS["unnamed ellipse",DATUM["unknown",SPHEROID["unnamed",$r,0]],""" +
        s"""PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["Sinusoidal"],""" +
        s"""PARAMETER["longitude_of_center",$lon0],PARAMETER["false_easting",0],""" +
        s"""PARAMETER["false_northing",0],UNIT["metre",1]]"""
    case t: TransverseMercator =>
      val zone = math.round((t.lon0Deg + 183) / 6).toInt
      val isUtm = t.k0 == 0.9996 && t.falseE == 500000.0 &&
        (t.falseN == 0.0 || t.falseN == 10000000.0) && zone >= 1 && zone <= 60
      val auth = if (isUtm)
        s""",AUTHORITY["EPSG","${(if (t.falseN == 0.0) 32600 else 32700) + zone}"]""" else ""
      val name = if (isUtm) s"WGS 84 / UTM zone $zone${if (t.falseN == 0.0) "N" else "S"}"
                 else "unnamed"
      s"""PROJCS["$name",$Wgs84Geogcs,PROJECTION["Transverse_Mercator"],""" +
        s"""PARAMETER["central_meridian",${t.lon0Deg}],PARAMETER["scale_factor",${t.k0}],""" +
        s"""PARAMETER["latitude_of_origin",0],PARAMETER["false_easting",${t.falseE}],""" +
        s"""PARAMETER["false_northing",${t.falseN}],UNIT["metre",1]$auth]"""
    case m: MercatorProj =>
      s"""PROJCS["unnamed",$Wgs84Geogcs,PROJECTION["Mercator_1SP"],""" +
        s"""PARAMETER["central_meridian",${m.lon0Deg}],PARAMETER["scale_factor",${m.k0}],""" +
        s"""PARAMETER["false_easting",0],PARAMETER["false_northing",0],UNIT["metre",1]]"""
    case WebMercator =>
      s"""PROJCS["WGS 84 / Pseudo-Mercator",$Wgs84Geogcs,PROJECTION["Mercator_1SP"],""" +
        s"""PARAMETER["central_meridian",0],PARAMETER["scale_factor",1],""" +
        s"""PARAMETER["false_easting",0],PARAMETER["false_northing",0],UNIT["metre",1],""" +
        s"""AUTHORITY["EPSG","3857"]]"""
    case p => throw new IllegalArgumentException(s"no WKT emitter for $p")
  }

  /** Reproject a planar point between two CRS via the lon/lat pivot. */
  def reprojectPoint(x: Double, y: Double, from: Crs, to: Crs): (Double, Double) = {
    if (from == to) return (x, y)
    val (lon, lat) = from.proj.inverse(x, y)
    to.proj.forward(lon, lat)
  }

  /** UTM zone estimation from bbox centre — mirrors semantics of
    * rioxarray.rioxarray.estimate_utm_crs (rioxarray.py:317-357). */
  def estimateUtmCrs(lonMin: Double, latMin: Double, lonMax: Double, latMax: Double): Crs = {
    val lon = (lonMin + lonMax) / 2.0
    val lat = (latMin + latMax) / 2.0
    val zone = math.max(1, math.min(60, (math.floor((lon + 180.0) / 6.0) + 1).toInt))
    utm(zone, north = lat >= 0)
  }
}
