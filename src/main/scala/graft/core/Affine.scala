package graft.core

/** 2D affine geotransform, GDAL parameter order `(a, b, c, d, e, f)`:
  *   x = a*col + b*row + c
  *   y = d*col + e*row + f
  * where (col, row) are continuous pixel coordinates with integer values at
  * pixel *edges* (pixel upper-left corner convention). Mirrors the semantics
  * of the reference's transform handling (rioxarray/rioxarray.py:365-444,
  * rioxarray/_spatial_utils.py:92-126) without porting its code.
  */
final case class Affine(a: Double, b: Double, c: Double,
                        d: Double, e: Double, f: Double) {

  /** Forward: continuous pixel (col, row) -> georeferenced (x, y). */
  def apply(col: Double, row: Double): (Double, Double) =
    (a * col + b * row + c, d * col + e * row + f)

  def determinant: Double = a * e - b * d

  /** Inverse affine (pixel = inv * geo). */
  def invert: Affine = {
    val det = determinant
    require(det != 0.0, s"affine $this is not invertible")
    val ia = e / det
    val ib = -b / det
    val id = -d / det
    val ie = a / det
    val ic = -(ia * c + ib * f)
    val if_ = -(id * c + ie * f)
    Affine(ia, ib, ic, id, ie, if_)
  }

  /** this ∘ other: apply `other` first, then `this`. */
  def compose(o: Affine): Affine = Affine(
    a * o.a + b * o.d, a * o.b + b * o.e, a * o.c + b * o.f + c,
    d * o.a + e * o.d, d * o.b + e * o.e, d * o.c + e * o.f + f)

  def isRectilinear: Boolean = b == 0.0 && d == 0.0

  /** Translate origin by (cols, rows) pixels: transform of a sub-window
    * starting at pixel (colOff, rowOff). */
  def windowed(colOff: Double, rowOff: Double): Affine =
    compose(Affine.translation(colOff, rowOff))

  /** GDAL "GeoTransform" string ordering: c a b f d e. */
  def toGdal: String = s"$c $a $b $f $d $e"

  def toSeq: Seq[Double] = Seq(a, b, c, d, e, f)
}

object Affine {
  def translation(tx: Double, ty: Double): Affine =
    Affine(1, 0, tx, 0, 1, ty)
  def scale(sx: Double, sy: Double): Affine =
    Affine(sx, 0, 0, 0, sy, 0)
  /** North-up grid with origin at (left, top) and signed resolutions. */
  def northUp(left: Double, top: Double, resX: Double, resY: Double): Affine =
    Affine(resX, 0, left, 0, -math.abs(resY), top)
  def fromSeq(s: Seq[Double]): Affine = {
    require(s.length == 6, s"need 6 affine params, got ${s.length}")
    Affine(s(0), s(1), s(2), s(3), s(4), s(5))
  }
  /** Parse a GDAL GeoTransform string "c a b f d e". */
  def fromGdal(s: String): Affine = {
    val p = s.trim.split("\\s+").map(_.toDouble)
    require(p.length == 6, s"bad GeoTransform '$s'")
    Affine(p(1), p(2), p(0), p(4), p(5), p(3))
  }
}
