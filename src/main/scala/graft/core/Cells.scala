package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Discrete global grid cells + space-filling-curve ordering.
  *
  * Cell scheme: an S2-style quadtree over the lon/lat rectangle. At level L
  * the world is a 2^L x 2^L grid; a cell id packs (level, ix, iy) as
  *   id = (morton(ix, iy) << 5) | L
  * where morton is bit interleaving (ix even bits, iy odd bits). Levels
  * 0..15 (the north_rule's H3 res 7-12 working band maps to quadtree levels
  * ~11..16 by cell area; we default to level 12).
  *
  * Hilbert index (used for range partitioning per BASELINE.json north_rule:
  * "explicit range partitioning on Hilbert-sorted cell IDs") is the standard
  * iterative xy->d conversion of the Hilbert curve.
  *
  * Everything here exists twice: pure-Scala (driver-side planning: covers,
  * ring expansion) and as Catalyst Column expressions built only from
  * codegen'd builtins (executor-side, stays inside WholeStageCodegen).
  */
object Cells {

  val MaxLevel = 15
  val DefaultLevel = 12

  // ---- pure scala --------------------------------------------------------

  def latLonToIxIy(lon: Double, lat: Double, level: Int): (Long, Long) = {
    val n = 1L << level
    val ix = math.min(n - 1, math.max(0L, math.floor((lon + 180.0) / 360.0 * n).toLong))
    val iy = math.min(n - 1, math.max(0L, math.floor((lat + 90.0) / 180.0 * n).toLong))
    (ix, iy)
  }

  def morton(ix: Long, iy: Long): Long = {
    var m = 0L
    var b = 0
    while (b <= MaxLevel) {
      m |= ((ix >> b) & 1L) << (2 * b)
      m |= ((iy >> b) & 1L) << (2 * b + 1)
      b += 1
    }
    m
  }

  def cellId(lon: Double, lat: Double, level: Int): Long = {
    val (ix, iy) = latLonToIxIy(lon, lat, level)
    (morton(ix, iy) << 5) | level.toLong
  }

  def cellLevel(id: Long): Int = (id & 31L).toInt
  def cellIx(id: Long): Long = {
    val m = id >>> 5
    var ix = 0L; var b = 0
    while (b <= MaxLevel) { ix |= ((m >> (2 * b)) & 1L) << b; b += 1 }
    ix
  }
  def cellIy(id: Long): Long = {
    val m = id >>> 5
    var iy = 0L; var b = 0
    while (b <= MaxLevel) { iy |= ((m >> (2 * b + 1)) & 1L) << b; b += 1 }
    iy
  }

  /** Parent cell at a coarser level (hierarchical prefix pruning). */
  def parent(id: Long, parentLevel: Int): Long = {
    val l = cellLevel(id)
    require(parentLevel <= l, s"parent level $parentLevel > cell level $l")
    val shift = 2 * (l - parentLevel)
    (((id >>> 5) >> shift) << 5) | parentLevel.toLong
  }

  /** lon/lat bbox of a cell. */
  def cellBounds(id: Long): Bounds = {
    val l = cellLevel(id); val n = 1L << l
    val ix = cellIx(id); val iy = cellIy(id)
    Bounds(ix * 360.0 / n - 180.0, iy * 180.0 / n - 90.0,
           (ix + 1) * 360.0 / n - 180.0, (iy + 1) * 180.0 / n - 90.0)
  }

  /** All cells at `level` intersecting a lon/lat bbox (complete cover). */
  def coverBounds(b: Bounds, level: Int): Seq[Long] = {
    val (ix0, iy0) = latLonToIxIy(b.minx, b.miny, level)
    val (ix1, iy1) = latLonToIxIy(b.maxx, b.maxy, level)
    for (iy <- iy0 to iy1; ix <- ix0 to ix1)
      yield (morton(ix, iy) << 5) | level.toLong
  }

  /** k-ring of a cell: all cells within Chebyshev distance k (used for kNN
    * ring expansion per the north_rule). */
  def ring(id: Long, k: Int): Seq[Long] = {
    val l = cellLevel(id); val n = 1L << l
    val cx = cellIx(id); val cy = cellIy(id)
    for {
      dy <- -k to k; dx <- -k to k
      ix = cx + dx; iy = cy + dy
      if ix >= 0 && ix < n && iy >= 0 && iy < n
    } yield (morton(ix, iy) << 5) | l.toLong
  }

  /** Hilbert curve xy -> d (standard iterative rotation algorithm). Used as
    * the range-partitioning key so spatially-near cells land in the same
    * partition range. */
  def hilbertIndex(ixIn: Long, iyIn: Long, order: Int): Long = {
    var rx = 0L; var ry = 0L; var d = 0L
    var x = ixIn; var y = iyIn
    var s: Long = 1L << (order - 1)
    while (s > 0) {
      rx = if ((x & s) > 0) 1L else 0L
      ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  def hilbertOfCell(id: Long): Long =
    hilbertIndex(cellIx(id), cellIy(id), cellLevel(id).max(1))

  // ---- Catalyst column versions (pure builtin arithmetic, codegen'd) -----

  /** ix/iy from lon/lat columns; mirrors latLonToIxIy. */
  def ixColumn(lon: Column, level: Int): Column = {
    val n = 1L << level
    least(lit(n - 1), greatest(lit(0L), floor((lon + 180.0d) / 360.0d * n)))
  }
  def iyColumn(lat: Column, level: Int): Column = {
    val n = 1L << level
    least(lit(n - 1), greatest(lit(0L), floor((lat + 90.0d) / 180.0d * n)))
  }

  /** Bit-interleave of two <=16-bit columns — unrolled shift/or chain that
    * stays inside whole-stage codegen (no UDF). */
  def mortonColumn(ix: Column, iy: Column, level: Int): Column = {
    var acc: Column = lit(0L)
    var b = 0
    while (b < level) {
      acc = acc
        .bitwiseOR(shiftleft(ix.bitwiseAND(lit(1L << b)), b))
        .bitwiseOR(shiftleft(iy.bitwiseAND(lit(1L << b)), b + 1))
      b += 1
    }
    acc
  }

  def cellIdColumn(lon: Column, lat: Column, level: Int): Column =
    shiftleft(mortonColumn(ixColumn(lon, level), iyColumn(lat, level), level), 5)
      .bitwiseOR(lit(level.toLong))

  /** Same cell id in DuckDB SQL over lon/lat expressions. */
  def cellIdSql(lonE: String, latE: String, level: Int): String = {
    val n = 1L << level
    val ix = s"LEAST(${n - 1}, GREATEST(0, CAST(FLOOR((($lonE) + 180.0)/360.0*$n) AS BIGINT)))"
    val iy = s"LEAST(${n - 1}, GREATEST(0, CAST(FLOOR((($latE) + 90.0)/180.0*$n) AS BIGINT)))"
    val terms = (0 until level).flatMap { b =>
      Seq(s"(($ix & ${1L << b}) << $b)", s"(($iy & ${1L << b}) << ${b + 1})")
    }
    s"((${terms.mkString(" | ")}) << 5) | $level"
  }
}
