package graft.ops

import graft.core.Cells
import graft.functions.HilbertIndex
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical layout operators (north_rule: "explicit range partitioning on
  * Hilbert-sorted cell IDs" and "adaptive skew-splitting of hot cells").
  *
  * hilbertLayout: range-partition rows by the Hilbert index of their cell so
  * spatially-near cells are in the same partition range (tile/metadata
  * pruning becomes contiguous range reads at the storage layer).
  *
  * saltedJoin: hot-key mitigation — key frequencies are measured on the big
  * side; keys above `hotThreshold` are salted (big side: deterministic salt
  * from a sibling column's hash; small side: exploded to every salt), cold
  * keys pass through salt 0. Output is row-identical to the plain join while
  * splitting each hot key across `nSalts` reducers. Complements AQE's
  * skew-join splitting (which only rebalances sort-merge partitions). */
object PartitionOps {

  /** Hilbert index Column of a cell_id produced by Cells.cellIdColumn. */
  def hilbertOfCellColumn(cellId: Column, level: Int): Column = {
    // de-interleave morton bits back to ix/iy with builtin bit arithmetic
    def deinterleave(offset: Int): Column =
      (0 until level).map { b =>
        shiftleft(shiftright(cellId, 5 + 2 * b + offset).bitwiseAND(1L), b)
      }.reduce[Column](_ bitwiseOR _)
    HilbertIndex.column(deinterleave(0), deinterleave(1), math.max(1, level))
  }

  /** Range-partition + sort rows by Hilbert order of their cell. */
  def hilbertLayout(df: DataFrame, cellCol: String, level: Int,
                    numPartitions: Int): DataFrame =
    df.withColumn("hilbert", hilbertOfCellColumn(col(cellCol), level))
      .repartitionByRange(numPartitions, col("hilbert"))
      .sortWithinPartitions("hilbert")

  /** Equality-preserving salted inner equi-join on `key`. `saltSource` is any
    * big-side column whose hash spreads rows (e.g. doc_id). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltSource: String, nSalts: Int, hotThreshold: Long): DataFrame = {
    val freq = big.groupBy(key).agg(count(lit(1)).as("_freq"))
    val hotKeys = freq.filter(col("_freq") >= hotThreshold).select(key, "_freq")
    val bigS = big
      .join(broadcast(hotKeys.select(col(key), lit(true).as("_hot"))), Seq(key), "left")
      .withColumn("_salt",
        when(col("_hot").isNotNull, pmod(hash(col(saltSource)), lit(nSalts)))
          .otherwise(lit(0)))
      .drop("_hot")
    val smallS = small
      .join(broadcast(hotKeys.select(col(key), lit(true).as("_hot"))), Seq(key), "left")
      .withColumn("_salts",
        when(col("_hot").isNotNull, sequence(lit(0), lit(nSalts - 1)))
          .otherwise(array(lit(0))))
      .withColumn("_salt", explode(col("_salts")))
      .drop("_salts", "_hot")
    bigS.join(smallS, Seq(key, "_salt")).drop("_salt")
  }
}
