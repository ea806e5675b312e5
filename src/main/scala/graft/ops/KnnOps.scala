package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** k-nearest-neighbour joins (north_rule: "kNN via cell-ring expansion with
  * a per-partition k-d tree").
  *
  * Two paths:
  *  - [[knnBruteForce]]: exact cross-join + per-query top-k. O(Q*T) — the
  *    correctness oracle and fine when one side is small/broadcastable.
  *  - [[knnCellJoin]]: targets bucketed on a planar grid; each query probes
  *    its surrounding ring of buckets (equi-join on bucket key, so Catalyst
  *    plans a shuffle/broadcast HASH join instead of a cartesian product),
  *    then per-query top-k. Exact whenever the k-th neighbour lies within
  *    `ring * cellSize` of the query (asserted against brute force in the
  *    spec); callers size cellSize from target density. At scale the bucket
  *    key is also the partition key, so candidate generation is co-located
  *    and the only shuffle is the final top-k.
  */
object KnnOps {

  /** Squared-euclidean distance with a fixed operation order, mirrored
    * textually in SQL oracles. */
  def dist2(qx: Column, qy: Column, tx: Column, ty: Column): Column =
    (qx - tx) * (qx - tx) + (qy - ty) * (qy - ty)

  def knnBruteForce(queries: DataFrame, targets: DataFrame, k: Int): DataFrame = {
    val joined = queries.crossJoin(broadcast(targets))
      .withColumn("dist2", dist2(col("qx"), col("qy"), col("tx"), col("ty")))
    val w = Window.partitionBy("q_id").orderBy(col("dist2"), col("t_id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "t_id", "dist2", "rank")
  }

  def knnBruteForceSql(qSql: String, tSql: String, k: Int): String =
    s"""WITH q AS ($qSql), t AS ($tSql),
       |d AS (SELECT q_id, t_id,
       |        (qx - tx) * (qx - tx) + (qy - ty) * (qy - ty) AS dist2
       |      FROM q, t),
       |r AS (SELECT q_id, t_id, dist2,
       |        row_number() OVER (PARTITION BY q_id ORDER BY dist2, t_id) AS rank
       |      FROM d)
       |SELECT q_id, t_id, dist2, rank FROM r WHERE rank <= $k
       |ORDER BY q_id, rank""".stripMargin

  /** Grid-bucketed kNN: exact when the k-th NN is within ring*cellSize. */
  def knnCellJoin(queries: DataFrame, targets: DataFrame, k: Int,
                  cellSize: Double, ring: Int = 2): DataFrame = {
    val tb = targets
      .withColumn("bx", floor(col("tx") / cellSize).cast("long"))
      .withColumn("by", floor(col("ty") / cellSize).cast("long"))
    val offsets = (-ring to ring).flatMap(dx => (-ring to ring).map(dy =>
      struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))))
    val qb = queries
      .withColumn("qbx", floor(col("qx") / cellSize).cast("long"))
      .withColumn("qby", floor(col("qy") / cellSize).cast("long"))
      .select(col("*"), explode(array(offsets: _*)).as("o"))
      .withColumn("bx", col("qbx") + col("o.dx"))
      .withColumn("by", col("qby") + col("o.dy"))
      .drop("o", "qbx", "qby")
    val joined = qb.join(tb, Seq("bx", "by"))
      .withColumn("dist2", dist2(col("qx"), col("qy"), col("tx"), col("ty")))
    val w = Window.partitionBy("q_id").orderBy(col("dist2"), col("t_id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "t_id", "dist2", "rank")
  }
}
