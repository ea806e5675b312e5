package graft.runtime

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic cross-scale amplifier for the oracle gate (VERDICT r4 #7).
  *
  * Writes a `factor`-times copy of the sfDir tables that the catalog's
  * data-dependent queries read (documents, embeddings), with dimension /
  * fact tables the scale-independent queries read copied through verbatim.
  * Both engines (Spark and the DuckDB oracle) read the SAME produced
  * parquet, so the only requirements are determinism and key hygiene:
  *
  *  - ids shift by `IdStride` per replica k (0 <= k < factor). The dedup
  *    corpus builder adds +10000/+20000 to doc ids, so `IdStride` = 100000
  *    keeps every derived id inside its replica's block (max base id 4999).
  *  - replica 0 is verbatim; even replicas keep text verbatim (exact
  *    duplicate groups of size factor/2 across the corpus — exercises
  *    exact/substring dedup at scale); odd replicas append a short
  *    replica-tagged suffix (near-duplicate structure for MinHash/SimHash),
  *    with n_chars kept equal to length(text) as in the source tables.
  *  - embeddings perturb element 0 by k*1e-3f for k>0 (float add, stored
  *    once) so distance ties stay rare at 10x density while replicated
  *    cluster structure (labels) is preserved for IVF/LSH.
  *
  * Usage: runMain graft.runtime.ScaleUp <srcSfDir> <dstDir> [factor]
  */
object ScaleUp {
  val IdStride = 100000L

  def scaleDocuments(docs: DataFrame, factor: Int): DataFrame = {
    val spark = docs.sparkSession
    val reps = spark.range(factor.toLong).select(col("id").as("rep"))
    docs.crossJoin(broadcast(reps))
      .select(
        (col("doc_id") + col("rep") * IdStride).as("doc_id"),
        when(col("rep") % 2 === 1,
          concat(col("text"), lit(" ~r"), col("rep").cast("string")))
          .otherwise(col("text")).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  def scaleEmbeddings(emb: DataFrame, factor: Int): DataFrame = {
    val spark = emb.sparkSession
    val reps = spark.range(factor.toLong).select(col("id").as("rep"))
    emb.crossJoin(broadcast(reps))
      .select(
        (col("vec_id") + col("rep") * IdStride).as("vec_id"),
        expr("transform(embedding, (x, i) -> IF(i = 0 AND rep > 0, " +
          "CAST(x + CAST(rep AS FLOAT) * CAST(0.001 AS FLOAT) AS FLOAT), x))")
          .as("embedding"),
        col("label"))
  }

  def main(args: Array[String]): Unit = {
    val src = args(0); val dst = args(1)
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .appName("graft-scaleup")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      scaleDocuments(spark.read.parquet(s"$src/documents.parquet"), factor)
        .repartition(8).write.mode("overwrite").parquet(s"$dst/documents.parquet")
      scaleEmbeddings(spark.read.parquet(s"$src/embeddings.parquet"), factor)
        .repartition(4).write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
      for (t <- Seq("lineitem", "orders", "customer", "region", "nation",
                    "supplier", "part", "events"))
        spark.read.parquet(s"$src/$t.parquet")
          .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scaleup] wrote ${factor}x of $src to $dst")
    } finally spark.stop()
  }
}
