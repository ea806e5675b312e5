package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data assembly: deterministic
  * stratified sampling and token-budget sequence packing. Both are pure
  * integer pipelines with textually-mirrored DuckDB oracles.
  *
  * Scale notes (100 TB):
  *  - sampling is a map-only filter against a broadcast rate table — it
  *    fuses into the scan's WholeStageCodegen and prunes rows BEFORE any
  *    downstream shuffle;
  *  - packing is a distributed prefix sum (two-pass scan): a per-bucket
  *    window partial, one bounded P-row collect of bucket totals, and a
  *    broadcast join of cumulative offsets — never a single-partition
  *    global window, which would serialize the whole corpus through one
  *    task. */
object CurationOps {

  /** Deterministic hash bucket in [0, mod) keyed on doc_id — md5-derived
    * like every cross-engine hash in this engine, so sampling is
    * reproducible run-over-run, engine-over-engine, and stable under
    * repartitioning (the property production pipelines need from a
    * sampling key: adding data never changes whether an existing document
    * is kept). */
  def hashBucket(mod: Int) =
    conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") % mod
  def hashBucketSql(mod: Int): String =
    s"('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % $mod"

  /** Per-language keep-rates (percent) for the stratified sample: a
    * down/up-weighting profile of the kind pretraining mixes use. */
  val DefaultRates: Seq[(String, Int)] =
    Seq("en" -> 80, "zh" -> 50, "es" -> 40, "de" -> 30, "fr" -> 20)

  /** Stratified deterministic sample: keep a document iff its hash bucket
    * falls under its language's rate. The rate table rides a broadcast
    * join (a 5-row dimension — the idiomatic Spark shape, and the oracle
    * mirrors it as a VALUES join). Languages absent from the table are
    * dropped (inner join = rate 0). */
  def stratifiedSample(docs: DataFrame,
                       rates: Seq[(String, Int)] = DefaultRates,
                       mod: Int = 100): DataFrame = {
    val spark = docs.sparkSession
    val rateDf = spark.createDataFrame(rates).toDF("lang", "rate")
    docs.select(col("doc_id"), col("lang"), hashBucket(mod).as("bucket"))
      .join(broadcast(rateDf), "lang")
      .filter(col("bucket") < col("rate"))
      .select("doc_id", "lang", "bucket")
  }

  def stratifiedSampleSql(table: String,
                          rates: Seq[(String, Int)] = DefaultRates,
                          mod: Int = 100): String = {
    val vals = rates.map { case (l, r) => s"('$l', $r)" }.mkString(", ")
    s"""WITH rates(lang, rate) AS (VALUES $vals),
       |b AS (SELECT doc_id, lang, ${hashBucketSql(mod)} AS bucket FROM $table)
       |SELECT doc_id, b.lang, bucket
       |FROM b JOIN rates ON b.lang = rates.lang
       |WHERE bucket < rate
       |ORDER BY doc_id""".stripMargin
  }

  /** Token-budget sequence packing (the pretraining concat-and-chunk
    * model): documents are concatenated in doc_id order into one global
    * token stream, which is cut into fixed-`budget` chunks; each document
    * reports the chunk span it lands in. Token counts are the engine's
    * BPE-ish regex counts ([[TextOps.tokenCounts]]).
    *
    * The global running offset is a distributed scan, NOT a global
    * window: documents are bucketed by a deterministic doc_id stride
    * (contiguous ranges, so bucket-local order + bucket offsets compose
    * to the global order), each bucket computes its local prefix sum in
    * parallel, bucket totals (exactly `buckets` rows) are collected and
    * cumulated on the driver, and the per-bucket base offsets rejoin via
    * broadcast. Documents with zero tokens are excluded on both sides
    * (they occupy no stream span — and their chunk arithmetic would hit
    * engine-divergent negative floor division). */
  def packSequences(docs: DataFrame, budget: Int = 512,
                    buckets: Int = 32): DataFrame = {
    val spark = docs.sparkSession
    val toks = TextOps.tokenCounts(docs)
      .select(col("doc_id"), col("n_bpe_tokens").as("n_tokens"))
      .filter(col("n_tokens") > 0)
    val maxId = toks.agg(max("doc_id")).head().getLong(0)
    val span = maxId / buckets + 1
    val bucketed = toks.withColumn("bkt", expr(s"doc_id div $span"))
    val w = Window.partitionBy("bkt").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed.withColumn("local_cum", sum("n_tokens").over(w))
    // bounded collect: exactly one row per non-empty bucket
    val totals = bucketed.groupBy("bkt").agg(sum("n_tokens").as("tot"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val bases = totals.map { case (b, t) => val r = (b, acc); acc += t; r }
    val baseDf = spark.createDataFrame(bases.toSeq).toDF("bkt", "base")
    local.join(broadcast(baseDf), "bkt")
      .withColumn("cum", col("base") + col("local_cum"))
      .select(col("doc_id"), col("n_tokens"),
        (col("cum") - col("n_tokens")).as("tok_start"),
        expr(s"(cum - n_tokens) div $budget").as("chunk_first"),
        expr(s"(cum - 1) div $budget").as("chunk_last"),
        (expr(s"(cum - 1) div $budget") -
          expr(s"(cum - n_tokens) div $budget") + 1).as("n_chunks"))
  }

  /** DuckDB mirror of [[packSequences]]: the same stream arithmetic stated
    * as one cumulative window (the oracle need not be distributed). */
  def packSequencesSql(table: String, budget: Int = 512): String =
    s"""WITH t AS (SELECT doc_id,
       |    len(regexp_extract_all(text, '${TextOps.BpeTokenRegex}')) AS n_tokens
       |  FROM $table),
       |w AS (SELECT doc_id, n_tokens,
       |    sum(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM t WHERE n_tokens > 0)
       |SELECT doc_id, n_tokens, cum - n_tokens AS tok_start,
       |  (cum - n_tokens) // $budget AS chunk_first,
       |  (cum - 1) // $budget AS chunk_last,
       |  (cum - 1) // $budget - (cum - n_tokens) // $budget + 1 AS n_chunks
       |FROM w ORDER BY doc_id""".stripMargin
}
