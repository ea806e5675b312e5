package graft.text

import graft.SparkTestBase
import graft.dedup.DedupOps
import org.apache.spark.sql.functions._

/** Curation operators: sampling determinism and rate bounds, sequence
  * packing against an independent single-threaded mirror (and its
  * bucket-count independence — the property that makes the two-pass scan a
  * valid distributed rewrite of the sequential cumsum), decontamination on
  * a planted corpus. */
class CurationOpsSpec extends SparkTestBase {

  private def docs(sf: String = "sf0.001") =
    spark.read.parquet(s"/root/testdata/$sf/documents.parquet")

  test("stratified sample: buckets bounded by the language rate, " +
       "deterministic across runs, unknown languages dropped") {
    import spark.implicits._
    val rates = CurationOps.DefaultRates.toMap
    val s1 = CurationOps.stratifiedSample(docs()).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(s1.nonEmpty)
    s1.foreach { case (id, lang, b) =>
      assert(b >= 0 && b < rates(lang), s"doc $id bucket $b over rate for $lang")
    }
    val s2 = CurationOps.stratifiedSample(docs().repartition(16)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(s1.sortBy(_._1).toSeq == s2.sortBy(_._1).toSeq)
    val unknown = Seq((900001L, "tlh", "zzz qqq")).toDF("doc_id", "lang", "text")
    assert(CurationOps.stratifiedSample(unknown).count() == 0)
  }

  test("packSequences matches a sequential mirror and is bucket-count " +
       "independent") {
    val d = docs()
    val got = CurationOps.packSequences(d, budget = 512, buckets = 32)
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap

    // independent sequential mirror from the token counts
    val toks = TextOps.tokenCounts(d).collect()
      .map(r => (r.getLong(0), r.getInt(2).toLong)).sortBy(_._1)
    var cum = 0L
    val want = toks.filter(_._2 > 0).map { case (id, n) =>
      val start = cum; cum += n
      val first = start / 512; val last = (cum - 1) / 512
      (id, (n.toInt, start, first, last, last - first + 1))
    }.toMap
    assert(got == want, "distributed scan must equal the sequential mirror")

    val one = CurationOps.packSequences(d, budget = 512, buckets = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(one == got.map { case (k, v) => (k, v._2) },
      "bucket count must not change the packing")
  }

  test("packSequences chunk spans tile the stream: consecutive docs abut") {
    val rows = CurationOps.packSequences(docs(), budget = 512)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(2), r.getInt(1))) // (tok_start, n_tokens)
    rows.sliding(2).foreach {
      case Array((s1, n1), (s2, _)) => assert(s1 + n1 == s2, "stream must be gapless")
      case _ =>
    }
  }

  test("decontamination flags exactly the docs sharing a 64-char window " +
       "with the benchmark slice") {
    import spark.implicits._
    val shared = "S" * 80 // one 64-window-coverable verbatim block
    val corpus = Seq(
      (0L, s"bench doc $shared tail"),             // benchmark (0 % 35 == 0)
      (1L, s"train doc with the block $shared x"), // contaminated
      (2L, "train doc with no overlap at all, entirely distinct prose"),
      (35L, s"second bench doc, different content ${"T" * 80}"),
      (3L, s"train doc carrying the other block ${"T" * 80} suffix")
    ).toDF("doc_id", "text")
    val flagged = DedupOps.contaminatedDocs(corpus).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged.keySet == Set(1L, 3L), s"got $flagged")
    assert(flagged.values.forall(_ > 0))
  }
}
