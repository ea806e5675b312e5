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

  test("packSequences of an empty/zero-token corpus is empty, same schema") {
    import spark.implicits._
    val zero = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    val out = CurationOps.packSequences(zero)
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("doc_id", "n_tokens", "tok_start",
      "chunk_first", "chunk_last", "n_chunks"))
  }

  test("tokenization splits on \\x0B identically to the SQL mirror's class") {
    import spark.implicits._
    // Java \s and RE2 \s disagree on \x0B; the explicit WsClass must split
    val d = Seq((1L, "alpha\u000Bbeta gamma")).toDF("doc_id", "text")
    val m = CurationOps.repetitionMetrics(d).collect()(0)
    assert(m.getLong(1) == 3L, "vertical tab must separate tokens")
    assert(TextOps.WsClass.contains("\\x0B"))
    assert(CurationOps.repetitionMetricsSql("documents").contains("\\x0B"))
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

  test("repetition metrics: hand-computed fractions, single-token and " +
       "empty docs, partitioning-independent") {
    import spark.implicits._
    val d = Seq(
      (1L, "a a a a"),          // 4 tokens, 1 distinct; bigram "a a" x3
      (2L, "w x y z"),          // no dup tokens; 3 distinct bigrams
      (3L, "solo"),             // one token -> zero bigrams
      (4L, ""),                 // no tokens -> no output row
      (5L, "p q p q p")         // "p q" x2 + "q p" x2 of 4 bigrams
    ).toDF("doc_id", "text")
    val got = CurationOps.repetitionMetrics(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 5L))
    assert(got(1L) == ((4L, 1L, 0.75, 3L, 3L, 1.0)))
    assert(got(2L) == ((4L, 4L, 0.0, 3L, 1L, 1.0 / 3)))
    assert(got(3L) == ((1L, 1L, 0.0, 0L, 0L, 0.0)))
    assert(got(5L) == ((5L, 2L, 0.6, 4L, 2L, 0.5)))
    val re = CurationOps.repetitionMetrics(d.repartition(7)).collect()
      .map(r => r.getLong(0) -> r.getDouble(6)).toMap
    assert(re == got.map { case (k, v) => k -> v._6 })
  }

  test("domain cap: at most cap docs per source, deterministic, and the " +
       "plan pre-prunes via WindowGroupLimit") {
    import spark.implicits._
    val d = (0L until 300L).map(i =>
      (i, s"text $i", if (i < 250) "bighost.example" else s"host${i % 7}"))
      .toDF("doc_id", "text", "source")
    val capped = CurationOps.domainCap(d, cap = 5)
    val rows = capped.collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
    val bySrc = rows.groupBy(_._1)
    assert(bySrc("bighost.example").length == 5)
    assert(bySrc.values.forall(_.length <= 5))
    assert(rows.forall(_._3 <= 5))
    val again = CurationOps.domainCap(d.repartition(11), cap = 5)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2))).toSet
    assert(again == rows.toSet, "cap selection must be partitioning-independent")
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank filter must push a WindowGroupLimit pre-prune; plan:\n$plan")
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
