package graft.dedup

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Connected-component duplicate clustering: fixpoint correctness on
  * crafted graphs (chains force multiple propagation rounds), determinism
  * under partitioning, and keeper/size semantics. */
class ClusterOpsSpec extends SparkTestBase {

  private def pairsDf(ps: Seq[(Long, Long)]) = {
    import spark.implicits._
    ps.toDF("doc_a", "doc_b")
  }

  test("two components with correct min labels") {
    val lab = ClusterOps.connectedComponents(pairsDf(Seq((1L, 2L), (2L, 3L), (7L, 9L))))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lab == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("a long chain (diameter 12) converges to one component regardless " +
       "of pair orientation") {
    // path 100-99-...-88 given as (smaller, larger) pairs in shuffled order
    val chain = (88L until 100L).map(i => (i, i + 1))
    val shuffled = chain.sortBy { case (a, _) => (a * 7919) % 13 }
    val lab = ClusterOps.connectedComponents(pairsDf(shuffled))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lab.keySet == (88L to 100L).toSet)
    assert(lab.values.toSet == Set(88L), s"chain must collapse to min id: $lab")
  }

  test("result is partitioning-independent") {
    val ps = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (5L, 12L))
    val one = ClusterOps.connectedComponents(pairsDf(ps).repartition(1))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val many = ClusterOps.connectedComponents(pairsDf(ps).repartition(16))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(one == many)
    assert(one.toMap.apply(12L) == 5L, "5-12 edge must bridge the 10-11-12 chain")
  }

  test("dedupedCorpus keeps keepers and unclustered docs with dup counts") {
    import spark.implicits._
    val docs = Seq(1L, 2L, 3L, 5L, 7L, 9L).map(i => (i, s"text $i"))
      .toDF("doc_id", "text")
    val kept = ClusterOps.dedupedCorpus(docs, pairsDf(Seq((1L, 2L), (2L, 3L), (7L, 9L))))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // clusters {1,2,3} and {7,9}: keepers 1 (n=3) and 7 (n=2); 5 unclustered
    assert(kept == Map(1L -> 3L, 5L -> 1L, 7L -> 2L))
  }

  test("an empty pair list yields an empty result, not a crash") {
    assert(ClusterOps.connectedComponents(pairsDf(Seq.empty)).count() == 0)
    assert(ClusterOps.dupClusters(pairsDf(Seq.empty)).count() == 0)
  }

  test("dupClusters emits sizes and exactly one keeper per cluster") {
    val d = ClusterOps.dupClusters(pairsDf(Seq((1L, 2L), (2L, 3L), (7L, 9L))))
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getLong(2), r.getLong(3)))
    val byCluster = d.groupBy(_._1)
    assert(byCluster(1L).map(_._3).toSet == Set(3L)) // n_docs
    assert(byCluster(7L).map(_._3).toSet == Set(2L))
    byCluster.foreach { case (c, rows) =>
      assert(rows.count(_._4 == 1L) == 1, s"cluster $c needs exactly one keeper")
      assert(rows.find(_._4 == 1L).get._2 == c, "keeper is the cluster label")
    }
  }
}
