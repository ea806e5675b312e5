package graft

/** Catalog-wide physical-plan audit: a query that silently plans a
  * CartesianProduct is a 100-TB outage, so every catalog entry is checked.
  * The only allowed cartesians are the three documented brute-force
  * BASELINES whose scale-safe siblings are separate catalog entries:
  *   q_ann_topk   (exact cosine top-k oracle; scale path = q_ann_lsh)
  *   q_emb_pairs  (exact near-dup oracle;    scale path = q_emb_pairs_banded)
  *   q_dedup_jaccard (exact all-pairs oracle, slice-bounded;
  *                    scale path = q_dedup_minhash_lsh)
  * BroadcastNestedLoopJoin is permitted: the PIP/range joins intentionally
  * broadcast a tiny edge/geometry side (the spatial-join shape). */
class PlanAuditSpec extends SparkTestBase {

  val allowedCartesian = Set("q_ann_topk", "q_emb_pairs", "q_dedup_jaccard")
  val sfDir = "/root/testdata/sf0.001"

  test("no catalog query plans a CartesianProduct (outside documented baselines)") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString()
      if (plan.contains("CartesianProduct") && !allowedCartesian.contains(name))
        Some(name)
      else None
    }
    assert(offenders.isEmpty, s"unexpected cartesian products in: $offenders")
  }

  test("curation scans prune to exactly the referenced document columns") {
    val capPlan = Queries.qDomainCap(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert(capPlan.contains("struct<doc_id:bigint,source:string>"),
      s"domain cap must scan only (doc_id, source), never text:\n$capPlan")
    val repPlan = Queries.qRepetitionMetrics(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert(repPlan.contains("struct<doc_id:bigint,text:string>"),
      s"repetition metrics must scan only (doc_id, text):\n$repPlan")
  }

  test("windowed scans push their predicates into the parquet read") {
    // representative pushdown probe: the lineitem aggregate reads only its
    // group/agg columns (column pruning visible in ReadSchema)
    val plan = Queries.qLineitemAgg(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("ReadSchema"), plan)
    assert(!plan.contains("l_comment"), "unused wide column must be pruned from the scan")
  }
}
