package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: turn near-duplicate PAIRS (the output of
  * MinHash-LSH / SimHash / exact-substring candidate verification) into
  * duplicate CLUSTERS with one canonical keeper per cluster — the step a
  * training-data pipeline actually acts on (keep one document per cluster,
  * drop the rest). Pair emission alone under-deduplicates: near-duplicate
  * similarity is not transitive, so a~b and b~c often arrive without a~c,
  * and only the connected component of the pair graph names the full group
  * (cf. the dedup pipeline structure in Lee et al. 2022, arXiv:2107.06499).
  *
  * Algorithm: distributed min-label propagation to fixpoint — every vertex
  * repeatedly takes the minimum label over itself and its neighbors. The
  * fixpoint labels every vertex with the minimum doc_id reachable from it,
  * which is schedule- and partitioning-independent: the result is exactly
  * "component representative = smallest member", so the DuckDB oracle can
  * state it independently as min-over-transitive-closure (recursive CTE).
  *
  * Scale shape (100 TB): each round is ONE equi-join of the symmetrized
  * edge list against the current labels plus one map-side-combinable min
  * aggregate — no cartesian anywhere. The edge list is shuffled to its
  * join partitioning ONCE and persisted (InMemoryTableScan preserves
  * outputPartitioning, so later rounds exchange only the label side, which
  * is |V| rows, not |E|). Rounds = component diameter; duplicate-cluster
  * graphs are near-cliques of bounded size, so a handful of rounds
  * suffices (for adversarial long-chain graphs the alternating
  * large-star/small-star variant of Kiveris et al. 2014 bounds rounds by
  * O(log^2 n); diameter is the honest bound for this graph family and
  * keeps the kernel one join + one aggregate). Each round's labels are
  * localCheckpoint'ed: iterative DataFrame loops otherwise accrete a plan
  * per round and re-execute the whole lineage every round. Convergence is
  * detected by the label-sum invariant: labels only ever decrease, so
  * sum(label) is strictly decreasing until the fixpoint — one scalar
  * aggregate per round, no driver-side data motion. */
object ClusterOps {

  val MaxRounds = 50

  /** LAZILY localCheckpoint `df` and hand back a releaser for its blocks.
    * Dataset.unpersist() does NOT free a localCheckpoint (the checkpoint
    * persists its RDD directly, outside the CacheManager), so an iterative
    * loop would accrete one |V|-row block set per round until GC +
    * ContextCleaner got around to them. The releaser diffs the persistent-
    * RDD registry around the checkpoint call — the underlying
    * RDD.localCheckpoint() registers its persist immediately even with
    * eager=false, and the loop is the session's only activity between the
    * two reads. r6: eager=false so the caller's NEXT action (the per-round
    * label-sum) materializes the checkpoint blocks inside its own job —
    * the eager form paid a separate count() job per round for the same
    * materialization (guide §1: at converged-loop scale the cost IS the
    * per-round job latency). Callers must run an action that computes
    * every partition (sum does) before relying on the truncated lineage. */
  private def checkpointWithRelease(df: DataFrame): (DataFrame, () => Unit) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val cp = df.localCheckpoint(eager = false)
    val added = sc.getPersistentRDDs.keySet -- before
    (cp, () => added.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false))))
  }

  /** Connected components of an undirected pair list (`doc_a`, `doc_b`).
    * Returns (doc_id, cluster) for every vertex that appears in a pair,
    * cluster = min doc_id of the component.
    *
    * Note on duplicate edges: the r6 optimization round removed the
    * symmetrized list's `distinct()` — every upstream pair producer emits
    * distinct (doc_a < doc_b) pairs, so the union of the two oriented
    * projections is duplicate-free BY CONSTRUCTION and the distinct was a
    * pure extra |E| exchange + aggregate (guide §2.4: a distinct on data
    * that is already unique). Correctness does not depend on it either
    * way: min-aggregation over a multiset equals min over its set, so a
    * caller feeding duplicated pairs still gets exact components (only the
    * per-round join grows with the duplication factor). */
  def connectedComponents(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    // r6: symmetrize with ONE explode pass instead of a two-arm union —
    // the union form executed the (possibly expensive) pairs subtree once
    // per arm; the exploded struct pair emits both orientations from a
    // single evaluation of each input row (same rows, same types)
    val sym = pairs.select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .repartition(col("src"))
      .persist()
    // init = the first propagation round, fused: label(v) = min over the
    // CLOSED neighborhood {v} ∪ N(v). One aggregate replaces the identity
    // init's distinct PLUS the first join round (near-clique duplicate
    // graphs then converge in a single confirming round).
    // r6: the init stays a LAZY plan over the persisted edge cache instead
    // of paying its own checkpoint job — the first label-sum executes it
    // once, and round 1 re-derives it from sym's cached blocks (a tiny
    // post-cache aggregate). Rounds >= 1 still checkpoint: their lineage
    // would otherwise grow by one join per round.
    var labels = sym.groupBy(col("src")).agg(min(col("dst")).as("mn"))
      .select(col("src").as("id"), least(col("src"), col("mn")).as("label"))
    var releaseLabels: () => Unit = () => ()
    // convergence invariant: labels only decrease, so sum(label) strictly
    // decreases until the fixpoint. Summed as DECIMAL(38,0): a Long sum
    // overflows (and throws, under ANSI) at ~1e9 vertices with ~1e10 ids —
    // exactly the advertised scale
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)
    var prevSum = labelSum(labels)
    // empty pair graph (NULL scalar sum): no vertices, no components —
    // the emptiness read rides the first label-sum job instead of paying
    // a separate isEmpty action (r6: one fewer Spark job per call)
    if (prevSum == null) {
      sym.unpersist()
      // labels is a lazy plan over (the now-uncached) sym — still valid for
      // the caller to read; it recomputes the empty frame from pairs
      return labels.select(col("id").as("doc_id"), col("label").as("cluster"))
    }
    var round = 0
    var converged = false
    while (!converged && round < MaxRounds) {
      val msgs = sym.join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("label"))
      val (next, releaseNext) = checkpointWithRelease(
        labels.unionByName(msgs).groupBy("id").agg(min("label").as("label")))
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      releaseLabels() // previous round's checkpoint blocks
      labels = next
      releaseLabels = releaseNext
      round += 1
    }
    sym.unpersist()
    if (!converged) releaseLabels() // don't leak the checkpoint on failure
    require(converged, s"connectedComponents did not converge in $MaxRounds rounds")
    labels.select(col("id").as("doc_id"), col("label").as("cluster"))
  }

  /** Duplicate clusters with canonical-keeper selection over a pair list:
    * (doc_id, cluster, n_docs, is_keeper). The keeper is the cluster's
    * minimum doc_id (= the cluster label), the convention exact dedup
    * already uses for its group keeper. */
  def dupClusters(pairs: DataFrame): DataFrame = {
    val lab = connectedComponents(pairs)
    val sizes = lab.groupBy("cluster").agg(count(lit(1)).as("n_docs"))
    lab.join(sizes, "cluster")
      .select(col("doc_id"), col("cluster"), col("n_docs"),
        when(col("doc_id") === col("cluster"), 1L).otherwise(0L).as("is_keeper"))
  }

  /** The deduplicated corpus — the artifact a pipeline actually writes
    * out: every document that is not a non-keeper member of a duplicate
    * cluster, with `n_dups` = how many documents it stands for (1 for
    * documents in no cluster). Composes [[dupClusters]] with one anti-join
    * and one left join, both keyed on doc_id — at 100 TB the drop list
    * shuffles on the same key the corpus is already bucketed by. */
  def dedupedCorpus(docs: DataFrame, pairs: DataFrame): DataFrame = {
    // `cl` feeds both join arms below; a persist() here was MEASURED
    // NEUTRAL-to-negative in r6 (jobs 45 -> 49, tasks +252, wall within
    // noise): the duplicated subtree is only the sizes aggregate + join
    // over the already-checkpointed labels, and the extra InMemoryRelation
    // disturbed the arms' broadcast planning. Left unpersisted.
    val cl = dupClusters(pairs)
    val drop = cl.filter(col("is_keeper") === 0L).select("doc_id")
    val keepMeta = cl.filter(col("is_keeper") === 1L)
      .select(col("doc_id"), col("n_docs"))
    docs.join(drop, Seq("doc_id"), "left_anti")
      .join(keepMeta, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_docs"), lit(1L)).as("n_dups"))
  }

  def dedupedCorpusSql(docsSql: String, pairsSql: String): String =
    s"""WITH cl AS (${dupClustersSql(pairsSql)})
       |SELECT d.doc_id, COALESCE(cl.n_docs, 1) AS n_dups
       |FROM ($docsSql) d
       |LEFT JOIN cl ON d.doc_id = cl.doc_id AND cl.is_keeper = 1
       |WHERE d.doc_id NOT IN (SELECT doc_id FROM cl WHERE is_keeper = 0)
       |ORDER BY d.doc_id""".stripMargin

  /** DuckDB mirror of [[dupClusters]]: min over the transitive closure via
    * a recursive CTE — an INDEPENDENT statement of the same fixpoint (the
    * oracle never sees the propagation schedule). `pairsSql` may itself be
    * a full WITH...SELECT statement (it is wrapped as a subquery). */
  def dupClustersSql(pairsSql: String): String =
    s"""WITH RECURSIVE pairs AS (SELECT doc_a, doc_b FROM ($pairsSql) t),
       |e AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |      UNION SELECT doc_b, doc_a FROM pairs),
       |verts AS (SELECT DISTINCT src AS id FROM e),
       |reach(id, r) AS (
       |  SELECT id, id FROM verts
       |  UNION
       |  SELECT reach.id, e.dst FROM reach JOIN e ON e.src = reach.r),
       |lab AS (SELECT id AS doc_id, min(r) AS cluster FROM reach GROUP BY 1),
       |sz AS (SELECT cluster, count(*) AS n_docs FROM lab GROUP BY 1)
       |SELECT doc_id, lab.cluster, n_docs,
       |  CASE WHEN doc_id = lab.cluster THEN 1 ELSE 0 END AS is_keeper
       |FROM lab JOIN sz ON lab.cluster = sz.cluster
       |ORDER BY doc_id""".stripMargin
}
