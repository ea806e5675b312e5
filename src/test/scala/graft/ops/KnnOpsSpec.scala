package graft.ops

import graft.{Queries, SparkTestBase}

class KnnOpsSpec extends SparkTestBase {

  test("grid-bucketed kNN equals brute force when the ring guarantee holds") {
    val q = Queries.knnQueryPoints(spark)
    val t = Queries.knnTargetPoints(spark)
    val bf = KnnOps.knnBruteForce(q, t, 5).collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    // targets are ~10px apart (2317 m); k=5 neighbours lie within ~3 cells
    // of 4632 m, ring=2 guarantees 2 cells -> use ring=3 for margin
    val cell = KnnOps.knnCellJoin(q, t, 5, cellSize = 4632.0, ring = 3).collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    assert(cell.size == bf.size)
    assert(cell == bf, "cell-join kNN must be exact under the ring guarantee")
  }

  test("bucketed kNN plans a hash join, not a cartesian product") {
    val q = Queries.knnQueryPoints(spark)
    val t = Queries.knnTargetPoints(spark)
    val plan = KnnOps.knnCellJoin(q, t, 5, cellSize = 4632.0, ring = 2)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"bucketed kNN must equi-join:\n$plan")
  }
}
