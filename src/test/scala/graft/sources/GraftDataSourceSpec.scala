package graft.sources

import graft.SparkTestBase
import graft.core.Synth
import graft.ops.Raster
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** format("graft") DataSourceV2: registration by short name, content parity
  * with TileIO.readPixels, window pushdown with real file pruning, and
  * column pruning reaching the reader. */
class GraftDataSourceSpec extends SparkTestBase {

  private lazy val store: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-dsv2").toString + "/t1"
    TileIO.writeTiles(Raster(Synth.pixels(spark, Synth.modisGrid), Synth.modisGrid),
                      dir, tileSize = 50)
    dir
  }

  private def scanInfo(df: org.apache.spark.sql.DataFrame): (String, Int) = {
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }
    assert(scans.size == 1, "expected exactly one graft scan")
    (scans.head.scan.description(), scans.head.inputRDD.getNumPartitions)
  }

  test("short-name registration reads a tile store with full content parity") {
    val viaDsv2 = spark.read.format("graft").load(store)
    val viaTileIO = TileIO.readPixels(spark, store).df
    // same names/types; the DSv2 scan is strictly non-null while the
    // exploded-parquet path is conservatively nullable
    assert(viaDsv2.schema.map(f => (f.name, f.dataType)) ==
           viaTileIO.schema.map(f => (f.name, f.dataType)))
    val a = viaDsv2.collect().map(_.toSeq).toSet
    val b = viaTileIO.collect().map(_.toSeq).toSet
    assert(a.size == 200 * 200 && a == b)
  }

  test("row/col predicates fold into the scan window and prune files") {
    val full = spark.read.format("graft").load(store)
    val (_, fullParts) = scanInfo(full)

    val windowed = spark.read.format("graft").load(store)
      .filter(col("row") >= 60 && col("row") < 90 && col("col") >= 110 && col("col") <= 139)
    val (desc, prunedParts) = scanInfo(windowed)
    assert(desc.contains("window=[rows 60..89, cols 110..139]"), desc)
    assert(prunedParts < fullParts,
      s"expected file pruning: $prunedParts vs $fullParts partitions")

    // values must match the pixel-table semantics exactly
    val expect = TileIO.readPixels(spark, store).df
      .filter(col("row") >= 60 && col("row") < 90 && col("col") >= 110 && col("col") <= 139)
      .collect().map(_.toSeq).toSet
    val got = windowed.collect().map(_.toSeq).toSet
    assert(got == expect && got.size == 30 * 30)
  }

  test("empty window plans zero partitions") {
    val none = spark.read.format("graft").load(store).filter(col("row") > 1000000)
    val (_, parts) = scanInfo(none)
    assert(parts == 0 && none.count() == 0)
  }

  test("dataset store: var_name column appears and equality prunes partition dirs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dsv2").toString + "/ds1"
    TileIO.writeDatasetTiles(
      graft.Queries.datasetPixels(spark, Synth.modisGrid, graft.Queries.dsVarSeeds),
      Synth.modisGrid, dir, tileSize = 50)
    val df = spark.read.format("graft").load(dir)
    assert(df.schema.fieldNames.toSeq ==
      Seq("var_name", "row", "col", "x", "y", "value"))
    val (_, fullParts) = scanInfo(df)
    val one = df.filter(col("var_name") === "nir")
    val (desc, parts) = scanInfo(one)
    assert(desc.contains("vars={nir}"), desc)
    assert(parts < fullParts, s"var pruning: $parts vs $fullParts")
    val got = one.collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(5)).toMap
    assert(got.size == 200 * 200)
    val expect = TileIO.readDatasetPixels(spark, dir, variables = Some(Seq("nir")))._1
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(5)).toMap
    assert(got == expect)
    // impossible var -> zero partitions
    val (_, none) = scanInfo(df.filter(col("var_name") === "nope"))
    assert(none == 0)
  }

  test("DSv2 write: Spark plans the tile shuffle itself; commit is atomic and coverage-gated") {
    val g = Synth.modisGrid
    val dir = java.nio.file.Files.createTempDirectory("graft-dsv2w").toString + "/w1"
    def opts(w: org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row]) =
      w.option("crs", g.crs.key).option("transform", g.transform.toGdal)
        .option("width", "200").option("height", "200")
        .option("nodata", "-28672.0").option("tile_size", "50")
    val px = Synth.pixels(spark, g)

    // capture the write's executed plan to prove RequiresDistributionAndOrdering
    // injected exactly one exchange on the tile key — no manual repartition
    @volatile var writePlan: Option[org.apache.spark.sql.execution.SparkPlan] = None
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        if (qe.executedPlan.toString().contains("graft")) writePlan = Some(qe.executedPlan)
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      // deliberately badly-partitioned input: round-robin by nothing tile-like
      opts(px.repartition(17, org.apache.spark.sql.functions.col("row"))
        .write.format("graft").mode("overwrite")).save(dir)
      // listener delivery is async: poll briefly
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (writePlan.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      val plan = writePlan.getOrElse(fail("write plan not captured")).toString()
      // the write-side clustering exchange on FLOOR(row/50), FLOOR(col/50)
      // (AQE nests exchanges inside query stages, so count in the plan text;
      // the == Final Plan == / == Initial Plan == sections each show it once)
      val finalSection = plan.split("== Initial Plan ==").head
      val tileExchanges =
        "Exchange hashpartitioning\\(FLOOR".r.findAllIn(finalSection).size
      assert(tileExchanges == 1, s"expected one tile-key exchange, plan:\n$plan")
      assert(plan.contains("FLOOR((cast(row") && plan.contains("FLOOR((cast(col"),
        s"tile key must be floor(row/ts), floor(col/ts):\n$plan")
    } finally spark.listenerManager.unregister(listener)

    // both read paths see the identical store
    val viaDsv2 = spark.read.format("graft").load(dir).collect().map(_.toSeq).toSet
    val viaTileIO = TileIO.readPixels(spark, dir).df.collect().map(_.toSeq).toSet
    val direct = px.collect().map(_.toSeq).toSet
    assert(viaDsv2.size == 200 * 200 && viaDsv2 == direct && viaTileIO == direct)
    // grid sidecar round-trips
    val (grid2, ts2) = TileIO.readGrid(spark, dir)
    assert(grid2 == g && ts2 == 50)

    // generation layout: commit marker + gen dir with _grid/_index inside
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val names0 = fs.listStatus(new org.apache.hadoop.fs.Path(dir)).map(_.getPath.getName)
    assert(names0.contains("_committed-1"), names0.mkString(","))
    assert(names0.exists(_.startsWith("_gen-1.")), names0.mkString(","))

    // a second overwrite advances the generation; the PREVIOUS snapshot is
    // retained (readers that planned a scan against gen 1 before this
    // commit still finish — Iceberg-style one-snapshot retention) and a
    // third overwrite finally sweeps it
    opts(px.write.format("graft").mode("overwrite")).save(dir)
    val names1 = fs.listStatus(new org.apache.hadoop.fs.Path(dir)).map(_.getPath.getName)
    assert(names1.contains("_committed-2"), names1.mkString(","))
    assert(names1.exists(_.startsWith("_gen-1.")),
      "previous generation must be retained for in-flight readers")
    assert(spark.read.format("graft").load(dir).collect().map(_.toSeq).toSet == direct)
    opts(px.write.format("graft").mode("overwrite")).save(dir)
    val names2 = fs.listStatus(new org.apache.hadoop.fs.Path(dir)).map(_.getPath.getName)
    assert(names2.contains("_committed-3") && names2.exists(_.startsWith("_gen-2.")),
      names2.mkString(","))
    assert(!names2.exists(_.startsWith("_gen-1.")) && !names2.contains("_committed-1"),
      "generation two commits back must be swept: " + names2.mkString(","))
    assert(spark.read.format("graft").load(dir).collect().map(_.toSeq).toSet == direct)

    // an input with a duplicated pixel must be REJECTED in the task (bitset
    // fail-fast) and the failed write must leave the old store fully live
    val dup = px.union(px.limit(1))
    val bad = intercept[Exception] {
      opts(dup.write.format("graft").mode("overwrite")).save(dir)
    }
    assert(bad.getMessage != null)
    val after = spark.read.format("graft").load(dir).collect().map(_.toSeq).toSet
    assert(after == direct, "aborted write must leave the old store intact")
    val (grid3, ts3) = TileIO.readGrid(spark, dir)
    assert(grid3 == g && ts3 == 50)
  }

  test("DSv2 dataset write: var_name partitions, per-var completeness, both readers agree") {
    val g = Synth.modisGrid
    val dir = java.nio.file.Files.createTempDirectory("graft-dsv2w").toString + "/ds-w"
    val ds = graft.Queries.datasetPixels(spark, g, graft.Queries.dsVarSeeds)
    ds.write.format("graft").mode("overwrite")
      .option("dataset", "true")
      .option("crs", g.crs.key).option("transform", g.transform.toGdal)
      .option("width", "200").option("height", "200")
      .option("nodata", "-28672.0").option("tile_size", "50")
      .save(dir)
    // DSv2 read path: var_name surfaces and prunes
    val viaDsv2 = spark.read.format("graft").load(dir)
    assert(viaDsv2.schema.fieldNames.toSeq ==
      Seq("var_name", "row", "col", "x", "y", "value"))
    val direct = ds.collect().map(_.toSeq).toSet
    assert(viaDsv2.collect().map(_.toSeq).toSet == direct)
    // TileIO dataset reader sees the same store
    val viaTileIO = TileIO.readDatasetPixels(spark, dir)._1
      .select("var_name", "row", "col", "x", "y", "value")
      .collect().map(_.toSeq).toSet
    assert(viaTileIO == direct)
    // per-var pruning through the index
    val one = viaDsv2.filter(org.apache.spark.sql.functions.col("var_name") === "red")
    assert(one.count() == 200 * 200)
    // a write missing one tile of ONE var must abort whole-store
    val holed = ds.filter(!(col("var_name") === "nir" && col("row") < 50 && col("col") < 50))
    val bad = intercept[Exception] {
      holed.write.format("graft").mode("overwrite")
        .option("dataset", "true")
        .option("crs", g.crs.key).option("transform", g.transform.toGdal)
        .option("width", "200").option("height", "200")
        .option("nodata", "-28672.0").option("tile_size", "50")
        .save(dir)
    }
    assert(bad.getMessage != null)
    assert(spark.read.format("graft").load(dir).collect().map(_.toSeq).toSet == direct,
      "failed dataset write must leave the old store live")
  }

  test("crash atomicity: an unmarked generation directory is invisible to readers") {
    val g = Synth.modisGrid
    val dir = java.nio.file.Files.createTempDirectory("graft-crash").toString + "/c1"
    val px = Synth.pixels(spark, g)
    px.write.format("graft").mode("overwrite")
      .option("crs", g.crs.key).option("transform", g.transform.toGdal)
      .option("width", "200").option("height", "200")
      .option("nodata", "-28672.0").option("tile_size", "50")
      .save(dir)
    val before = spark.read.format("graft").load(dir).collect().map(_.toSeq).toSet
    // simulate a crash AFTER the promote rename but BEFORE the marker: a
    // higher-numbered gen dir with garbage content and no _committed marker
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val orphan = new org.apache.hadoop.fs.Path(dir, s"${StoreLayout.GenPrefix}99.deadbeef")
    fs.mkdirs(new org.apache.hadoop.fs.Path(orphan, "_grid"))
    val out = fs.create(new org.apache.hadoop.fs.Path(orphan, "part-garbage.parquet"))
    out.write(Array[Byte](1, 2, 3)); out.close()
    // readers must still resolve the MARKED generation, untouched
    assert(StoreLayout.liveGeneration(fs, new org.apache.hadoop.fs.Path(dir))
      .exists(_._1 == 1L))
    assert(spark.read.format("graft").load(dir).collect().map(_.toSeq).toSet == before)
    val (g2, ts2) = TileIO.readGrid(spark, dir)
    assert(g2 == g && ts2 == 50)
    // a FRESH unmarked orphan is indistinguishable from a live concurrent
    // writer's just-promoted generation, so the next commit must RETAIN it
    px.write.format("graft").mode("overwrite")
      .option("crs", g.crs.key).option("transform", g.transform.toGdal)
      .option("width", "200").option("height", "200")
      .option("nodata", "-28672.0").option("tile_size", "50")
      .save(dir)
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(dir)).map(_.getPath.getName)
    assert(names.contains(s"${StoreLayout.GenPrefix}99.deadbeef"),
      "fresh unmarked generation (possible live writer) must survive the sweep")
    assert(spark.read.format("graft").load(dir).collect().map(_.toSeq).toSet == before)
    // ... and even AGED it survives while its generation number is above
    // every committer's: by number alone it could be a live writer stalled
    // past the grace between promote and marker-create, and deleting it
    // would lose that writer's commit (round-4 self-review) — the
    // "never touch g >= ownGen" invariant is absolute
    val old = System.currentTimeMillis() - StoreLayout.UnmarkedGraceMs - 60000
    fs.setTimes(orphan, old, old)
    px.write.format("graft").mode("overwrite")
      .option("crs", g.crs.key).option("transform", g.transform.toGdal)
      .option("width", "200").option("height", "200")
      .option("nodata", "-28672.0").option("tile_size", "50")
      .save(dir)
    val names3 = fs.listStatus(new org.apache.hadoop.fs.Path(dir)).map(_.getPath.getName)
    assert(names3.contains(s"${StoreLayout.GenPrefix}99.deadbeef"),
      "aged unmarked orphan ABOVE the live generation stays (possible live writer)")
    assert(spark.read.format("graft").load(dir).collect().map(_.toSeq).toSet == before)
    // an aged unmarked orphan BELOW the live generation is crash garbage:
    // the next commit sweeps it
    val lowOrphan = new org.apache.hadoop.fs.Path(dir, s"${StoreLayout.GenPrefix}1.ghost")
    fs.mkdirs(lowOrphan)
    fs.setTimes(lowOrphan, old, old)
    px.write.format("graft").mode("overwrite")
      .option("crs", g.crs.key).option("transform", g.transform.toGdal)
      .option("width", "200").option("height", "200")
      .option("nodata", "-28672.0").option("tile_size", "50")
      .save(dir)
    val names4 = fs.listStatus(new org.apache.hadoop.fs.Path(dir)).map(_.getPath.getName)
    assert(!names4.contains(s"${StoreLayout.GenPrefix}1.ghost"),
      "aged unmarked orphan below the live generation must be swept")
    assert(spark.read.format("graft").load(dir).collect().map(_.toSeq).toSet == before)

    // concurrent-claim race: gen 5 is unclaimable (a path squatting on the
    // marker name that liveGeneration cannot read as a marker) — the commit
    // must re-promote under the next number instead of failing or tearing
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir, s"${StoreLayout.MarkerPrefix}5"))
    px.write.format("graft").mode("overwrite")
      .option("crs", g.crs.key).option("transform", g.transform.toGdal)
      .option("width", "200").option("height", "200")
      .option("nodata", "-28672.0").option("tile_size", "50")
      .save(dir)
    assert(StoreLayout.liveGeneration(fs, new org.apache.hadoop.fs.Path(dir))
      .exists(_._1 >= 6L), "claim race must advance past the squatted generation")
    assert(spark.read.format("graft").load(dir).collect().map(_.toSeq).toSet == before)
  }

  test("sweep never touches a concurrent writer's newer generation; retention rules hold") {
    val root = new org.apache.hadoop.fs.Path(
      java.nio.file.Files.createTempDirectory("graft-sweep").toString)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    def mkGen(gen: Long, qid: String, marked: Boolean): Unit = {
      fs.mkdirs(new org.apache.hadoop.fs.Path(root, s"${StoreLayout.GenPrefix}$gen.$qid"))
      if (marked) {
        val out = fs.create(
          new org.apache.hadoop.fs.Path(root, s"${StoreLayout.MarkerPrefix}$gen"), false)
        out.write(qid.getBytes("UTF-8")); out.close()
      }
    }
    // marked history 1,2 + our own commit 3; a concurrent writer has already
    // promoted-and-committed gen 4 AND promoted (unmarked, fresh) gen 5; an
    // AGED unmarked orphan at gen 0; legacy root-level files; a staging dir
    mkGen(1, "a", marked = true); mkGen(2, "b", marked = true)
    mkGen(3, "own", marked = true)
    mkGen(4, "c", marked = true); mkGen(5, "d", marked = false)
    mkGen(6, "e", marked = false)
    mkGen(0, "z", marked = false)
    val aged = System.currentTimeMillis() - StoreLayout.UnmarkedGraceMs - 60000
    fs.setTimes(new org.apache.hadoop.fs.Path(root, s"${StoreLayout.GenPrefix}0.z"), aged, aged)
    fs.setTimes(new org.apache.hadoop.fs.Path(root, s"${StoreLayout.GenPrefix}6.e"), aged, aged)
    fs.create(new org.apache.hadoop.fs.Path(root, "legacy.parquet"), true).close()
    fs.mkdirs(new org.apache.hadoop.fs.Path(root, "_grid"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(root, "_staging-x"))

    StoreLayout.sweepSuperseded(fs, root, ownGen = 3)
    val left = fs.listStatus(root).map(_.getPath.getName).toSet
    assert(!left.contains("_gen-1.a") && !left.contains("_committed-1"),
      s"gen two commits back must go: $left")
    assert(left.contains("_gen-2.b") && left.contains("_committed-2"),
      s"previous marked gen must be retained: $left")
    assert(left.contains("_gen-3.own") && left.contains("_committed-3"))
    assert(left.contains("_gen-4.c") && left.contains("_committed-4"),
      s"a NEWER committed generation must never be deleted: $left")
    assert(left.contains("_gen-5.d"),
      s"a newer fresh unmarked generation (live writer) must never be deleted: $left")
    assert(left.contains("_gen-6.e"),
      s"a newer AGED unmarked generation (stalled live writer) must never be deleted: $left")
    assert(!left.contains("_gen-0.z"), s"aged unmarked orphan must be swept: $left")
    assert(!left.contains("legacy.parquet") && !left.contains("_grid"),
      s"legacy root store with a marked predecessor must be swept: $left")
    assert(left.contains("_staging-x"), s"staging dirs are never touched: $left")
    // readers resolve the newest marked generation throughout
    assert(StoreLayout.liveGeneration(fs, root).contains((4L, "c")))
  }

  test("empty-content marker resolves via gen-dir glob; ambiguity falls back a generation") {
    val root = new org.apache.hadoop.fs.Path(
      java.nio.file.Files.createTempDirectory("graft-marker").toString)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    def mk(name: String, dir: Boolean, content: String = ""): Unit =
      if (dir) { fs.mkdirs(new org.apache.hadoop.fs.Path(root, name)); () }
      else {
        val o = fs.create(new org.apache.hadoop.fs.Path(root, name), true)
        o.write(content.getBytes("UTF-8")); o.close()
      }
    mk(s"${StoreLayout.GenPrefix}1.q1", dir = true)
    mk(s"${StoreLayout.MarkerPrefix}1", dir = false, content = "q1")
    // gen 2 committed but content not yet visible (reader raced the close,
    // or the writer crashed between create and write): one matching dir ->
    // the glob resolves it
    mk(s"${StoreLayout.GenPrefix}2.q2", dir = true)
    mk(s"${StoreLayout.MarkerPrefix}2", dir = false)
    assert(StoreLayout.liveGeneration(fs, root).contains((2L, "q2")))
    // two candidate dirs (the losing racer has not re-promoted yet): the
    // generation is not resolvable -> readers stay on the previous one
    mk(s"${StoreLayout.GenPrefix}2.q3", dir = true)
    assert(StoreLayout.liveGeneration(fs, root).contains((1L, "q1")))
  }

  test("sweep retention keeps a generation readers can RESOLVE, not a crashed race's shell") {
    val root = new org.apache.hadoop.fs.Path(
      java.nio.file.Files.createTempDirectory("graft-sweep-resolve").toString)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    def mk(name: String, dir: Boolean, content: String = ""): Unit =
      if (dir) { fs.mkdirs(new org.apache.hadoop.fs.Path(root, name)); () }
      else {
        val o = fs.create(new org.apache.hadoop.fs.Path(root, name), true)
        o.write(content.getBytes("UTF-8")); o.close()
      }
    // gen 1: committed, resolvable — the generation in-flight readers are on
    mk(s"${StoreLayout.GenPrefix}1.a", dir = true)
    mk(s"${StoreLayout.MarkerPrefix}1", dir = false, content = "a")
    // gen 2: crashed race — empty marker content AND two candidate dirs, so
    // liveGeneration refuses to resolve it (readers fell back to gen 1)
    mk(s"${StoreLayout.GenPrefix}2.q2", dir = true)
    mk(s"${StoreLayout.GenPrefix}2.q3", dir = true)
    mk(s"${StoreLayout.MarkerPrefix}2", dir = false)
    assert(StoreLayout.liveGeneration(fs, root).contains((1L, "a")))
    // our commit at gen 3 sweeps: the retained previous snapshot must be
    // the RESOLVABLE gen 1 (a by-filename keepPrev would have picked the
    // unreadable gen 2 and deleted gen 1 under in-flight readers —
    // round-4 ADVICE)
    mk(s"${StoreLayout.GenPrefix}3.own", dir = true)
    mk(s"${StoreLayout.MarkerPrefix}3", dir = false, content = "own")
    StoreLayout.sweepSuperseded(fs, root, ownGen = 3)
    val left = fs.listStatus(root).map(_.getPath.getName).toSet
    assert(left.contains("_gen-1.a") && left.contains("_committed-1"),
      s"resolvable previous snapshot must be retained: $left")
    assert(!left.contains("_gen-2.q2") && !left.contains("_gen-2.q3") &&
           !left.contains("_committed-2"),
      s"the unresolvable crashed race must be swept: $left")
    assert(left.contains("_gen-3.own") && left.contains("_committed-3"))
    assert(StoreLayout.liveGeneration(fs, root).contains((3L, "own")))
  }

  test("scan plans from the _index sidecar, not per-file footers") {
    // the shared TileIO store now carries an _index; pruning must still hold
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.exists(new org.apache.hadoop.fs.Path(store, "_index")))
    val ranges = StoreLayout.readIndex(
      spark.sessionState.newHadoopConf(), new org.apache.hadoop.fs.Path(store))
    assert(ranges.exists(_.nonEmpty))
    // every data file appears exactly once in the index
    val dataFiles = GraftDataSource.listDataFiles(store).map(_._1.getName).toSet
    assert(ranges.get.map(_.file).toSet == dataFiles)
    // planning honors the index: the windowed scan touches fewer files and
    // returns the exact same content (parity assertions live in the window
    // test above, which now runs through the index path)
  }

  test("column pruning reaches the reader and residual filters still apply") {
    val df = spark.read.format("graft").load(store)
      .filter(col("row") === 7 && col("value") > 0)
      .select("col", "value")
    val (desc, _) = scanInfo(df)
    assert(desc.contains("window=[rows 7..7,"), desc)
    assert(desc.contains("columns=col,value") || desc.contains("columns=value,col"), desc)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getLong(0); val v = r.getLong(1)
      assert(v > 0)
      val exp = if ((7 * 53 + c * 97) % 101 == 0) -28672L
                else (7 * 7919L + c * 104729L + 12345L) % 19997L - 9999L
      assert(v == exp, s"col $c")
    }
  }
}
