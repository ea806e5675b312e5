package graft.ops

import graft.SparkTestBase
import graft.core._
import graft.sources.TileIO
import org.apache.spark.sql.functions._

class LayoutAndIoSpec extends SparkTestBase {

  def modis: GridRef = Synth.modisGrid
  def px: Raster = Raster(Synth.pixels(spark, modis), modis)

  test("hilbert layout: range-partitioned, sorted within partitions, content-preserving") {
    val df = Synth.pixels(spark, modis).limit(5000)
    val (lon, lat) = WarpOps.inverseColumns(Crs.MODIS_SINU, col("x"), col("y"))
    val withCell = df.withColumn("cell_id", Cells.cellIdColumn(lon, lat, 10))
    val laid = PartitionOps.hilbertLayout(withCell, "cell_id", 10, 6)
    assert(laid.count() == withCell.count())
    // partitions hold disjoint, sorted hilbert ranges
    import spark.implicits._
    val perPart = laid.select("hilbert").mapPartitions { it =>
      val v = it.map(_.getLong(0)).toArray
      if (v.isEmpty) Iterator.empty
      else Iterator((v.min, v.max, v.sameElements(v.sorted)))
    }.collect()
    assert(perPart.forall(_._3), "rows must be sorted within each partition")
    val ranges = perPart.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, max1, _), (min2, _, _)) => assert(max1 <= min2, "ranges overlap")
      case _ =>
    }
    // hilbert column equals the scala hilbert of the cell's (ix, iy)
    val sample = laid.select("cell_id", "hilbert").limit(100).collect()
    sample.foreach { r =>
      val cell = r.getLong(0)
      assert(r.getLong(1) == Cells.hilbertIndex(Cells.cellIx(cell), Cells.cellIy(cell), 10))
    }
  }

  test("salted join equals plain join and splits the hot key") {
    import spark.implicits._
    // skewed big side: key 7 carries half the rows
    val big = spark.range(20000).select(
      when(col("id") % 2 === 0, 7L).otherwise(col("id") % 50).as("k"),
      col("id").as("payload"))
    val small = (0L until 50L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = big.join(small, "k").groupBy("k").agg(count(lit(1)).as("n"), sum("payload").as("s"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val salted = PartitionOps.saltedJoin(big, small, "k", "payload", nSalts = 8, hotThreshold = 1000)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("payload").as("s"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(salted == plain)
  }

  test("dataset tile sink: multi-variable roundtrip + variable pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dstiles").toString + "/ds1"
    val ds = Seq("nir" -> 999L, "red" -> 12345L).map { case (v, s) =>
      Synth.pixels(spark, modis, s).select(lit(v).as("var_name"), col("row"),
        col("col"), col("x"), col("y"), col("value"))
    }.reduce(_ unionByName _)
    TileIO.writeDatasetTiles(ds, modis, dir, tileSize = 25)
    val (back, g) = TileIO.readDatasetPixels(spark, dir)
    assert(g == modis)
    assert(back.count() == 80000)
    // values identical per variable
    val s0 = ds.groupBy("var_name").agg(sum("value")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val s1 = back.groupBy("var_name").agg(sum("value")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s0 == s1)
    // variable selection prunes to one variable
    val (onlyRed, _) = TileIO.readDatasetPixels(spark, dir, variables = Some(Seq("red")))
    assert(onlyRed.count() == 40000)
    assert(onlyRed.select("var_name").distinct().collect().map(_.getString(0)).toSeq == Seq("red"))
    // windowed read still prunes tiles
    val (win, _) = TileIO.readDatasetPixels(spark, dir,
      window = Some(PixelWindow(10, 35, 30, 55)), variables = Some(Seq("nir")))
    assert(win.count() == 625)
  }

  test("tile write/read roundtrip is the identity") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tiles").toString + "/t1"
    TileIO.writeTiles(px, dir, tileSize = 25)
    val back = TileIO.readPixels(spark, dir)
    assert(back.grid == modis)
    assert(back.df.count() == 40000)
    val s0 = px.df.agg(sum("value")).collect()(0).getLong(0)
    val s1 = back.df.agg(sum("value")).collect()(0).getLong(0)
    assert(s0 == s1)
    // spot-check positional decode
    val v = back.df.filter(col("row") === 123 && col("col") === 45)
      .select("value").collect()(0).getLong(0)
    val exp = if ((123 * 53 + 45 * 97) % 101 == 0) -28672L
              else (123 * 7919L + 45 * 104729L + 12345L) % 19997L - 9999L
    assert(v == exp)
  }

  test("windowed tile read prunes tiles and pushes filters to parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tiles").toString + "/t2"
    TileIO.writeTiles(px, dir, tileSize = 25)
    val w = PixelWindow(30, 80, 110, 160)
    val r = TileIO.readPixels(spark, dir, Some(w))
    assert(r.df.count() == 50L * 50L)
    val plan = r.df.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters") &&
           (plan.contains("GreaterThanOrEqual(tile_row") || plan.contains("tile_row")),
      s"tile predicates must reach the scan:\n$plan")
    // values equal direct window of the source
    val direct = WindowOps.iselWindow(px, w).df.agg(sum("value")).collect()(0).getLong(0)
    val viaTiles = r.df.agg(sum("value")).collect()(0).getLong(0)
    assert(direct == viaTiles)
  }

  test("interpolate_na nearest: ring-bucket engine == brute force, no nodata left") {
    val filled = InterpolateOps.interpolateNaNearest(px, bucket = 4)
    assert(filled.df.count() == 40000)
    assert(filled.df.filter(col("value") === -28672L).count() == 0)
    // brute-force expected for a sample of originally-missing pixels
    val missing = px.df.filter(col("value") === -28672L)
      .select("row", "col").collect().map(r => (r.getLong(0), r.getLong(1)))
    def synth(r: Long, c: Long): Long =
      if ((r * 53 + c * 97) % 101 == 0) -28672L
      else (r * 7919L + c * 104729L + 12345L) % 19997L - 9999L
    val got = filled.df.select("row", "col", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    missing.take(60).foreach { case (mr, mc) =>
      var best = (Long.MaxValue, Long.MaxValue, Long.MaxValue, 0L)
      for (r <- 0L until 200L; c <- 0L until 200L) {
        val v = synth(r, c)
        if (v != -28672L) {
          val d2 = (mr - r) * (mr - r) + (mc - c) * (mc - c)
          if (d2 < best._1 || (d2 == best._1 && (r < best._2 || (r == best._2 && c < best._3))))
            best = (d2, r, c, v)
        }
      }
      assert(got((mr, mc)) == best._4, s"missing pixel ($mr,$mc)")
    }
  }
}
