package graft.sources

import graft.core.{Affine, Cells, Crs, GridRef}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.schema.{MessageType, MessageTypeParser}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType

import scala.collection.mutable

/** DSv2 write path for tile stores — `df.write.format("graft")
  * .mode("overwrite").option(...).save(path)` over the canonical pixel
  * schema.
  *
  * Distribution: [[GraftWriteDistributionRule]] (session extensions)
  * injects the (var_name?, floor(row/ts), floor(col/ts)) clustering
  * exchange, so Spark itself plans the one shuffle that co-locates every
  * tile inside a single task — callers write un-clustered input and get a
  * correct plan with no manual repartition (see the
  * RequiresDistributionAndOrdering note below for why the connector
  * interface can't express this). The contract is still not trusted — it
  * is ENFORCED by the
  * commit protocol: every task stages its file under _staging-<queryId>/,
  * tracks per-tile DISTINCT pixel coverage in a bitset (a duplicate
  * (row,col) fails fast in the task; a count can't be faked by dup+miss
  * pairs), and reports per-tile coverage in its commit message; the driver
  * commit verifies every expected tile appears exactly once fully covered,
  * writes the _grid and _index sidecars into the staging dir, renames the
  * whole dir to _gen-<n>.<queryId>/ and then atomically creates the
  * _committed-<n>.<queryId> marker — the commit point (see StoreLayout).
  * Any violation (or a failed task) aborts and removes the staging
  * directory — a torn store is never visible to readers. This is the same
  * per-bucket-lineage idea as runtime.Checkpoint, expressed through Spark's
  * native BatchWrite interfaces. */
object GraftWrite {

  /** Parquet schema matching TileIO.writeTiles' layout (standard 3-level
    * LIST so Spark's own reader and the GraftPartitionReader both read it). */
  def tileSchema: MessageType = MessageTypeParser.parseMessageType(
    """message tile {
      |  required int64 tile_row;
      |  required int64 tile_col;
      |  optional group data (LIST) {
      |    repeated group list {
      |      optional double element;
      |    }
      |  }
      |  required int64 cell_id;
      |  required int64 hilbert;
      |  required int32 h;
      |  required int32 w;
      |}""".stripMargin)

  def gridSchema: MessageType = MessageTypeParser.parseMessageType(
    """message grid {
      |  required binary crs (UTF8);
      |  required double ta; required double tb; required double tc;
      |  required double td; required double te; required double tf;
      |  required int32 width; required int32 height;
      |  required double nodata; required int32 tile_size;
      |  optional binary attrs (UTF8);
      |  optional binary dtype (UTF8);
      |}""".stripMargin)

  /** Grid parsed from writer options (a fresh store has no sidecar yet).
    * `dtype` defaults to float64; when given, `nodata` may be omitted (the
    * dtype's default nodata applies, `_spatial_utils.py:28-45`) and an
    * explicit nodata must survive coercion to the dtype unchanged
    * (`_ensure_nodata_dtype`, raster_writer.py:121-146 — e.g. nodata -1
    * into a uint8 store is rejected at write build time). */
  def gridFromOptions(get: String => String): (GridRef, Int) = {
    def req(k: String): String = {
      val v = get(k)
      require(v != null, s"graft write requires option '$k' " +
        "(crs, transform, width, height, nodata|dtype, tile_size)")
      v
    }
    val attrs = Option(get("attrs")).map(graft.core.Json.toMap).getOrElse(Map.empty)
    val dtypeOpt = Option(get("dtype"))
    val nodataOpt = Option(get("nodata")).map(_.toDouble)
    // fail fast when BOTH are missing: dtype-defaulting exists so a typed
    // store can omit nodata, not so a plain write silently gets NaN
    require(nodataOpt.isDefined || dtypeOpt.isDefined,
      "graft write requires option 'nodata' (or 'dtype', whose default nodata then applies)")
    val dtype = dtypeOpt.getOrElse("float64")
    val nodata = nodataOpt.getOrElse(graft.ops.Conventions.DtypeNodata.default(dtype))
    val checked = graft.ops.Conventions.DtypeNodata.ensureNodataDtype(nodata, dtype)
    (GridRef(Crs.parse(req("crs")), Affine.fromGdal(req("transform")),
       req("width").toInt, req("height").toInt, checked, attrs, dtype),
     req("tile_size").toInt)
  }
}

/** files: (absolute staged path, var_name or null); tileCounts keyed by
  * (var_name or "", tile_row, tile_col). */
case class GraftCommitMessage(files: Seq[(String, String)],
                              tileCounts: Map[(String, Long, Long), Long])
    extends WriterCommitMessage

class GraftWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var truncating = false
  override def truncate(): WriteBuilder = { truncating = true; this }

  override def build(): Write = {
    val names = info.schema().fieldNames.toSeq
    require(Seq("row", "col", "value").forall(names.contains),
      s"graft write needs (row, col, value) columns, got $names")
    require(truncating, "graft write supports mode(\"overwrite\") (full-store swap) only")
    val (grid, ts) = GraftWrite.gridFromOptions(info.options.get)
    new GraftWriteImpl(path, grid, ts, info.schema(), info.queryId())
  }
}

/** NOTE on `RequiresDistributionAndOrdering`: the connector interface
  * cannot express this write's clustering in Spark 4.1 — declaring
  * `Distributions.clustered(FLOOR(row/ts), FLOOR(col/ts))` as
  * `GeneralScalarExpression`s fails at planning with "FLOOR(row / 50) is
  * not currently supported" (`V2ExpressionUtils.toCatalystOpt`,
  * V2ExpressionUtils.scala:97 converts only named references and
  * catalog-resolved transforms, and a path-based TableProvider has no
  * function catalog for a bucket transform). The identical clustering is
  * therefore injected one layer up by [[GraftWriteDistributionRule]]
  * (see [[GraftExtensions]]); the commit protocol below remains the
  * enforced backstop for sessions without the extension. */
class GraftWriteImpl(path: String, grid: GridRef, ts: Int,
                     schema: StructType, queryId: String) extends Write {
  override def toBatch: BatchWrite = new GraftBatchWrite(path, grid, ts, schema, queryId)
}

class GraftBatchWrite(path: String, grid: GridRef, ts: Int,
                      schema: StructType, queryId: String) extends BatchWrite {
  private def staging = new Path(path, s"_staging-$queryId")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    GraftWriterFactory(path, staging.toString, grid, ts,
      schema.fieldIndex("row"), schema.fieldIndex("col"), schema.fieldIndex("value"),
      if (schema.fieldNames.contains("var_name")) schema.fieldIndex("var_name") else -1)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val msgs = messages.map(_.asInstanceOf[GraftCommitMessage])
    // enforce the clustering contract: every tile exactly once, exactly full.
    // counts are bitset cardinalities (distinct covered pixels) — the writer
    // already failed fast on any duplicate (row,col), so a dup+miss pair can
    // never masquerade as full coverage.
    val full = ts.toLong * ts
    val nTx = (grid.width + ts - 1) / ts
    val nTy = (grid.height + ts - 1) / ts
    val seen = mutable.Map.empty[(String, Long, Long), Long]
    msgs.foreach(_.tileCounts.foreach { case (k, n) =>
      require(!seen.contains(k),
        s"tile $k written by more than one task — input is not tile-clustered; " +
          s"repartition by (var_name, row div $ts, col div $ts) before writing")
      seen(k) = n
    })
    seen.foreach { case (k, n) =>
      require(n == full, s"tile $k covers $n of $full distinct pixels — sparse input")
    }
    // every variable present must be a COMPLETE raster (writeDatasetTiles
    // parity); a flat write is the single variable ""
    val vars = seen.keys.map(_._1).toSet
    vars.foreach { v =>
      val got = seen.count(_._1._1 == v)
      require(got == nTx.toLong * nTy,
        s"store incomplete for ${if (v.isEmpty) "store" else s"var '$v'"}: " +
          s"$got of ${nTx.toLong * nTy} tiles written")
    }
    val conf = new Configuration()
    val root = new Path(path)
    val fs = root.getFileSystem(conf)

    // complete the staging dir into a self-contained generation: _index from
    // the tasks' own tile ranges (no footer re-reads), then the _grid sidecar
    val ranges = msgs.flatMap(m => m.files.map { case (f, v) =>
      val vv = if (v == null) "" else v
      val keys = m.tileCounts.keys.filter(_._1 == vv).toSeq
      val rel = (if (vv.isEmpty) "" else s"var_name=$vv/") + new Path(f).getName
      StoreLayout.FileRange(rel, if (vv.isEmpty) null else vv,
        keys.map(_._2).min, keys.map(_._2).max,
        keys.map(_._3).min, keys.map(_._3).max)
    })
    StoreLayout.writeIndex(conf, staging, ranges.toSeq)
    val gridDir = new Path(staging, "_grid")
    fs.mkdirs(gridDir)
    val w = ExampleParquetWriter.builder(
        org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(
          new Path(gridDir, "part-grid.parquet"), conf))
      .withType(GraftWrite.gridSchema)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    val gf = new SimpleGroupFactory(GraftWrite.gridSchema)
    val t = grid.transform
    val g = gf.newGroup()
      .append("crs", grid.crs.key)
      .append("ta", t.a).append("tb", t.b).append("tc", t.c)
      .append("td", t.d).append("te", t.e).append("tf", t.f)
      .append("width", grid.width).append("height", grid.height)
      .append("nodata", grid.nodata).append("tile_size", ts)
    if (grid.attrs.nonEmpty) g.append("attrs", graft.core.Json.obj(grid.attrs))
    g.append("dtype", grid.dtype)
    w.write(g); w.close()

    // promote: ONE rename, then the atomic marker creation = commit point.
    // Concurrent writers race on the generation number: marker creation
    // with overwrite=false is the arbiter — the loser re-promotes its gen
    // dir under the next number and retries, so both commits land (in
    // marker-creation order), never a torn or overwritten store.
    val prev = StoreLayout.liveGeneration(fs, root)
    var gen = prev.map(_._1 + 1).getOrElse(1L)
    var genDir = new Path(root, s"${StoreLayout.GenPrefix}$gen.$queryId")
    require(fs.rename(staging, genDir), s"failed to promote $staging to $genDir")
    var committed = false
    var attempts = 0
    while (!committed) {
      val m = new Path(root, s"${StoreLayout.MarkerPrefix}$gen")
      try {
        val out = fs.create(m, false) // overwrite=false: atomic arbiter
        try out.write(queryId.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        committed = true
      } catch {
        case e: java.io.IOException =>
          // a concurrent writer claimed this generation: re-promote ours
          // under the next number and race again
          attempts += 1
          require(attempts < 64, s"could not claim a generation after $attempts tries: $e")
          val next = math.max(gen + 1,
            StoreLayout.liveGeneration(fs, root).map(_._1 + 1).getOrElse(gen + 1))
          val nextDir = new Path(root, s"${StoreLayout.GenPrefix}$next.$queryId")
          require(fs.rename(genDir, nextDir), s"failed to re-promote $genDir to $nextDir")
          gen = next; genDir = nextDir
      }
    }
    // committed — garbage-collect superseded snapshots. The sweep retains
    // the immediately-previous marked generation (in-flight readers), never
    // touches generation numbers >= ours (concurrent writers), and applies
    // a grace period to unmarked dirs — see StoreLayout.sweepSuperseded.
    // A crash before/inside the sweep only leaves invisible garbage for a
    // later commit's sweep.
    StoreLayout.sweepSuperseded(fs, root, gen)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = new Configuration()
    val fs = staging.getFileSystem(conf)
    fs.delete(staging, true)
  }
}

case class GraftWriterFactory(path: String, staging: String, grid: GridRef, ts: Int,
                              rowIdx: Int, colIdx: Int, valIdx: Int, varIdx: Int)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(staging, grid, ts, rowIdx, colIdx, valIdx, varIdx, partitionId, taskId)
}

/** Accumulates this task's tiles in memory (a task owns whole tiles under
  * the clustering contract — memory is O(tiles-per-task * ts^2), the same
  * working set any dense tile writer needs), stages ONE parquet file on
  * commit, reports per-tile counts. */
class GraftDataWriter(staging: String, grid: GridRef, ts: Int,
                      rowIdx: Int, colIdx: Int, valIdx: Int, varIdx: Int,
                      partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  private val tiles = mutable.Map.empty[(String, Long, Long), (Array[Double], java.util.BitSet)]

  override def write(r: InternalRow): Unit = {
    val row = r.getLong(rowIdx); val col = r.getLong(colIdx)
    val v = r.getLong(valIdx).toDouble
    // UTF8String buffers are reused by the scan: materialize the var key
    val vn = if (varIdx < 0) "" else r.getUTF8String(varIdx).toString
    val k = (vn, row / ts, col / ts)
    val (data, covered) = tiles.getOrElseUpdate(k, {
      // defense in depth: a pixel the coverage check somehow missed would
      // hold nodata, never a silent 0.0
      val a = new Array[Double](ts * ts)
      java.util.Arrays.fill(a, grid.nodata)
      (a, new java.util.BitSet(ts * ts))
    })
    val li = ((row % ts) * ts + col % ts).toInt
    require(!covered.get(li),
      s"duplicate input pixel (row=$row, col=$col) in tile $k")
    covered.set(li)
    data(li) = v
  }

  override def commit(): WriterCommitMessage = {
    if (tiles.isEmpty) return GraftCommitMessage(Seq.empty, Map.empty)
    val conf = new Configuration()
    // one staged file per variable this task holds (var_name=<v>/ subdir
    // for dataset stores, staging root for flat ones)
    val files = tiles.keys.map(_._1).toSeq.distinct.sorted.map { vn =>
      val dir = if (vn.isEmpty) new Path(staging)
                else new Path(staging, s"var_name=$vn")
      val file = new Path(dir, f"part-$partitionId%05d-$taskId.parquet")
      val writer = ExampleParquetWriter.builder(
          org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(file, conf))
        .withType(GraftWrite.tileSchema)
        .withCompressionCodec(CompressionCodecName.SNAPPY)
        .build()
      val factory = new SimpleGroupFactory(GraftWrite.tileSchema)
      // Hilbert-sorted within the task file so row-group stats stay tight
      val ordered = tiles.toSeq.filter(_._1._1 == vn).sortBy { case ((_, tr, tc), _) =>
        Cells.hilbertOfCell(cellOf(tr, tc))
      }
      ordered.foreach { case ((_, tr, tc), (data, _)) =>
        val g = factory.newGroup()
          .append("tile_row", tr).append("tile_col", tc)
        val list = g.addGroup("data")
        var i = 0
        while (i < data.length) { list.addGroup("list").append("element", data(i)); i += 1 }
        val cid = cellOf(tr, tc)
        g.append("cell_id", cid).append("hilbert", Cells.hilbertOfCell(cid))
          .append("h", ts).append("w", ts)
        writer.write(g)
      }
      writer.close()
      (file.toString, if (vn.isEmpty) null else vn)
    }
    GraftCommitMessage(files,
      tiles.map { case (k, (_, covered)) => k -> covered.cardinality().toLong }.toMap)
  }

  private def cellOf(tr: Long, tc: Long): Long = {
    val t = grid.transform
    val cx = t.a * (tc * ts + ts / 2.0) + t.c
    val cy = t.e * (tr * ts + ts / 2.0) + t.f
    val (lon, lat) = grid.crs.proj.inverse(cx, cy)
    Cells.cellId(lon, lat, TileIO.CellLevel)
  }

  override def abort(): Unit = ()
  override def close(): Unit = ()
}
