package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
import org.apache.parquet.schema.{MessageType, MessageTypeParser}

import scala.jdk.CollectionConverters._

/** Tile-store on-disk commit layout, shared by the DSv2 write path
  * (GraftWrite), the DSv2 scan (GraftDataSource) and the driver-side
  * readers (TileIO).
  *
  * Two layouts coexist:
  *
  *  - **legacy / TileIO layout**: data files, `_grid/` and `_index/` live
  *    directly under the store root (what `TileIO.writeTiles` and Spark's
  *    parquet writer produce).
  *  - **generation layout** (DSv2 `format("graft")` writes): each commit
  *    renames its fully-written staging directory — data files plus `_grid/`
  *    and `_index/` — to `_gen-<n>.<queryId>/` in ONE filesystem rename,
  *    then atomically creates an empty marker file `_committed-<n>.<queryId>`.
  *    The marker creation is the commit point: readers resolve the highest
  *    marked generation and read only inside its directory, so a crash
  *    anywhere in the protocol leaves either the previous store fully live
  *    (marker not yet created — the new gen dir is invisible garbage) or the
  *    new store fully live (marker created — stale files are invisible and
  *    swept by the next commit). A torn store is never observable. This is
  *    the snapshot-pointer discipline of an Iceberg commit expressed with
  *    nothing but rename-and-create atomicity; the reference's analog is the
  *    windowed writer lock protocol in rioxarray raster_writer.py:315-340.
  *
  * The `_index/` sidecar holds one row per data file with its
  * (tile_row, tile_col) min/max so scan planning reads ONE small file
  * instead of opening every data-file footer on the driver (the classic
  * Hive-listing bottleneck at 10^5-10^6 files). */
object StoreLayout {

  val MarkerPrefix = "_committed-"
  val GenPrefix = "_gen-"

  /** Highest committed (generation, queryId), if any marker exists.
    * Marker format: `_committed-<gen>` with the owning queryId as file
    * CONTENT — the gen-only name makes `create(overwrite=false)` a true
    * arbiter between concurrent committers racing for the same generation
    * number. (Legacy `_committed-<gen>.<qid>` names still parse.)
    *
    * A marker whose content is not yet visible (a reader racing the
    * winner's content write, or a writer that crashed between create and
    * close) resolves through a `_gen-<gen>.*` glob when exactly one such
    * directory exists; otherwise that generation is treated as
    * not-yet-committed and an older marker wins — readers never see the
    * dangling `_gen-<n>.` path the raw empty content would produce
    * (ADVICE r3). */
  def liveGeneration(fs: FileSystem, root: Path): Option[(Long, String)] =
    if (!fs.exists(root)) None
    else fs.listStatus(root).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith(MarkerPrefix))
      .flatMap(s => resolveMarker(fs, root, s.getPath))
      .sortBy { case (g, q) => (g, q) }.lastOption

  /** The single marker-resolution rule (shared by [[liveGeneration]] and
    * the sweep's retention pick, which must agree on what "committed"
    * means — a retained snapshot readers cannot resolve would defeat
    * retention, round-4 ADVICE): name-encoded qid, else file content, else
    * the exactly-one `_gen-<gen>.*` directory glob. */
  private def resolveMarker(fs: FileSystem, root: Path,
                            marker: Path): Option[(Long, String)] = {
    val rest = marker.getName.stripPrefix(MarkerPrefix)
    val i = rest.indexOf('.')
    if (i > 0)
      scala.util.Try((rest.take(i).toLong, rest.drop(i + 1))).toOption
    else scala.util.Try {
      val gen = rest.toLong
      val in = fs.open(marker)
      val qid = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
                finally in.close()
      if (qid.nonEmpty) Some((gen, qid))
      else {
        val dirs = fs.globStatus(new Path(root, s"$GenPrefix$gen.*"))
        if (dirs != null && dirs.count(_.isDirectory) == 1)
          Some((gen, dirs.find(_.isDirectory).get.getPath.getName
            .stripPrefix(s"$GenPrefix$gen.")))
        else None
      }
    }.toOption.flatten
  }

  /** Grace period before an UNMARKED generation directory is considered a
    * crashed writer's garbage: by name alone it is indistinguishable from a
    * live concurrent writer's just-promoted directory, so the sweep only
    * removes it once its modification time is this far in the past. */
  val UnmarkedGraceMs: Long = 10 * 60 * 1000L

  private val GenName = "^_gen-(\\d+)\\..*$".r
  private val MarkerName = s"^$MarkerPrefix(\\d+)(?:\\..*)?$$".r

  /** Post-commit garbage collection, called by the writer AFTER its marker
    * landed (own generation = `ownGen`). Policy (ADVICE r3):
    *
    *  - a marked generation `g` (dir + marker) is deleted iff
    *    `g < ownGen && g != keepPrev` where keepPrev is the highest marked
    *    generation below ownGen at sweep time — the immediately-previous
    *    snapshot is RETAINED so readers that planned a scan against it
    *    before this commit finish cleanly (Iceberg-style retention of one
    *    previous snapshot);
    *  - anything with generation number >= ownGen is NEVER touched: it
    *    belongs to a concurrent writer that already promoted (or even
    *    committed) a newer generation;
    *  - an unmarked generation directory is deleted only after
    *    [[UnmarkedGraceMs]] (see above), at any generation number;
    *  - legacy root-level layout (flat data files, `_grid`, `_index`,
    *    `var_name=` dirs) is the pre-generation snapshot: retained while it
    *    is the only predecessor (ownGen is the first marked generation),
    *    swept once a marked generation below ownGen exists;
    *  - `_staging-*` is always left alone (in-flight writers). */
  def sweepSuperseded(fs: FileSystem, root: Path, ownGen: Long): Unit = {
    val entries = fs.listStatus(root).toSeq
    val markedGens = entries.filter(_.isFile).flatMap(s => s.getPath.getName match {
      case MarkerName(g) => Some(g.toLong)
      case _ => None
    }).toSet
    // keepPrev must be a generation READERS CAN RESOLVE, not merely one
    // with a marker file: a crashed race can leave a marker whose content
    // is empty and whose gen-dir glob is ambiguous — retaining only that
    // while deleting the resolvable predecessor would strand readers
    // (round-4 ADVICE). So the retention pick runs the same resolution
    // rule liveGeneration uses.
    val resolvableGens = entries
      .filter(s => s.isFile && s.getPath.getName.startsWith(MarkerPrefix))
      .flatMap(s => resolveMarker(fs, root, s.getPath))
      .map(_._1).toSet
    val keepPrev = resolvableGens.filter(_ < ownGen) match {
      case s if s.isEmpty => -1L
      case s => s.max
    }
    val cutoff = System.currentTimeMillis() - UnmarkedGraceMs
    entries.foreach { s =>
      val n = s.getPath.getName
      val del = n match {
        case _ if n.startsWith("_staging-") => false
        case GenName(g) if s.isDirectory =>
          if (markedGens.contains(g.toLong)) g.toLong < ownGen && g.toLong != keepPrev
          else
            // aged-unmarked sweep applies only BELOW our generation: an
            // unmarked dir above it may be a live writer merely stalled
            // past the grace (promote -> long pause -> marker create would
            // otherwise commit a generation whose directory we deleted).
            // The "never touch g >= ownGen" invariant is absolute; a
            // crashed high-numbered orphan stays as invisible garbage.
            s.getModificationTime < cutoff && g.toLong < ownGen
        case MarkerName(g) => g.toLong < ownGen && g.toLong != keepPrev
        case _ =>
          // legacy root-level store: swept once a marked predecessor exists
          keepPrev >= 0 &&
            (s.isFile || n == "_grid" || n == "_index" || n.startsWith("var_name="))
      }
      if (del) fs.delete(s.getPath, true)
    }
  }

  /** Directory holding the live data files / `_grid` / `_index`: the
    * current generation directory, or the root for legacy stores. */
  def dataDir(fs: FileSystem, root: Path): Path =
    liveGeneration(fs, root) match {
      case Some((g, q)) => new Path(root, s"$GenPrefix$g.$q")
      case None => root
    }

  def dataDir(root: String): Path = {
    val p = new Path(root)
    dataDir(p.getFileSystem(new Configuration()), p)
  }

  // ---- `_index` sidecar ------------------------------------------------

  val IndexSchema: MessageType = MessageTypeParser.parseMessageType(
    """message index {
      |  required binary file (UTF8);
      |  optional binary var_name (UTF8);
      |  required int64 min_tr; required int64 max_tr;
      |  required int64 min_tc; required int64 max_tc;
      |}""".stripMargin)

  /** One data file's planning row: name (relative to the data dir, incl.
    * any var_name=<v>/ prefix), variable (null for flat stores), tile
    * ranges. */
  case class FileRange(file: String, varName: String,
                       minTr: Long, maxTr: Long, minTc: Long, maxTc: Long)

  def writeIndex(conf: Configuration, dir: Path, ranges: Seq[FileRange]): Unit = {
    val indexDir = new Path(dir, "_index")
    dir.getFileSystem(conf).mkdirs(indexDir)
    val w = ExampleParquetWriter.builder(
        HadoopOutputFile.fromPath(new Path(indexDir, "part-index.parquet"), conf))
      .withType(IndexSchema)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    val f = new SimpleGroupFactory(IndexSchema)
    ranges.foreach { r =>
      val g = f.newGroup().append("file", r.file)
      if (r.varName != null) g.append("var_name", r.varName)
      g.append("min_tr", r.minTr).append("max_tr", r.maxTr)
        .append("min_tc", r.minTc).append("max_tc", r.maxTc)
      w.write(g)
    }
    w.close()
  }

  /** All index rows for the store's live generation, or None when no index
    * sidecar exists (pre-index store → caller falls back to footer scans). */
  def readIndex(conf: Configuration, dir: Path): Option[Seq[FileRange]] = {
    val indexDir = new Path(dir, "_index")
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(indexDir)) return None
    val files = fs.listStatus(indexDir)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    Some(files.toSeq.flatMap { st =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(st.getPath, conf))
      try {
        val schema = reader.getFooter.getFileMetaData.getSchema
        val out = scala.collection.mutable.ArrayBuffer.empty[FileRange]
        var pages = reader.readNextRowGroup()
        while (pages != null) {
          val colIO = new org.apache.parquet.io.ColumnIOFactory().getColumnIO(schema)
          val rr = colIO.getRecordReader(pages,
            new org.apache.parquet.example.data.simple.convert.GroupRecordConverter(schema))
          var i = 0L
          while (i < pages.getRowCount) {
            val g = rr.read()
            val v = if (g.getFieldRepetitionCount("var_name") > 0)
                      g.getString("var_name", 0) else null
            out += FileRange(g.getString("file", 0), v,
              g.getLong("min_tr", 0), g.getLong("max_tr", 0),
              g.getLong("min_tc", 0), g.getLong("max_tc", 0))
            i += 1
          }
          pages = reader.readNextRowGroup()
        }
        out.toSeq
      } finally reader.close()
    })
  }

  /** Whole-file (tile_row, tile_col) range from a data file's footer stats
    * — used once at write time to build the index (not per scan). */
  def footerRange(conf: Configuration, file: Path): Option[(Long, Long, Long, Long)] = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      var minTr = Long.MaxValue; var maxTr = Long.MinValue
      var minTc = Long.MaxValue; var maxTc = Long.MinValue
      var ok = true
      reader.getFooter.getBlocks.asScala.foreach { b =>
        b.getColumns.asScala.foreach { c =>
          val st = c.getStatistics
          val has = st != null && !st.isEmpty && st.hasNonNullValue
          c.getPath.toDotString match {
            case "tile_row" =>
              if (has) {
                minTr = math.min(minTr, st.genericGetMin.asInstanceOf[Number].longValue())
                maxTr = math.max(maxTr, st.genericGetMax.asInstanceOf[Number].longValue())
              } else ok = false
            case "tile_col" =>
              if (has) {
                minTc = math.min(minTc, st.genericGetMin.asInstanceOf[Number].longValue())
                maxTc = math.max(maxTc, st.genericGetMax.asInstanceOf[Number].longValue())
              } else ok = false
            case _ => ()
          }
        }
      }
      if (ok && minTr != Long.MaxValue && minTc != Long.MaxValue)
        Some((minTr, maxTr, minTc, maxTc))
      else None
    } finally reader.close()
  }

  /** Sweep every data file under `dir` (flat files and var_name=<v>/
    * partition dirs) into an `_index` sidecar from footer stats — the
    * one-time write-side cost that makes every later scan plan from a
    * single file. Files whose stats are unreadable are indexed with the
    * full-range row (never pruned). */
  def buildIndexFromFooters(conf: Configuration, dir: Path): Unit = {
    val fs = dir.getFileSystem(conf)
    val top = fs.listStatus(dir).toSeq
    val flat = top.filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath, s.getPath.getName, null: String))
    val partd = top.filter(s => s.isDirectory && s.getPath.getName.startsWith("var_name="))
      .flatMap { d =>
        val v = d.getPath.getName.stripPrefix("var_name=")
        fs.listStatus(d.getPath)
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .map(s => (s.getPath, s"${d.getPath.getName}/${s.getPath.getName}", v))
      }
    val ranges = (flat ++ partd).map { case (p, rel, v) =>
      footerRange(conf, p) match {
        case Some((a, b, c, d)) => FileRange(rel, v, a, b, c, d)
        case None => FileRange(rel, v, Long.MinValue, Long.MaxValue, Long.MinValue, Long.MaxValue)
      }
    }
    writeIndex(conf, dir, ranges)
  }
}
