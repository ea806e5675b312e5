package graft.sources

import graft.core.{Affine, Crs, GridRef}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.ColumnIOFactory
import org.apache.parquet.schema.MessageType
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** DataSourceV2 registration — the engine's analog of the reference's xarray
  * backend plugin (rioxarray/xarray_plugin.py:29-94: registering
  * engine="rasterio" so the *generic* open_dataset entrypoint reaches the
  * raster reader). Here `spark.read.format("graft").load(path)` opens a
  * TileIO tile store as the canonical (row, col, x, y, value) pixel table
  * without importing engine code, via META-INF/services registration.
  *
  * Scale shape: row/col predicates are pushed into the scan as a pixel
  * window; whole parquet files are pruned at planning time from footer
  * min/max stats on (tile_row, tile_col) — the Hilbert layout keeps spatial
  * ranges contiguous per file, so bbox reads touch O(window) files — and
  * surviving files prune again per row group inside the reader. Column
  * pruning drops x/y generation when not projected. One InputPartition per
  * file at this store size; a production store would split by row group.
  * Read-only by design (the reference plugin is an open entrypoint too);
  * writes go through TileIO.writeTiles. */
class GraftDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft"

  private def path(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "graft source requires a path: spark.read.format(\"graft\").load(path)")
    p
  }

  /** A store being CREATED as multi-variable declares `option("dataset",
    * "true")` (there is nothing on disk to sniff yet); existing stores are
    * sniffed from the var_name= partition layout. */
  private def isDataset(options: CaseInsensitiveStringMap): Boolean =
    options.getBoolean("dataset", false) ||
      GraftDataSource.isDatasetStore(path(options))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    if (isDataset(options)) GraftDataSource.DatasetSchema
    else GraftDataSource.PixelSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val p = path(opts)
    // a store being CREATED has no sidecar yet: take the grid from options
    val (grid, tileSize) =
      try TileIO.readGrid(SparkSession.active, p)
      catch { case _: Exception => GraftWrite.gridFromOptions(opts.get) }
    new GraftTable(p, grid, tileSize, isDataset(opts))
  }
}

object GraftDataSource {
  // nullable=true so arbitrary (possibly-nullable) pixel plans resolve
  // against the table on the WRITE path; the scan itself never emits nulls
  val PixelSchema: StructType = StructType(Seq(
    StructField("row", LongType, nullable = true),
    StructField("col", LongType, nullable = true),
    StructField("x", DoubleType, nullable = true),
    StructField("y", DoubleType, nullable = true),
    StructField("value", LongType, nullable = true)))

  /** Multi-variable (TileIO.writeDatasetTiles) stores add the var_name
    * partition column. */
  val DatasetSchema: StructType =
    StructType(StructField("var_name", StringType, nullable = true) +: PixelSchema.fields)

  /** A dataset store keeps its tiles under var_name=<v>/ partition dirs. */
  def isDatasetStore(path: String): Boolean = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    fs.exists(p) && fs.listStatus(StoreLayout.dataDir(fs, p)).exists(s =>
      s.isDirectory && s.getPath.getName.startsWith("var_name="))
  }

  /** (file, var_name or null) pairs: flat store -> top-level parquet files;
    * dataset store -> files inside each var_name=<v>/ directory. Resolves
    * the live generation first (StoreLayout), so only committed files of
    * the newest marked generation are ever listed. */
  def listDataFiles(path: String): Seq[(Path, String)] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val root = StoreLayout.dataDir(fs, p)
    val top = fs.listStatus(root)
    val parts = top.filter(s => s.isDirectory && s.getPath.getName.startsWith("var_name="))
    if (parts.isEmpty)
      top.filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .map(f => (f.getPath, null: String)).toSeq
    else parts.toSeq.flatMap { d =>
      val v = d.getPath.getName.stripPrefix("var_name=")
      fs.listStatus(d.getPath).filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .map(f => (f.getPath, v))
    }
  }
}

class GraftTable(path: String, grid: GridRef, val tileSize: Int, isDataset: Boolean)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"graft.`$path`"
  override def schema(): StructType =
    if (isDataset) GraftDataSource.DatasetSchema else GraftDataSource.PixelSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
                    TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(path, grid, tileSize, isDataset)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo):
      org.apache.spark.sql.connector.write.WriteBuilder =
    new GraftWriteBuilder(path, info)
}

/** Folds top-level row/col range conjuncts into a pixel window (handled
  * exactly — integer bounds — so they are consumed, not re-evaluated) and
  * var_name equality/IN into partition-directory pruning; everything else
  * stays a residual Spark-side filter. */
class GraftScanBuilder(path: String, grid: GridRef, tileSize: Int, isDataset: Boolean)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var rowMin = 0L
  private var rowMax = grid.height.toLong - 1
  private var colMin = 0L
  private var colMax = grid.width.toLong - 1
  private var vars: Option[Set[String]] = None
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType =
    if (isDataset) GraftDataSource.DatasetSchema else GraftDataSource.PixelSchema

  private def long(v: Any): Long = v.asInstanceOf[Number].longValue()

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case GreaterThan(a, _) => a == "row" || a == "col"
      case GreaterThanOrEqual(a, _) => a == "row" || a == "col"
      case LessThan(a, _) => a == "row" || a == "col"
      case LessThanOrEqual(a, _) => a == "row" || a == "col"
      case EqualTo(a, _) => a == "row" || a == "col" || (a == "var_name" && isDataset)
      case In(a, _) => a == "var_name" && isDataset
      // the scan never emits nulls (schema is nullable only so write plans
      // resolve) — IsNotNull is vacuously true and consumed here, otherwise
      // it survives as a residual and drags its column into the projection
      case IsNotNull(_) => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThan("row", v) => rowMin = math.max(rowMin, long(v) + 1)
      case GreaterThanOrEqual("row", v) => rowMin = math.max(rowMin, long(v))
      case LessThan("row", v) => rowMax = math.min(rowMax, long(v) - 1)
      case LessThanOrEqual("row", v) => rowMax = math.min(rowMax, long(v))
      case EqualTo("row", v) => rowMin = math.max(rowMin, long(v)); rowMax = math.min(rowMax, long(v))
      case GreaterThan("col", v) => colMin = math.max(colMin, long(v) + 1)
      case GreaterThanOrEqual("col", v) => colMin = math.max(colMin, long(v))
      case LessThan("col", v) => colMax = math.min(colMax, long(v) - 1)
      case LessThanOrEqual("col", v) => colMax = math.min(colMax, long(v))
      case EqualTo("col", v) => colMin = math.max(colMin, long(v)); colMax = math.min(colMax, long(v))
      case EqualTo("var_name", v) =>
        val s = Set(v.asInstanceOf[String])
        vars = Some(vars.fold(s)(_ intersect s))
      case In("var_name", vs) =>
        val s = vs.map(_.asInstanceOf[String]).toSet
        vars = Some(vars.fold(s)(_ intersect s))
      case _ => ()
    }
    pushed = accepted
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new GraftScan(path, grid, tileSize, rowMin, rowMax, colMin, colMax, vars, required)
}

class GraftScan(path: String, grid: GridRef, tileSize: Int,
                rowMin: Long, rowMax: Long, colMin: Long, colMax: Long,
                vars: Option[Set[String]],
                required: StructType) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft tiles window=[rows $rowMin..$rowMax, cols $colMin..$colMax] " +
      vars.map(v => s"vars=${v.toSeq.sorted.mkString("{", ",", "}")} ").getOrElse("") +
      s"columns=${required.fieldNames.mkString(",")}"

  private def tRowMin = rowMin / tileSize
  private def tRowMax = rowMax / tileSize
  private def tColMin = colMin / tileSize
  private def tColMax = colMax / tileSize

  /** Planning-time file pruning. Preferred path: the `_index` sidecar (one
    * small parquet of per-file tile ranges, written at store commit) — the
    * driver reads ONE file no matter how many data files the store has.
    * Fallback for pre-index stores: the original per-footer sweep over
    * min/max statistics on (tile_row, tile_col). Empty window → zero
    * partitions. */
  override def planInputPartitions(): Array[InputPartition] = {
    if (rowMin > rowMax || colMin > colMax || vars.exists(_.isEmpty)) return Array.empty
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val dataDir = StoreLayout.dataDir(new Path(path).getFileSystem(conf), new Path(path))
    StoreLayout.readIndex(conf, dataDir) match {
      case Some(ranges) =>
        ranges
          .filter(r => vars.forall(ws => r.varName != null && ws.contains(r.varName)) ||
                       (r.varName == null && vars.isEmpty))
          .filter(r => r.maxTr >= tRowMin && r.minTr <= tRowMax &&
                       r.maxTc >= tColMin && r.minTc <= tColMax)
          .map(r => GraftInputPartition(new Path(dataDir, r.file).toString, grid,
                      tileSize, rowMin, rowMax, colMin, colMax, r.varName,
                      required.fieldNames): InputPartition).toArray
      case None =>
        val files = GraftDataSource.listDataFiles(path)
          .filter { case (_, v) => vars.forall(ws => v != null && ws.contains(v)) ||
                                   (v == null && vars.isEmpty) }
        files.filter { case (f, _) =>
          val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
          try {
            reader.getFooter.getBlocks.asScala.exists(b => blockOverlaps(b))
          } finally reader.close()
        }.map { case (f, v) => GraftInputPartition(f.toString, grid, tileSize,
                                       rowMin, rowMax, colMin, colMax, v,
                                       required.fieldNames): InputPartition }.toArray
    }
  }

  private def blockOverlaps(b: org.apache.parquet.hadoop.metadata.BlockMetaData): Boolean =
    GraftScan.overlaps(b, tRowMin, tRowMax, tColMin, tColMax)

  override def createReaderFactory(): PartitionReaderFactory = new GraftReaderFactory
}

object GraftScan {
  /** Row-group overlap test on tile_row/tile_col long statistics; a chunk
    * without stats conservatively matches. */
  def overlaps(b: org.apache.parquet.hadoop.metadata.BlockMetaData,
               tRowMin: Long, tRowMax: Long, tColMin: Long, tColMax: Long): Boolean = {
    var rowOk = true; var colOk = true
    b.getColumns.asScala.foreach { c =>
      val name = c.getPath.toDotString
      val st = c.getStatistics
      if (st != null && !st.isEmpty && st.hasNonNullValue) {
        if (name == "tile_row") {
          val mn = st.genericGetMin.asInstanceOf[Number].longValue()
          val mx = st.genericGetMax.asInstanceOf[Number].longValue()
          rowOk = mx >= tRowMin && mn <= tRowMax
        } else if (name == "tile_col") {
          val mn = st.genericGetMin.asInstanceOf[Number].longValue()
          val mx = st.genericGetMax.asInstanceOf[Number].longValue()
          colOk = mx >= tColMin && mn <= tColMax
        }
      }
    }
    rowOk && colOk
  }
}

case class GraftInputPartition(file: String, grid: GridRef, tileSize: Int,
                               rowMin: Long, rowMax: Long, colMin: Long, colMax: Long,
                               varName: String,
                               columns: Array[String]) extends InputPartition

class GraftReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftPartitionReader(partition.asInstanceOf[GraftInputPartition])
}

/** Streams one parquet file of packed tiles: row groups are pruned again via
  * footer stats, each surviving tile decodes positionally (local index →
  * row/col) and emits only pixels inside the pushed window, computing x/y on
  * the fly only if projected. */
class GraftPartitionReader(p: GraftInputPartition) extends PartitionReader[InternalRow] {
  private val conf = new Configuration()
  private val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(p.file), conf))
  private val fileSchema: MessageType = reader.getFooter.getFileMetaData.getSchema
  private val requested: MessageType = {
    def field(n: String) = fileSchema.getFields.asScala.find(_.getName == n).get
    new MessageType("tile", field("tile_row"), field("tile_col"), field("data"))
  }
  private val blocks = reader.getFooter.getBlocks.asScala.toArray
  private var blockIdx = 0
  private var recordReader: org.apache.parquet.io.RecordReader[Group] = _
  private var rowsLeftInGroup = 0L

  private val ts = p.tileSize
  private val t: Affine = p.grid.transform
  // column emitters bound once per partition, in the pruned projection order
  private val buffer = new ArrayBuffer[InternalRow](ts)
  private var bufferIdx = 0
  private var current: InternalRow = _

  private val tRowMin = p.rowMin / ts; private val tRowMax = p.rowMax / ts
  private val tColMin = p.colMin / ts; private val tColMax = p.colMax / ts

  private def advanceRowGroup(): Boolean = {
    rowsLeftInGroup = 0
    while (blockIdx < blocks.length && rowsLeftInGroup == 0) {
      if (GraftScan.overlaps(blocks(blockIdx), tRowMin, tRowMax, tColMin, tColMax)) {
        val pages = reader.readRowGroup(blockIdx)
        if (pages != null) {
          val colIO = new ColumnIOFactory().getColumnIO(requested, fileSchema)
          recordReader = colIO.getRecordReader(pages, new GroupRecordConverter(requested))
          rowsLeftInGroup = pages.getRowCount
        }
      }
      blockIdx += 1
    }
    rowsLeftInGroup > 0
  }

  private def decodeTile(g: Group): Unit = {
    val tileRow = g.getLong("tile_row", 0)
    val tileCol = g.getLong("tile_col", 0)
    if (tileRow < tRowMin || tileRow > tRowMax || tileCol < tColMin || tileCol > tColMax) return
    val listGroup = g.getGroup("data", 0)
    val n = listGroup.getFieldRepetitionCount(0)
    val r0 = tileRow * ts; val c0 = tileCol * ts
    var i = 0
    while (i < n) {
      val row = r0 + i / ts; val col = c0 + i % ts
      if (row >= p.rowMin && row <= p.rowMax && col >= p.colMin && col <= p.colMax &&
          row < p.grid.height && col < p.grid.width) {
        val v = listGroup.getGroup(0, i).getDouble(0, 0)
        val out = new GenericInternalRow(p.columns.length)
        var f = 0
        while (f < p.columns.length) {
          p.columns(f) match {
            case "row" => out.setLong(f, row)
            case "col" => out.setLong(f, col)
            case "x" => out.setDouble(f, t.a * (col + 0.5) + t.b * (row + 0.5) + t.c)
            case "y" => out.setDouble(f, t.d * (col + 0.5) + t.e * (row + 0.5) + t.f)
            case "value" => out.setLong(f, v.toLong)
            case "var_name" =>
              out.update(f, org.apache.spark.unsafe.types.UTF8String.fromString(p.varName))
          }
          f += 1
        }
        buffer += out
      }
      i += 1
    }
  }

  override def next(): Boolean = {
    while (bufferIdx >= buffer.length) {
      buffer.clear(); bufferIdx = 0
      if (rowsLeftInGroup == 0 && !advanceRowGroup()) return false
      decodeTile(recordReader.read())
      rowsLeftInGroup -= 1
    }
    current = buffer(bufferIdx)
    bufferIdx += 1
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
