package graft.sources

import java.io.{DataInputStream, DataOutputStream, File, FileInputStream, FileOutputStream}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A real DataSourceV2 source for the engine's own chunked binary grid
  * format — the native-ingestion analog of the reference's chunked lazy
  * NetCDF open (`xr.open_dataset(fp, chunks=...)`,
  * reference scripts/process_climate_amazon_monthly.py:200): SURVEY §2
  * SRC1 models that scan as long-form parquet; this source demonstrates
  * the same contract end-to-end through Spark's connector API with no
  * external codec:
  *
  *   - CHUNKED, LAZY: one file per latitude band (`lat=<i>.ggrid`), one
  *     `InputPartition` per file — Spark schedules a task per chunk and
  *     no byte is read at planning time (exactly xarray's chunk
  *     semantics, with the chunk key in the file name like a Hive
  *     partition dir).
  *   - COLUMN PRUNING: `SupportsPushDownRequiredColumns` — the reader
  *     materializes ONLY the pruned columns into each `InternalRow`.
  *   - FILTER PUSHDOWN: `SupportsPushDownFilters` — comparisons on
  *     `lat_idx` skip whole chunk FILES at planning (the row-group-skip
  *     analog); they are also retained post-scan (returned as residual)
  *     so correctness never depends on the skip.
  *
  * File layout (big-endian, DataOutputStream): magic "GGRD", int32 row
  * count, then per row int32 lat_idx, int32 lon_idx, int32 epoch_day,
  * int64 cents. At 100 TB the format's unit of parallelism is the chunk
  * file — the source lists O(files) metadata and streams rows per task.
  */
class GridSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GridSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // The format's schema is fixed by the file layout; silently replacing
    // a caller's .schema(...) would be a wrong-answer trap, so reject any
    // schema that isn't ours (Spark passes the inferred one back here on
    // the normal path).
    if (schema != null && schema != GridSource.Schema)
      throw new IllegalArgumentException(
        s"ggrid has a fixed schema ${GridSource.Schema.simpleString}; " +
          s"user-specified schema ${schema.simpleString} is not supported")
    new GridTable(properties.get("path"))
  }
}

object GridSource {
  val Magic = 0x47475244 // "GGRD"
  val Schema: StructType = StructType(Seq(
    StructField("lat_idx", IntegerType, nullable = false),
    StructField("lon_idx", IntegerType, nullable = false),
    StructField("epoch_day", IntegerType, nullable = false),
    StructField("cents", LongType, nullable = false)))

  /** Prepare an output dir: create it and drop stale chunk files.
    * Driver-side step of the executor-side write path (the task writers
    * only ever create their own lat's file, so a stale band from a
    * previous run with more lats would otherwise survive).
    */
  def clearGridDir(dir: String): Unit = {
    val d = new File(dir)
    d.mkdirs()
    d.listFiles((f: File) => f.getName.endsWith(".ggrid")).foreach(_.delete())
  }

  /** Write ONE lat band's chunk file. Executor-safe: touches only
    * `lat=<lat>.ggrid`, so tasks holding disjoint lat bands (the
    * repartition-by-lat contract) never contend.
    */
  def writeChunk(dir: String, lat: Int, cells: Seq[(Int, Int, Int, Long)]): Unit = {
    val out = new DataOutputStream(
      new FileOutputStream(new File(dir, s"lat=$lat.ggrid")))
    try {
      out.writeInt(Magic)
      out.writeInt(cells.size)
      cells.sortBy(c => (c._2, c._3)).foreach { case (la, lo, day, cents) =>
        out.writeInt(la); out.writeInt(lo); out.writeInt(day)
        out.writeLong(cents)
      }
    } finally out.close()
  }

  /** Driver-side writer for an in-memory grid (spec/tooling use). */
  def writeGrid(rows: Seq[(Int, Int, Int, Long)], dir: String): Unit = {
    clearGridDir(dir)
    rows.groupBy(_._1).foreach { case (lat, cells) =>
      writeChunk(dir, lat, cells)
    }
  }

  /** lat band encoded in the chunk file name (the skip key). */
  private[graft] def latOf(f: File): Int =
    f.getName.stripPrefix("lat=").stripSuffix(".ggrid").toInt

  /** Does a lat band survive the pushed filters? Only lat_idx
    * comparisons participate (anything else was declared residual).
    */
  private[graft] def survives(lat: Int, filters: Array[Filter]): Boolean =
    filters.forall {
      case EqualTo("lat_idx", v: Int)            => lat == v
      case GreaterThan("lat_idx", v: Int)        => lat > v
      case GreaterThanOrEqual("lat_idx", v: Int) => lat >= v
      case LessThan("lat_idx", v: Int)           => lat < v
      case LessThanOrEqual("lat_idx", v: Int)    => lat <= v
      case _                                     => true
    }
}

class GridTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"ggrid:$path"
  override def schema(): StructType = GridSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GridScanBuilder(path)
}

class GridScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = GridSource.Schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // Accept lat_idx comparisons for FILE skipping but return every filter
  // as residual: the skip is an optimization, Spark still applies the
  // predicate post-scan, so a skip bug can only lose speed, not rows.
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed.filter {
    case EqualTo("lat_idx", _) | GreaterThan("lat_idx", _) |
         GreaterThanOrEqual("lat_idx", _) | LessThan("lat_idx", _) |
         LessThanOrEqual("lat_idx", _) => true
    case _ => false
  }

  override def build(): Scan = GridScan(path, required, pushedFilters())
}

case class GridScan(path: String, required: StructType,
    filters: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val files = Option(new File(path)
      .listFiles((f: File) => f.getName.endsWith(".ggrid")))
      .getOrElse(Array.empty[File])
    files
      .filter(f => GridSource.survives(GridSource.latOf(f), filters))
      .sortBy(_.getName)
      .map(f => GridPartition(f.getAbsolutePath): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    GridReaderFactory(required.fieldNames)
}

case class GridPartition(file: String) extends InputPartition

case class GridReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GridReader(partition.asInstanceOf[GridPartition].file, cols)
}

/** Streams one chunk file; materializes only the pruned columns. */
class GridReader(file: String, cols: Array[String])
    extends PartitionReader[InternalRow] {
  // Column positions resolved ONCE against the fixed layout; an unknown
  // pruned column fails loudly here, not as a per-row MatchError.
  private val fieldPos: Array[Int] = cols.map {
    case "lat_idx" => 0
    case "lon_idx" => 1
    case "epoch_day" => 2
    case "cents" => 3
    case other => throw new IllegalArgumentException(
      s"ggrid has no column '$other' (schema: ${GridSource.Schema.simpleString})")
  }
  private val in = new DataInputStream(new FileInputStream(file))
  // A bad/truncated header must not leak the just-opened stream: Spark
  // only close()s readers it was actually handed.
  private val total =
    try {
      val magic = in.readInt()
      require(magic == GridSource.Magic,
        f"bad GGRD magic 0x$magic%08x in $file")
      in.readInt()
    } catch {
      case e: Throwable =>
        try in.close() catch { case _: Throwable => () }
        e match {
          case _: java.io.EOFException =>
            throw new java.io.EOFException(s"truncated GGRD header in $file")
          case other => throw other
        }
    }
  private var seen = 0
  private var row: InternalRow = _

  override def next(): Boolean =
    if (seen >= total) false
    else {
      val fields: Array[Any] =
        try {
          val lat = in.readInt(); val lon = in.readInt()
          val day = in.readInt(); val cents = in.readLong()
          Array[Any](lat, lon, day, cents)
        } catch {
          case _: java.io.EOFException => throw new java.io.EOFException(
            s"truncated GGRD row ${seen + 1}/$total in $file")
        }
      row = new GenericInternalRow(fieldPos.map(i => fields(i)))
      seen += 1
      true
    }
  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}
