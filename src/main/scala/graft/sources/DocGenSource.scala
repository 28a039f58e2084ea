package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A native DataSource V2: a deterministic synthetic `documents` corpus
  * generator with SOURCE-LEVEL split pruning, filter pushdown and column
  * pruning — the connector-API form of the engine's scan capabilities
  * (SURVEY §2.1), built the way a real connector to a range-sharded
  * store (Kafka offsets, key-ranged KV, a REST-paginated feed) is built.
  *
  * Why it matters at 100 TB: pruning must happen at PLANNING time, in
  * the source. `doc_id` range predicates clip the global row interval
  * BEFORE splits are planned, so non-matching splits never become tasks
  * (a task that opens a reader just to filter everything out still pays
  * scheduling + connection + seek). Column pruning reaches the
  * generator, so unrequested expensive fields (here `text`, standing in
  * for a fetched blob) are never materialized.
  *
  * Usage: `spark.read.format("graft-docs").option("rows", n)
  * .option("splits", k).load()`.
  */
class DocGenSource extends TableProvider with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-docs"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = DocGen.schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // the DSv2 options contract is case-insensitive; the raw properties
    // map here is not — normalize before lookup
    val opts = new CaseInsensitiveStringMap(properties)
    DocGenTable(
      rows = Option(opts.get("rows")).map(_.toLong).getOrElse(1000L),
      splits = Option(opts.get("splits")).map(_.toInt).getOrElse(8),
      columnar = Option(opts.get("columnar")).forall(_.toBoolean),
      ratePerBatch = Option(opts.get("ratePerBatch")).map(_.toLong).getOrElse(1000L))
  }
}

object DocGen {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  private val langs = Array("en", "de", "es", "fr", "zh")
  private val words = Array("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu")

  /** Cheap deterministic per-doc hash (splitmix64 finalizer). */
  def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def lang(id: Long): String = langs(((mix(id) % 5 + 5) % 5).toInt)
  def source(id: Long): String = "src" + ((mix(id + 7) % 20 + 20) % 20)

  private def nWords(id: Long): Int = ((mix(id + 13) % 40 + 40) % 40).toInt + 5
  private def wordAt(id: Long, i: Int): String =
    words(((mix(id * 41 + i) % 12 + 12) % 12).toInt)

  /** The expensive field: only generated when the scan asks for it. */
  def text(id: Long): String = {
    val n = nWords(id)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(wordAt(id, i))
      i += 1
    }
    sb.toString
  }

  /** `text(id).length` WITHOUT building the string — pruning `text` must
    * not secretly materialize it just to measure it. */
  def textLen(id: Long): Long = {
    val n = nWords(id)
    var len = n - 1 // the separating spaces
    var i = 0
    while (i < n) { len += wordAt(id, i).length; i += 1 }
    len.toLong
  }
}

case class DocGenTable(
    rows: Long, splits: Int, columnar: Boolean = true, ratePerBatch: Long = 1000L)
    extends Table with SupportsRead {
  override def name(): String = s"graft-docs($rows)"
  override def schema(): StructType = DocGen.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    DocGenScanBuilder(rows, splits, columnar, ratePerBatch)
}

/** Pushdown handshake: doc_id range predicates are FULLY consumed (they
  * clip the planned interval — `pushedFilters` reports them so Spark
  * drops its re-filter); anything else is left for Spark to apply. */
case class DocGenScanBuilder(
    rows: Long, splits: Int, columnar: Boolean = true, ratePerBatch: Long = 1000L)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo = 0L // inclusive
  private var hi = rows // exclusive
  private var accepted = Array.empty[Filter]
  private var required: StructType = DocGen.schema

  // saturating successor: v+1 on Long.MaxValue must not wrap — doc_ids
  // live in [0, rows), so a saturated bound still clips correctly
  private def inc(v: Long): Long = if (v == Long.MaxValue) v else v + 1

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (taken, rest) = filters.partition {
      case EqualTo("doc_id", _: Long) => true
      case GreaterThan("doc_id", _: Long) => true
      case GreaterThanOrEqual("doc_id", _: Long) => true
      case LessThan("doc_id", _: Long) => true
      case LessThanOrEqual("doc_id", _: Long) => true
      case _ => false
    }
    taken.foreach {
      case EqualTo(_, v: Long) => lo = math.max(lo, v); hi = math.min(hi, inc(v))
      case GreaterThan(_, v: Long) => lo = math.max(lo, inc(v))
      case GreaterThanOrEqual(_, v: Long) => lo = math.max(lo, v)
      case LessThan(_, v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual(_, v: Long) => hi = math.min(hi, inc(v))
      case _ => ()
    }
    accepted = taken
    rest
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    DocGenScan(lo, math.max(lo, hi), math.max(1L, rows / splits), required,
      columnar, ratePerBatch)
}

case class DocGenScan(
    lo: Long, hi: Long, splitSize: Long, required: StructType,
    columnar: Boolean = true, ratePerBatch: Long = 1000L) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-docs range [$lo,$hi) cols ${required.fieldNames.mkString(",")}"

  /** The split SIZE is fixed by the table's (rows/splits); partitions are
    * planned only over the CLIPPED interval, so a pushed doc_id range
    * yields proportionally fewer input partitions — no task ever exists
    * for rows the predicate excludes. */
  override def planInputPartitions(): Array[InputPartition] = {
    val total = hi - lo
    if (total <= 0) return Array.empty
    val n = ((total + splitSize - 1) / splitSize).toInt
    (0 until n).map { i =>
      DocGenPartition(lo + total * i / n, lo + total * (i + 1) / n)
    }.filter(p => p.until > p.from).toArray[InputPartition]
  }
  override def createReaderFactory(): PartitionReaderFactory =
    DocGenReaderFactory(required, columnar)

  /** Streaming form of the SAME scan: the generator as an offset-tracked
    * micro-batch source (the Kafka-shape API — offsets are positions in
    * the doc_id sequence, each trigger consumes up to `ratePerBatch`).
    * Batch and streaming share the split planning and readers, so a
    * connector written once serves both `spark.read` and
    * `spark.readStream`, exactly-once via the streaming engine's offset
    * log (restart resumes from the committed position — tested). */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new DocGenMicroBatch(lo, hi, splitSize, required, columnar, ratePerBatch)
}

/** Offset = exclusive upper position consumed so far in [lo, hi). */
case class DocGenOffset(pos: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = pos.toString
}

class DocGenMicroBatch(
    lo: Long, hi: Long, splitSize: Long, required: StructType,
    columnar: Boolean, ratePerBatch: Long)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  override def initialOffset(): Offset = DocGenOffset(lo)

  // STATELESS rate limiting via admission control: the engine hands us
  // the current start offset, so a fresh instance after restart cannot
  // offer an offset behind the committed one (a mutable high-watermark
  // here measurably regressed the checkpoint and replayed batches —
  // the engine does not route the restored offset through this instance
  // before its first latestOffset call)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    import org.apache.spark.sql.connector.read.streaming.{ReadAllAvailable, ReadMaxRows}
    val s = math.max(start.asInstanceOf[DocGenOffset].pos, lo)
    // honor the engine's limit: Trigger.Once/AvailableNow pass
    // ReadAllAvailable (ignoring it would silently deliver ONE rate
    // quantum and terminate "successfully" with data missing)
    val step = limit match {
      case _: ReadAllAvailable => hi - s
      case m: ReadMaxRows => m.maxRows()
      case _ => math.max(1L, ratePerBatch)
    }
    DocGenOffset(math.min(hi, s + math.max(1L, step)))
  }
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-control source: engine must call latestOffset(start, limit)")
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(ratePerBatch)
  override def reportLatestOffset(): Offset = DocGenOffset(hi)

  override def deserializeOffset(json: String): Offset = DocGenOffset(json.toLong)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[DocGenOffset].pos, end.asInstanceOf[DocGenOffset].pos)
    // same proportional splitting as the batch path
    DocGenScan(s, e, splitSize, required, columnar).planInputPartitions()
  }
  override def createReaderFactory(): PartitionReaderFactory =
    DocGenReaderFactory(required, columnar)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class DocGenPartition(from: Long, until: Long) extends InputPartition

/** Row- and COLUMNAR-mode readers over the same generator. Columnar is
  * the default: batches of [[DocGenReaderFactory.BatchRows]] rows land
  * directly in `OnHeapColumnVector`s (the same vectors Spark's parquet
  * reader fills), so the scan enters the query as `ColumnarBatch`es and
  * downstream whole-stage codegen consumes them vectorized instead of
  * one `InternalRow` at a time — at scan-bound scale this is where
  * source throughput comes from. The row path stays for the
  * `columnar=false` option and as the spec's equivalence baseline. */
case class DocGenReaderFactory(required: StructType, columnar: Boolean = true)
    extends PartitionReaderFactory {
  import DocGenReaderFactory.BatchRows
  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
  import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}

  override def supportColumnarReads(p: InputPartition): Boolean = columnar

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[DocGenPartition]
    new PartitionReader[InternalRow] {
      private var id = part.from - 1
      // resolve field generators once per partition, not per row
      private val gens: Array[Long => Any] = required.fieldNames.map {
        case "doc_id" => (i: Long) => i
        case "lang" => (i: Long) => UTF8String.fromString(DocGen.lang(i))
        case "source" => (i: Long) => UTF8String.fromString(DocGen.source(i))
        case "n_chars" => (i: Long) => DocGen.textLen(i)
        case "text" => (i: Long) => UTF8String.fromString(DocGen.text(i))
        case other => throw new IllegalArgumentException(s"unknown column $other")
      }
      override def next(): Boolean = { id += 1; id < part.until }
      override def get(): InternalRow = InternalRow.fromSeq(gens.map(_(id)).toSeq)
      override def close(): Unit = ()
    }
  }

  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] = {
    val part = p.asInstanceOf[DocGenPartition]
    new PartitionReader[ColumnarBatch] {
      private var nextId = part.from
      private val vectors = OnHeapColumnVector.allocateColumns(BatchRows, required)
      private val batch = new ColumnarBatch(vectors.map(_.asInstanceOf[ColumnVector]))
      // one filler per column, dispatched once per partition
      private val fill: Array[(Int, Long) => Unit] = required.fields.zipWithIndex.map {
        case (f, c) => f.name match {
          case "doc_id" => (r: Int, i: Long) => vectors(c).putLong(r, i)
          case "n_chars" => (r: Int, i: Long) => vectors(c).putLong(r, DocGen.textLen(i))
          case "lang" => (r: Int, i: Long) =>
            val b = DocGen.lang(i).getBytes("UTF-8"); vectors(c).putByteArray(r, b, 0, b.length)
          case "source" => (r: Int, i: Long) =>
            val b = DocGen.source(i).getBytes("UTF-8"); vectors(c).putByteArray(r, b, 0, b.length)
          case "text" => (r: Int, i: Long) =>
            val b = DocGen.text(i).getBytes("UTF-8"); vectors(c).putByteArray(r, b, 0, b.length)
          case other => throw new IllegalArgumentException(s"unknown column $other")
        }
      }

      override def next(): Boolean = {
        if (nextId >= part.until) return false
        val n = math.min(BatchRows.toLong, part.until - nextId).toInt
        vectors.foreach(_.reset())
        var r = 0
        while (r < n) {
          val i = nextId + r
          var c = 0
          while (c < fill.length) { fill(c)(r, i); c += 1 }
          r += 1
        }
        batch.setNumRows(n)
        nextId += n
        true
      }
      override def get(): ColumnarBatch = batch
      override def close(): Unit = batch.close()
    }
  }
}

object DocGenReaderFactory {
  /** Rows per ColumnarBatch — parquet-reader-sized. */
  val BatchRows = 4096
}
