package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The write half of the connector surface: a DSv2 BATCH_WRITE sink that
  * exercises the full two-phase commit protocol — per-task `DataWriter`s
  * accumulate (rows, bytes), task `commit()` emits a
  * `WriterCommitMessage`, and only the driver-side `BatchWrite.commit`
  * over the COMMITTED messages publishes the run's stats; a failed job
  * routes through `abort` and publishes nothing. This is exactly the
  * shape an exactly-once external sink (JDBC staging table, object-store
  * manifest commit) takes: task outputs stay invisible until the single
  * driver-side commit, and speculative/retried tasks are de-duplicated
  * by Spark's output commit coordinator (`useCommitCoordinator`,
  * default true).
  *
  * Usage: `df.write.format("graft-metrics").option("runId", id)
  * .mode("append").save()`; read the audit with
  * [[SinkMetrics.get]](id). Doubles as a validating noop sink: all the
  * cost of materializing every row, none of the I/O.
  */
class MetricsSinkSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-metrics"
  // write-only source: the schema is whatever the written frame carries
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = new StructType()
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    MetricsSinkTable(schema)
}

/** Driver-side audit registry, keyed by the write's `runId` option. */
object SinkMetrics {
  final case class Stats(rows: Long, bytes: Long, tasks: Int)
  private val runs = new java.util.concurrent.ConcurrentHashMap[String, Stats]()
  def get(runId: String): Option[Stats] = Option(runs.get(runId))
  private[sources] def publish(runId: String, s: Stats): Unit = runs.put(runId, s)
  def clear(runId: String): Unit = runs.remove(runId)
}

case class MetricsSinkTable(writeSchema: StructType) extends Table with SupportsWrite {
  override def name(): String = "graft-metrics"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val runId = Option(info.options.get("runId")).getOrElse(info.queryId)
    // SupportsTruncate makes overwrite mode legal; nothing to erase in
    // a metrics-only sink
    new WriteBuilder with org.apache.spark.sql.connector.write.SupportsTruncate {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = MetricsBatchWrite(runId)
      }
      override def truncate(): WriteBuilder = this
    }
  }
}

case class TaskStats(rows: Long, bytes: Long) extends WriterCommitMessage

case class MetricsBatchWrite(runId: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    MetricsWriterFactory()

  /** Driver-side commit over exactly the committed task messages — the
    * only place the run becomes visible. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val stats = messages.collect { case TaskStats(r, b) => (r, b) }
    SinkMetrics.publish(runId,
      SinkMetrics.Stats(stats.map(_._1).sum, stats.map(_._2).sum, stats.length))
  }
  /** Abort rolls back THIS run's effects — and this run never published
    * anything (publish happens only in commit), so there is nothing to
    * do. Clearing the runId here would destroy a PREVIOUS successful
    * run's committed audit under the same id. */
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

case class MetricsWriterFactory() extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var rows = 0L
      private var bytes = 0L
      override def write(row: InternalRow): Unit = {
        rows += 1
        bytes += (row match {
          case u: UnsafeRow => u.getSizeInBytes.toLong
          case other => other.numFields * 8L // generic rows: rough floor
        })
      }
      override def commit(): WriterCommitMessage = TaskStats(rows, bytes)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
