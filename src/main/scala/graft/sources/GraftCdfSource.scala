package graft.sources

import graft.operators.PartitionedTable
import graft.streaming.ChangeFeed
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** The change feed as a STREAMING SOURCE — the subscription API
  * [[graft.streaming.ChangeFeed.maintain]]'s relay couldn't be:
  *
  * {{{
  *   spark.readStream.format("graft-cdf")
  *     .option("dir", table).option("key", "k").option("part", "p")
  *     .load()
  * }}}
  *
  * gives any Structured Streaming pipeline (windowed aggs, stateful
  * processors, stream-stream joins, every sink with its own
  * exactly-once story) a live view of a
  * [[graft.operators.PartitionedTable]]'s commits. Offsets ARE commit
  * versions: micro-batch (start, end] is precisely
  * [[ChangeFeed.batch]]'s per-commit slices over that version range —
  * deterministic on replay because commits are immutable, which is the
  * whole exactly-once contract (a restarted query re-reads the SAME
  * byte-identical feed for an uncommitted batch, exactly like src03's
  * offset-log test). The engine's checkpoint owns the offset; the
  * vacuum-horizon guard applies as for any feed reader — an offset
  * pruned past fails LOUD at getBatch rather than silently snapshotting.
  *
  * Implemented on the V1 streaming `Source` API (the stable pattern
  * lakehouse CDF sources use): `getBatch` returns the library-built
  * frame, so slice computation — per-commit partition diffs that never
  * scan untouched partitions — is the feed's own, not a
  * reimplementation. Options: `dir` (required), `key` (required),
  * `part` (required), `preimages` (default false),
  * `startversion` (default 0 = post-load changes; -1 = include the
  * initial load as inserts).
  *
  * 100 TB posture: a micro-batch costs the sum of its commits' TOUCHED
  * partitions (the feed contract); the source itself holds no state
  * beyond the engine's offset log.
  */
class GraftCdfSource extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-cdf"

  override def sourceSchema(
      ctx: SQLContext, schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), GraftCdfSource.feedSchema(ctx.sparkSession, parameters))

  override def createSource(
      ctx: SQLContext, metadataPath: String, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): Source =
    new CdfStream(ctx.sparkSession, parameters)
}

object GraftCdfSource {
  private[sources] def param(parameters: Map[String, String], k: String): String =
    parameters.getOrElse(k,
      throw new IllegalArgumentException(
        s"graft-cdf: required option '$k' missing (need dir, key, part)"))

  /** The feed's schema: an empty-range batch resolves it from the
    * table's own footers — stable across restarts because the slice
    * projection is (part, key, op, payload..., _commit_version)
    * regardless of which versions a batch spans. */
  private[sources] def feedSchema(
      spark: SparkSession, parameters: Map[String, String]): StructType = {
    val dir = param(parameters, "dir")
    val latest = PartitionedTable.latest(spark, dir).getOrElse(
      throw new IllegalArgumentException(
        s"graft-cdf: no committed versions under $dir"))
    ChangeFeed.batch(spark, dir, param(parameters, "key"),
      param(parameters, "part"), fromVersion = latest,
      toVersion = Some(latest),
      preImages = parameters.get("preimages").exists(_.toBoolean)).schema
  }
}

/** One streaming subscription; offset N = "everything through table
  * version N has been emitted".
  *
  * ADMISSION CONTROL (`maxversionsperbatch`, optional): a replica
  * bootstrapping behind a long history would otherwise fold EVERY
  * pending commit into one giant micro-batch; with the option set, each
  * batch advances at most that many table versions (the
  * [[DocGenMicroBatch]] stateless pattern — the engine hands us the
  * committed start offset, so restarts can never re-offer consumed
  * versions). `Trigger.Once`-style `ReadAllAvailable` limits are
  * honored uncapped: ignoring them would deliver one quantum and
  * terminate "successfully" with data missing. */
class CdfStream(spark: SparkSession, parameters: Map[String, String])
    extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.{ReadAllAvailable, ReadLimit, ReadMaxRows}
  private val dir = GraftCdfSource.param(parameters, "dir")
  private val keyCol = GraftCdfSource.param(parameters, "key")
  private val partCol = GraftCdfSource.param(parameters, "part")
  private val preImages = parameters.get("preimages").exists(_.toBoolean)
  private val startVersion =
    parameters.get("startversion").map(_.toLong).getOrElse(0L)
  private val maxVersionsPerBatch: Option[Int] =
    parameters.get("maxversionsperbatch").map(_.toInt)
  maxVersionsPerBatch.foreach(m => require(m >= 1,
    s"graft-cdf: maxversionsperbatch must be >= 1, got $m"))

  override val schema: StructType =
    GraftCdfSource.feedSchema(spark, parameters)

  override def getOffset: Option[Offset] = {
    val latest = PartitionedTable.latest(spark, dir)
    latest.filter(_ > startVersion).map(CdfOffset(_))
  }

  override def getDefaultReadLimit: ReadLimit =
    maxVersionsPerBatch.map(m => ReadLimit.maxRows(m.toLong))
      .getOrElse(ReadLimit.allAvailable())

  /** "Rows" in the limit are table VERSIONS (the feed's admission
    * quantum — a commit's slice is indivisible, its row count unknown
    * without doing the work). */
  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: ReadLimit): org.apache.spark.sql.connector.read.streaming.Offset = {
    val from = Option(start).map(CdfOffset.of).getOrElse(startVersion)
    val pending = PartitionedTable.versions(spark, dir)
      .filter(_ > from).sorted
    val end = limit match {
      case _: ReadAllAvailable => pending.lastOption
      case m: ReadMaxRows =>
        pending.take(math.max(1L, m.maxRows()).toInt).lastOption
      case _ => pending.lastOption
    }
    end.map(CdfOffset(_)).orNull // null = caught up
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(CdfOffset.of).getOrElse(startVersion)
    val to = CdfOffset.of(end)
    val batch = ChangeFeed.batch(spark, dir, keyCol, partCol,
      fromVersion = from, toVersion = Some(to), preImages = preImages)
    // the source's schema was pinned at stream start — a schema-evolving
    // commit mid-stream would otherwise surface as an opaque union/
    // analysis error rows later; fail with the operable message instead
    // (the Delta CDF contract: restart the stream to adopt a new schema)
    require(batch.schema == schema,
      s"graft-cdf: table schema evolved under a running stream — " +
        s"versions ($from, $to] of $dir produce ${batch.schema.simpleString} " +
        s"but the stream declared ${schema.simpleString} at start; " +
        "restart the query to pick up the evolved schema")
    // re-tagged isStreaming (the FileStreamSource technique) — the
    // inner batch plan is the feed's own slice computation, lazy
    org.apache.spark.sql.graft.Bridge.asStreaming(batch)
  }

  override def stop(): Unit = ()
}

/** Offset = table commit version, serialized as its decimal string. */
case class CdfOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

object CdfOffset {
  /** The engine replays offsets through their JSON form after a
    * restart — accept both the live and the deserialized shape. */
  def of(o: org.apache.spark.sql.connector.read.streaming.Offset): Long =
    o match {
      case CdfOffset(v) => v
      case other => other.json().trim.stripPrefix("\"")
        .stripSuffix("\"").toLong
    }
}
