package graft.operators

import graft.{QueryDef, Tables}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Predicate-shaped MERGE — the `MERGE INTO t USING s ON ... WHEN
  * MATCHED [AND cond] THEN UPDATE/DELETE, WHEN NOT MATCHED [AND cond]
  * THEN INSERT` form Delta users actually write — mapped onto the
  * existing changelog merge: one broadcast join derives each source
  * row's op from the clause list, then [[PartitionedTable.merge]]'s
  * landing (growth-guarded DV/MoR routing, OCC, history) applies it
  * unchanged.
  *
  * Clause semantics are Delta's: clauses evaluate IN ORDER and the
  * first whose condition holds wins; a matched row no clause accepts is
  * left untouched (it never enters the changelog). Conditions and
  * update/insert expressions reference the two sides as `src.<col>`
  * and `tgt.<col>` (the target row is the CURRENT snapshot's). UPDATE
  * SET assigns only the named columns — the rest keep their target
  * values; INSERT takes unnamed columns from the source, which must
  * then carry them.
  *
  * 100 TB posture: matching never shuffles the table. The target read
  * is manifest-pruned to the SOURCE's partitions, the matched rows come
  * from one broadcast-hash inner join (source broadcast, touched
  * partitions streamed), and not-matched source rows from an anti join
  * against the matched keys (both sides batch-sized). The landing then
  * rewrites only touched partitions, exactly like any CDC merge. Source
  * rows must be unique per (partition, key) — the same pre-collapse
  * contract as [[PartitionedTable.merge]].
  */
object MergeInto {

  /** One `WHEN MATCHED [AND cond] THEN ...` clause; `set = None` is
    * DELETE, `Some(assignments)` is UPDATE SET. */
  final case class Matched(cond: Option[Column], set: Option[Map[String, Column]])

  /** The `WHEN NOT MATCHED [AND cond] THEN INSERT` clause; columns
    * absent from `values` fill from the source row. */
  final case class NotMatched(cond: Option[Column], values: Map[String, Column])

  def update(set: Map[String, Column]): Matched = Matched(None, Some(set))
  def updateWhen(cond: Column, set: Map[String, Column]): Matched =
    Matched(Some(cond), Some(set))
  def delete: Matched = Matched(None, None)
  def deleteWhen(cond: Column): Matched = Matched(Some(cond), None)
  def insertAll: NotMatched = NotMatched(None, Map.empty)
  def insertWhen(cond: Column): NotMatched = NotMatched(Some(cond), Map.empty)

  /** Run the MERGE; returns the committed manifest version (the current
    * version unchanged when no clause produced a change — an all-no-op
    * merge must not forge a table version).
    *
    * CONCURRENCY: the clause decisions and tgt-derived update values are
    * computed against ONE pinned snapshot, and the landing is
    * snapshot-pinned ([[PartitionedTable.merge]]'s `sinceVersion`) — a
    * concurrent commit that moves a touched partition between snapshot
    * and landing raises [[PartitionedTable.ConcurrentWriteException]]
    * inside the landing, and the WHOLE merge re-derives from the new
    * snapshot (bounded retries). Re-applying the frozen changes (the
    * plain CDC-merge rebase) would silently overwrite the concurrent
    * writer with values computed from the stale snapshot — the lost
    * update Delta's ConcurrentAppendException exists to prevent. */
  def apply(
      spark: SparkSession,
      dir: String,
      source: DataFrame,
      keyCol: String,
      partCol: String,
      matched: Seq[Matched] = Nil,
      notMatched: Option[NotMatched] = None,
      at: String = ""): Long = {
    var attempts = 0
    while (true) {
      attempts += 1
      require(attempts <= 8,
        s"MergeInto: lost $attempts snapshot races under $dir — " +
          "a faster writer keeps moving the touched partitions")
      try return deriveAndLand(spark, dir, source, keyCol, partCol,
        matched, notMatched, at)
      catch { case _: PartitionedTable.ConcurrentWriteException => () }
    }
    -1L // unreachable
  }

  /** Test seam: runs after the target snapshot is pinned and before the
    * landing — a spec injects a concurrent commit here to exercise the
    * re-derive path deterministically. */
  private[operators] var afterSnapshotHook: () => Unit = () => ()

  private def deriveAndLand(
      spark: SparkSession,
      dir: String,
      source: DataFrame,
      keyCol: String,
      partCol: String,
      matched: Seq[Matched],
      notMatched: Option[NotMatched],
      at: String): Long = {
    require(matched.nonEmpty || notMatched.nonEmpty,
      "MergeInto: need at least one WHEN clause")
    matched.flatMap(_.set).foreach { set =>
      require(!set.contains(keyCol) && !set.contains(partCol),
        s"MergeInto: UPDATE SET must not assign the key ($keyCol) or " +
          s"partition ($partCol) column — a partition/key move is a " +
          "DELETE + INSERT, not an update (key identity is (partition, key))")
    }
    val cur = PartitionedTable.latest(spark, dir).getOrElse(
      throw new IllegalArgumentException(
        s"MergeInto: nothing to merge into under $dir"))
    val dataCols = PartitionedTable.read(spark, dir, Some(cur)).schema // footers only
    // target read manifest-pruned to the source's partitions (absent
    // partitions hold nothing to match — their source rows are inserts),
    // PINNED at the snapshot version the landing will verify against
    val srcParts = source.select(partCol).distinct()
      .collect().map(_.getString(0)).toSeq // touched-partition-sized
    val live = PartitionedTable.partitionValues(spark, dir, Some(cur)).toSet
    val liveParts = srcParts.filter(live.contains)
    val target =
      if (liveParts.isEmpty)
        PartitionedTable.read(spark, dir, Some(cur)).filter(lit(false))
      else PartitionedTable.readPartitions(spark, dir, liveParts, Some(cur))
    // matched rows: broadcast-hash INNER join — the table side streams,
    // nothing shuffles (an outer join could not broadcast the small
    // side, so match/no-match splits into inner + anti instead)
    val joined = target.as("tgt")
      .join(broadcast(source.as("src")),
        col(s"tgt.$keyCol") === col(s"src.$keyCol") &&
          col(s"tgt.$partCol") === col(s"src.$partCol"))
    // first-match-wins clause index; -1 = no clause accepts (no-op row)
    val clauseIdx = matched.zipWithIndex.foldRight(lit(-1)) {
      case ((m, i), acc) => when(m.cond.getOrElse(lit(true)), lit(i)).otherwise(acc)
    }
    val opOf = matched.zipWithIndex.foldRight(lit(null).cast("string")) {
      case ((m, i), acc) =>
        when(col("__clause") === i,
          lit(if (m.set.isEmpty) "delete" else "upsert")).otherwise(acc)
    }
    def updValue(c: String): Column = matched.zipWithIndex
      .foldRight(col(s"tgt.`$c`")) { case ((m, i), acc) =>
        m.set.flatMap(_.get(c)) match {
          case Some(v) => when(col("__clause") === i, v).otherwise(acc)
          case None => acc
        }
      }
    val matchedChanges =
      if (matched.isEmpty) None
      else Some(joined.withColumn("__clause", clauseIdx)
        .filter(col("__clause") >= 0)
        .select(dataCols.fields.toSeq.map(f =>
          (if (f.name == keyCol || f.name == partCol) col(s"tgt.`${f.name}`")
           else updValue(f.name)).as(f.name)) :+ opOf.as("op"): _*))
    // not-matched source rows: anti join against the matched keys —
    // both sides batch-sized, broadcast
    val insertChanges = notMatched.map { nm =>
      val matchedKeys = joined.select(
        col(s"src.$keyCol").as(keyCol), col(s"src.$partCol").as(partCol))
      source.as("src")
        .join(broadcast(matchedKeys), Seq(keyCol, partCol), "left_anti")
        .filter(nm.cond.getOrElse(lit(true)))
        .select(dataCols.fields.toSeq.map(f =>
          nm.values.getOrElse(f.name, col(s"src.`${f.name}`")).as(f.name))
          :+ lit("upsert").as("op"): _*)
    }
    val changes = (matchedChanges.toSeq ++ insertChanges.toSeq)
      .reduce(_ unionByName _)
      .localCheckpoint(true) // evaluate ONCE: merge reads it per partition
    afterSnapshotHook()
    if (changes.isEmpty) cur // every clause no-op'd: no forged version
    else PartitionedTable.merge(spark, dir, changes, keyCol, partCol,
      at = if (at.isEmpty) "merge_into" else at, sinceVersion = Some(cur))
  }

  /** Per-JVM scratch root (the ChangeFeed pattern). */
  private lazy val workDir: java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory("graft-merge-into")
    sys.addShutdownHook {
      def del(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(del)); f.delete(): Unit
      }
      del(d.toFile)
    }
    d
  }

  val defs: Seq[QueryDef] = Seq(
    // Predicate-shaped MERGE INTO, hash-gated (DuckDB 1.0 has no native
    // MERGE, so the oracle is the closed-form expansion of the exact
    // clause semantics): commit orders partitioned by status, then one
    // MERGE with the three-clause shape Delta users write —
    //   WHEN MATCHED AND tgt.o_totalprice > 150000
    //     THEN UPDATE SET o_totalprice = tgt.o_totalprice + src bump
    //   WHEN MATCHED THEN DELETE
    //   WHEN NOT MATCHED THEN INSERT *
    // over a source of all ≡3-mod-10 keys (matched: the clause ORDER
    // decides update vs delete per row) plus fresh keys (inserts). The
    // oracle recomputes the final table closed-form, so wrong clause
    // precedence, a lost unreferenced-column value (UPDATE SET must
    // keep tgt values for unnamed columns), a dropped insert, or a
    // no-op row leaking into the changelog breaks the hash.
    // Touched-partition pinning and no-op semantics are spec'd in
    // MergeIntoSpec.
    QueryDef.sql("q103_merge_into",
      """WITH upd AS (
        |  SELECT o_orderstatus, o_totalprice + 50 AS p FROM orders
        |  WHERE o_orderkey % 10 = 3 AND o_totalprice > 150000),
        |kept AS (
        |  SELECT o_orderstatus, o_totalprice AS p FROM orders
        |  WHERE o_orderkey % 10 <> 3),
        |ins AS (
        |  SELECT o_orderstatus, 42.0 AS p FROM orders
        |  WHERE o_orderkey % 10 = 1 AND o_orderstatus = 'O'),
        |fin AS (
        |  SELECT * FROM upd UNION ALL SELECT * FROM kept
        |  UNION ALL SELECT * FROM ins)
        |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
        |       round(sum(p), 2) AS rev
        |FROM fin GROUP BY o_orderstatus""".stripMargin) { (s, dir) =>
      val store = workDir.resolve(
        "q103_" + dir.replaceAll("[^A-Za-z0-9]", "_")).toString
      val hfs = graft.streaming.VersionedStore.fs(s, store)
      hfs.delete(new Path(store), true)
      val orders = Tables.orders(s, dir)
      PartitionedTable.commit(s, store, orders, "o_orderstatus")
      val src = orders.filter(col("o_orderkey") % 10 === 3)
        .withColumn("bump", lit(50.0))
        .unionByName(orders
          .filter(col("o_orderkey") % 10 === 1 &&
            col("o_orderstatus") === "O")
          .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
          .withColumn("o_totalprice", lit(42.0))
          .withColumn("bump", lit(0.0)))
      MergeInto(s, store, src, "o_orderkey", "o_orderstatus",
        matched = Seq(
          updateWhen(col("tgt.o_totalprice") > 150000,
            Map("o_totalprice" -> (col("tgt.o_totalprice") + col("src.bump")))),
          delete),
        notMatched = Some(insertAll))
      PartitionedTable.read(s, store)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_rows"),
          round(sum("o_totalprice"), 2).as("rev"))
    }
  )
}
