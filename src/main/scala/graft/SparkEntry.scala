package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 (plus the north-star dedup /
  * similarity / text-analysis / multimodal operators) registers here as a
  * named query with, where SQL-expressible, a DuckDB oracle over the same
  * parquet tables. Column names are aligned between the two forms (the
  * driver sorts columns by name before hashing).
  */
object SparkEntry {

  private def all: Seq[QueryDef] =
    operators.Relational.defs ++
      operators.Dedup.defs ++
      operators.Similarity.defs ++
      operators.GraphRank.defs ++
      operators.Bpe.defs ++
      operators.TextAnalysis.defs ++
      operators.Multimodal.defs ++
      operators.SourceProbes.defs ++
      operators.Pca.defs ++
      operators.VersionedTable.defs ++
      operators.PartitionedTable.defs ++
      streaming.ChangeFeed.defs ++
      streaming.IndexFeed.defs ++
      operators.Unigram.defs ++
      operators.MergeInto.defs ++
      sources.GraftCatalog.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q11_star_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Each invocation
    * tunes the (driver-built) session for parity semantics first. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> { (s: SparkSession, dir: String) =>
      Sessions.tune(s); q.fn(s, dir)
    }).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
