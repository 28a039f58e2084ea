package graft
/** One-off audit: counts expensive-expression occurrences (md5, aggregate
  * HOF, levenshtein, conv) in each query's executed plan — a sudden high
  * count flags alias re-inlining (predicate pushdown substituting an
  * encoder/signature expression into a Filter, the m10 bug class). */
object ExprDupAudit {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("4", "expr-dup-audit")
    val dir = "/root/testdata/sf0.001"
    val pats = Seq("md5", "aggregate(", "levenshtein", "transform(")
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val p = fn(spark, dir).queryExecution.executedPlan.toString
        Some(name -> pats.map(x =>
          x -> java.util.regex.Pattern.quote(x).r.findAllIn(p).size).filter(_._2 > 0))
      } catch { case scala.util.control.NonFatal(_) => None }
    }
    rows.sortBy(-_._2.map(_._2).sum).take(25).foreach { case (n, cs) =>
      println(f"$n%-28s ${cs.map { case (k, v) => s"$k=$v" }.mkString(" ")}")
    }
    spark.stop()
  }
}
