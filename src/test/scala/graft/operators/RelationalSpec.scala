package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q32 approx_count_distinct stays within 5% of the exact count") {
    val approx = graft.SparkEntry.queries("q32_approx_distinct")(spark, dir)
      .collect().map(r => r.getAs[String]("o_orderpriority") -> r.getAs[Long]("approx_cust")).toMap
    val exact = Tables.orders(spark, dir).groupBy("o_orderpriority")
      .agg(countDistinct("o_custkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n) <= math.max(1L, (n * 0.05).toLong),
        s"priority $k: approx $a vs exact $n")
    }
  }

  test("flagship entry returns rows on the smoke fixture") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }
}
