package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew mitigation for joins whose key distribution AQE can't
  * save (e.g. one session key owning 20% of a 100 TB fact table, where
  * even a split shuffle partition lands on few cores).
  *
  * Salting: the big side gets a uniform salt in [0, salt); the small side
  * is replicated `salt` times, once per salt value. The join key becomes
  * (key, salt), so a single hot key fans out over `salt` reducers. Row
  * multiplicity is unchanged — each big row matches exactly the one
  * replica carrying its salt.
  *
  * Prefer AQE's skew-join splitting when it applies (sort-merge joins,
  * moderate skew); reach for salting when the hot key is extreme or the
  * join is hash-partitioned by an aggregation downstream. */
object Skew {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    // big side: deterministic-enough uniform salt derived from the row id;
    // any distribution works for correctness, uniform works for balance
    val bigS = big.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salt)))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }
}
