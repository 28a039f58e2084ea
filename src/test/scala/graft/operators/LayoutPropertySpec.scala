package graft.operators

import graft.SparkSpec
import graft.plans.QuantileBucketSearch
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the layout/clustering primitives: the invariants
  * that make Z-ordering and quantile binning trustworthy are algebraic,
  * so they get generated inputs, not hand-picked cases. */
class LayoutPropertySpec extends SparkSpec {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("zvalue is injective on in-range pairs (property)") {
    // interleave must lose nothing: distinct (a, b) pairs in [0, 2^bits)
    // map to distinct z-values — a collision would merge unrelated grid
    // cells and silently weaken every pruning claim built on it
    val bits = 12
    val pair = for {
      a <- Gen.choose(0L, (1L << bits) - 1)
      b <- Gen.choose(0L, (1L << bits) - 1)
    } yield (a, b)
    check(Prop.forAll(Gen.listOfN(200, pair)) { ps =>
      val distinctPairs = ps.distinct
      import spark.implicits._
      val zs = distinctPairs.toDF("a", "b")
        .select(ZOrder.zvalue(col("a"), col("b"), bits).as("z"))
        .collect().map(_.getLong(0))
      zs.distinct.length == distinctPairs.length
    })
  }

  test("zvalue interleave decodes back to its inputs (property)") {
    // de-interleaving even/odd bits recovers (a, b) exactly
    val bits = 12
    def decode(z: Long): (Long, Long) = {
      var (a, b) = (0L, 0L)
      for (i <- 0 until bits) {
        a |= ((z >> (2 * i)) & 1L) << i
        b |= ((z >> (2 * i + 1)) & 1L) << i
      }
      (a, b)
    }
    val pair = for {
      a <- Gen.choose(0L, (1L << bits) - 1)
      b <- Gen.choose(0L, (1L << bits) - 1)
    } yield (a, b)
    check(Prop.forAll(Gen.listOfN(100, pair)) { ps =>
      import spark.implicits._
      val rows = ps.toDF("a", "b")
        .select(col("a"), col("b"), ZOrder.zvalue(col("a"), col("b"), bits).as("z"))
        .collect()
      rows.forall(r => decode(r.getLong(2)) == ((r.getLong(0), r.getLong(1))))
    })
  }

  test("QuantileBucket is monotone and bounded on random edges/values (property)") {
    val gen = for {
      edges <- Gen.listOfN(31, Gen.choose(-1e6, 1e6)).map(_.sorted.toIndexedSeq)
      vals <- Gen.listOfN(100, Gen.choose(-2e6, 2e6))
    } yield (edges, vals)
    check(Prop.forAll(gen) { case (edges, vals) =>
      val arr = edges.toArray
      val bs = vals.map(v => v -> QuantileBucketSearch.bucket(arr, v))
      // bounded in [0, k], and monotone: v1 <= v2 => bucket(v1) <= bucket(v2)
      val bounded = bs.forall { case (_, b) => b >= 0 && b <= edges.length }
      val sortedByV = bs.sortBy(_._1).map(_._2)
      val monotone = sortedByV.zip(sortedByV.tail).forall { case (x, y) => x <= y }
      // agreement with the naive linear count for non-edge values (ties
      // among duplicate edges may legally land on any duplicate index)
      val agrees = bs.filterNot { case (v, _) => arr.contains(v) }.forall {
        case (v, b) => b == arr.count(_ <= v)
      }
      bounded && monotone && agrees
    })
  }

  test("t12 packing invariants on the fixture: totals conserved, packs contiguous") {
    val df = graft.SparkEntry.queries("t12_pack_sequences")(spark, "/root/testdata/sf0.001")
      .collect()
    // conservation: pack totals sum to the corpus token count
    val packed = df.map(_.getLong(3)).sum
    val direct = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(sum(size(graft.functions.Exprs.tokens(col("text")))).cast("long"))
      .head().getLong(0)
    assert(packed === direct)
    // per shard: pack ids start at 0 and are gap-free (a gap would mean a
    // pack boundary computed from a non-running sum)
    df.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val ids = rows.map(_.getLong(1)).sorted
      assert(ids.sameElements(ids.indices.map(_.toLong)),
        s"pack ids not contiguous: ${ids.mkString(",")}")
    }
  }
}
