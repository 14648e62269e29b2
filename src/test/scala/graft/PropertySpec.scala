package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5.3) on driver-generated data
  * plus scalacheck-generated frames (sampled with fixed seeds — the
  * scalatestplus bridge artifact is not in the offline cache). */
class PropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("top-k per group ranks are exactly 1..k with no gaps") {
    import spark.implicits._
    val topk = ops.Relational.qTopkPergroup(spark, sfDir)
    val bad = topk.groupBy($"o_custkey")
      .agg(max($"rn").as("mx"), count(lit(1)).as("n"))
      .filter($"mx" =!= $"n").count()
    assert(bad == 0)
  }

  test("unionByName cardinality = sum of parts") {
    import spark.implicits._
    val o = graft.util.Tables.orders(spark, sfDir)
    val a = o.filter($"o_orderstatus" === "O")
    val b = o.filter($"o_orderstatus" =!= "O")
    assert(a.unionByName(b).count() == a.count() + b.count())
  }

  test("window rank is a permutation of 1..n within each partition") {
    import spark.implicits._
    val r = ops.Windows.qWinRank(spark, sfDir)
    val bad = r.groupBy($"o_custkey")
      .agg(count(lit(1)).as("n"), max($"rn").as("mx"),
        countDistinct($"rn").as("nd"))
      .filter($"mx" =!= $"n" || $"nd" =!= $"n").count()
    assert(bad == 0)
  }

  test("dedup idempotence on generated data") {
    import spark.implicits._
    samples(Gen.listOfN(50, Gen.chooseNum(0, 10)), 5).foreach { xs =>
      val df = xs.toDF("x")
      val once = df.distinct()
      assert(once.distinct().count() == once.count())
    }
  }

  test("jaccard within [0,1], pairs canonical and unique") {
    import spark.implicits._
    val j = ops.LlmOps.qDedupNgramJaccard(spark, sfDir).collect()
    assert(j.forall { r =>
      val v = r.getAs[Double]("jaccard"); v >= 0.0 && v <= 1.0
    })
    val pairs = j.map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
    assert(pairs.forall { case (a, b) => a < b })
    assert(pairs.distinct.length == pairs.length)
  }

  test("rounding helper is idempotent on generated doubles") {
    import spark.implicits._
    samples(Gen.listOfN(20, Gen.chooseNum(-1e6, 1e6)), 5).foreach { xs =>
      val df = xs.toDF("x")
      val once = df.select(graft.util.Determinism.r4($"x").as("r")).collect()
      val twice = df.select(
        graft.util.Determinism.r4(graft.util.Determinism.r4($"x")).as("r")).collect()
      assert(once.map(_.getDouble(0)).toSeq == twice.map(_.getDouble(0)).toSeq)
    }
  }
}
