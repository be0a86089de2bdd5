package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck properties for the oracle-exact aggregation helpers:
  * dsum must equal an exact BigDecimal model regardless of data or
  * partitioning (the invariant the whole oracle gate rests on). */
class NumPropertySpec extends SparkSpec {
  import spark.implicits._

  private val moneyGen: Gen[List[Double]] =
    Gen.listOfN(60, Gen.chooseNum(-99999L, 999999L).map(_ / 100.0))

  private def run(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("dsum equals the exact BigDecimal sum for arbitrary 2-decimal data") {
    run(Prop.forAllNoShrink(moneyGen) { xs =>
      val expected = xs.map(BigDecimal(_)).sum.toDouble
      val got = xs.toDF("v").repartition(5)
        .agg(Num.dsum(col("v"))).as[Double].collect()(0)
      got == expected
    })
  }

  test("dsum2 equals the exact BigDecimal product-sum") {
    val pairGen = Gen.listOfN(40,
      Gen.zip(Gen.chooseNum(0L, 999999L).map(_ / 100.0),
        Gen.chooseNum(0L, 100L).map(_ / 100.0)))
    run(Prop.forAllNoShrink(pairGen) { ps =>
      val expected = ps.map { case (a, b) => BigDecimal(a) * BigDecimal(b) }
        .sum.toDouble
      val got = ps.toDF("a", "b").repartition(4)
        .agg(Num.dsum2(col("a"), col("b"))).as[Double].collect()(0)
      got == expected
    })
  }

  test("dsum is invariant under repartitioning (order independence)") {
    run(Prop.forAllNoShrink(moneyGen) { xs =>
      val df = xs.toDF("v")
      val a = df.repartition(1).agg(Num.dsum(col("v"))).as[Double].collect()(0)
      val b = df.repartition(7).agg(Num.dsum(col("v"))).as[Double].collect()(0)
      a == b
    })
  }

  test("two-phase (partial → finish) equals one-phase dsum2 bit-exactly") {
    // the invariant the q07/q16 pre-agg-then-rollup rewrite rests on:
    // decimal partials re-aggregate to the same exact rational
    val pairGen = Gen.listOfN(40,
      Gen.zip(Gen.chooseNum(0L, 9L), // group key
        Gen.zip(Gen.chooseNum(0L, 999999L).map(_ / 100.0),
          Gen.chooseNum(0L, 100L).map(_ / 100.0))))
    run(Prop.forAllNoShrink(pairGen) { rows =>
      val df = rows.map { case (g, (a, b)) => (g, a, b) }.toDF("g", "a", "b")
        .repartition(4)
      val onePhase = df.agg(Num.dsum2(col("a"), col("b"))).as[Double].collect()(0)
      val twoPhase = df.groupBy(col("g"))
        .agg(Num.dsum2Partial(col("a"), col("b")).as("p"))
        .agg(Num.finishDouble(col("p"))).as[Double].collect()(0)
      java.lang.Double.doubleToLongBits(onePhase) ==
        java.lang.Double.doubleToLongBits(twoPhase)
    })
  }
}
