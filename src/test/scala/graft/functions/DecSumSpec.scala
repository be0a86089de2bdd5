package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{Decimal, DecimalType}

/** DecSum128 (round 16) must be BIT-IDENTICAL to stock Sum(decimal) —
  * same values, same result type, same null/overflow contracts — on
  * every input shape the Num helpers feed it. */
class DecSumSpec extends SparkSpec {
  import spark.implicits._

  private def decSum(c: Column): Column = GraftBridge.toColumn(
    DecSum128(GraftBridge.toExpression(c)).toAggregateExpression())

  test("matches stock Sum on random multi-partition money data incl. nulls") {
    val rnd = new scala.util.Random(7)
    val rows: Seq[(Int, java.lang.Double)] = (1 to 5000).map { i =>
      val v: java.lang.Double =
        if (rnd.nextInt(20) == 0) null
        else (rnd.nextLong() % 10000000L) / 100.0
      (i % 37, v)
    }
    val df = rows.toDF("k", "v").repartition(7)
    for (t <- Seq("decimal(18,2)", "decimal(15,4)", "decimal(17,6)")) {
      val mine = df.groupBy($"k").agg(decSum($"v".cast(t)).as("s"))
      val stock = df.groupBy($"k").agg(sum($"v".cast(t)).as("s"))
      assert(mine.schema("s").dataType === stock.schema("s").dataType,
        s"result type drift for input $t")
      val m = mine.collect().map(r => r.getInt(0) -> r.get(1)).toMap
      val s = stock.collect().map(r => r.getInt(0) -> r.get(1)).toMap
      assert(m === s, s"value drift for input $t")
    }
  }

  test("all-null and single-row groups match stock Sum") {
    val df = Seq((1, null: java.lang.Double), (1, null: java.lang.Double),
      (2, java.lang.Double.valueOf(3.21))).toDF("k", "v")
    val mine = df.groupBy($"k").agg(decSum($"v".cast("decimal(18,2)")).as("s"))
      .collect().map(r => r.getInt(0) -> r.get(1)).toMap
    val stock = df.groupBy($"k").agg(sum($"v".cast("decimal(18,2)")).as("s"))
      .collect().map(r => r.getInt(0) -> r.get(1)).toMap
    assert(mine === stock)
    assert(mine(1) == null)
  }

  test("low-limb carry crossing: sums past 2^63 unscaled stay exact") {
    // 40 values of ~9e17 unscaled (scale 0) sum to ~3.6e19 > 2^63 —
    // the accumulator must carry into the high limb; stock Sum's
    // BigDecimal path is the reference
    val big = (1 to 40).map(i => 900000000000000000L - i).toDF("u")
      .select($"u".cast("decimal(18,0)").as("v")).repartition(5)
    val mine = big.agg(decSum($"v")).collect()(0).get(0)
    val stock = big.agg(sum($"v")).collect()(0).get(0)
    assert(mine === stock)
    // and the negative mirror (borrow path)
    val neg = (1 to 40).map(i => -900000000000000000L + i).toDF("u")
      .select($"u".cast("decimal(18,0)").as("v")).repartition(5)
    assert(neg.agg(decSum($"v")).collect()(0).get(0) ===
      neg.agg(sum($"v")).collect()(0).get(0))
  }

  test("finisher overflow contract: null when ANSI off, throw when on") {
    // decimal(28,0): bound is 10^28; hi=10^10 * 2^64 is ~1.8e29 — over
    val hi = 10000000000L
    assert(Dec128.toDecimal(hi, 0L, 28, 0, ansi = false) == null)
    intercept[ArithmeticException] {
      Dec128.toDecimal(hi, 0L, 28, 0, ansi = true)
    }
    // in-range 128-bit value converts exactly: 2^64 = 18446744073709551616
    val d = Dec128.toDecimal(1L, 0L, 28, 0, ansi = true)
    assert(d.toString == "18446744073709551616")
    // negative high limb: -2^64
    val n = Dec128.toDecimal(-1L, 0L, 28, 0, ansi = true)
    assert(n.toString == "-18446744073709551616")
    // compact fast path keeps the scale
    assert(Dec128.toDecimal(0L, 12345L, 28, 2, ansi = true).toString == "123.45")
    assert(Dec128.toDecimal(-1L, -12345L, 28, 2, ansi = true).toString == "-123.45")
  }

  test("Num helpers (DecSum128-backed) equal their stock-Sum formulations") {
    val rnd = new scala.util.Random(11)
    val df = (1 to 3000).map { i =>
      (i % 11, rnd.nextInt(2000000) / 100.0, rnd.nextInt(100) / 100.0)
    }.toDF("k", "money", "rate").repartition(6)
    val D2 = DecimalType(18, 2)
    val mine = df.groupBy($"k").agg(
      Num.dsum($"money").as("a"),
      Num.dsum2($"money", lit(1.0) - $"rate").as("b"),
      Num.dsum24($"money", ($"rate" * $"rate")).as("c"),
      Num.dsum6($"rate").as("d"),
      Num.davg($"money").as("e"))
    val stock = df.groupBy($"k").agg(
      sum($"money".cast(D2)).cast("double").as("a"),
      sum($"money".cast(DecimalType(10, 2)) *
        (lit(1.0) - $"rate").cast(DecimalType(4, 2))).cast("double").as("b"),
      sum($"money".cast(DecimalType(10, 2)) *
        ($"rate" * $"rate").cast(DecimalType(6, 4))).cast("double").as("c"),
      sum($"rate".cast(DecimalType(18, 6))).cast("double").as("d"),
      (sum($"money".cast(D2)).cast("double") / count(lit(1))).as("e"))
    val m = mine.collect().map(r => r.getInt(0) -> r.toSeq.drop(1)).toMap
    val s = stock.collect().map(r => r.getInt(0) -> r.toSeq.drop(1)).toMap
    assert(m === s)
  }
}
