package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins q19d's histogram-sketch semantics: the single-pass aggregate
  * must produce the EXACT bin counts of the groupBy-floor-division
  * derivation it compresses, merge must be additive across partitions
  * (counts sum — the mergeability that makes the shuffle constant
  * size), out-of-range values must clamp into the edge bins (the
  * sketch never drops rows), and the rank answer must bracket the
  * exact percentile within one binWidth.
  */
class HistSpec extends SparkSpec {

  private val Lo = 0L
  private val W = 16384L
  private val NB = 1024

  private def cents =
    graft.Tables.load(spark, sf, "lineitem")
      .select((col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long").as("cents"))

  test("the single-pass aggregate equals the groupBy-bin derivation bin-for-bin") {
    val bins = cents
      .agg(Hist.histSketch(col("cents"), Lo, W, NB).as("bins"))
      .collect()(0).getSeq[Long](0)
    assert(bins.length == NB)
    val expected = cents
      .groupBy(expr(s"CAST(least(cents div $W, ${NB - 1}) AS INT)").as("b"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    (0 until NB).foreach { b =>
      assert(bins(b) == expected.getOrElse(b, 0L),
        s"bin $b diverged: aggregate=${bins(b)} groupBy=${expected.getOrElse(b, 0L)}")
    }
    assert(bins.sum == cents.count(), "histogram must count every row")
  }

  test("merge is additive: corpus ∪ corpus doubles every bin") {
    def sketch(df: org.apache.spark.sql.DataFrame) =
      df.agg(Hist.histSketch(col("cents"), Lo, W, NB))
        .collect()(0).getSeq[Long](0)
    val once = sketch(cents)
    val twice = sketch(cents.union(cents))
    assert(twice == once.map(_ * 2L),
      "bin counts must sum across merged partials")
  }

  test("out-of-range values clamp into the edge bins — nothing is dropped") {
    import spark.implicits._
    val bins = Seq(-5L, -1L, 0L, 9L, 10L, 99L, 100L, 12345L)
      .toDF("x")
      .agg(Hist.histSketch(col("x"), lo = 0L, binWidth = 10L, nBins = 10))
      .collect()(0).getSeq[Long](0)
    assert(bins(0) == 4L, "-5 and -1 clamp below lo; 0 and 9 land in bin 0")
    assert(bins(1) == 1L, "10 is bin 1's lower edge")
    assert(bins(9) == 3L, "99 lands in the last bin; 100 and 12345 clamp into it")
    assert(bins.sum == 8L, "the sketch never drops rows")
  }

  test("SQL facade: hist_sketch(x, lo, w, n) equals the DataFrame form") {
    val viaSql = graft.GraftSql.sql(spark, sf,
      s"""SELECT hist_sketch(
         |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT),
         |  0, 16384, 1024) AS bins FROM lineitem""".stripMargin)
      .collect()(0).getSeq[Long](0)
    val viaDf = cents
      .agg(Hist.histSketch(col("cents"), Lo, W, NB))
      .collect()(0).getSeq[Long](0)
    assert(viaSql == viaDf)
  }

  test("q19d: each reported lower edge brackets the exact percentile within one binWidth") {
    val got = graft.queries.Extras.queries("q19d_hist_percentiles")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val exact = graft.Tables.load(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sort_array(collect_list((col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("long"))).as("xs"))
      .collect().map { r =>
        val xs = r.getSeq[Long](2)
        def rank(p: Int) = xs(((xs.length - 1) * p / 100 + 1) - 1)
        r.getString(0) -> (rank(50), rank(90), rank(99))
      }.toMap
    got.foreach { case (flag, (p50, p90, p99)) =>
      val (e50, e90, e99) = exact(flag)
      Seq((p50, e50), (p90, e90), (p99, e99)).foreach { case (lo, ev) =>
        assert(lo <= ev && ev < lo + W,
          s"$flag: exact $ev outside [$lo, ${lo + W})")
      }
    }
  }
}
