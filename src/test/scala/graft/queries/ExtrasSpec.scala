package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExtrasSpec extends SparkSpec {

  test("q19b approx percentiles within 10% of exact q19") {
    val exact = Extras.queries("q19_quantity_percentiles")(spark, sf)
      .select(col("l_returnflag"), col("p50"), col("p90")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = Extras.queries("q19b_approx_percentiles")(spark, sf)
      .select(col("l_returnflag"), col("p50_approx"), col("p90_approx")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    exact.foreach { case (k, (p50, p90)) =>
      val (a50, a90) = approx(k)
      assert(math.abs(a50 - p50) / p50 <= 0.10, s"$k p50: $a50 vs $p50")
      assert(math.abs(a90 - p90) / p90 <= 0.10, s"$k p90: $a90 vs $p90")
    }
  }

  test("q19c sampled percentiles: ~2% deterministic sample, tracks exact at sf0.01") {
    // accuracy band is a sampling-theory claim, so it needs a sample
    // big enough to have one: sf0.01 (~400 rows per group). sf0.001's
    // ~30-row groups are structurally valid but statistically noisy.
    val sf01 = "/root/testdata/sf0.01"
    val rows = Extras.queries("q19c_sampled_percentiles")(spark, sf01).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // sample fraction: 1311/65536 ≈ 2% of each group
    graft.Tables.load(spark, sf01, "lineitem")
      .groupBy(col("l_returnflag")).count().collect().foreach { r =>
        val frac = rows(r.getString(0))._1.toDouble / r.getLong(1)
        assert(frac > 0.01 && frac < 0.04, s"${r.getString(0)}: fraction $frac")
      }
    // rank selection is monotone by construction
    rows.foreach { case (k, (_, p50, p90, p99)) =>
      assert(p50 <= p90 && p90 <= p99, s"$k: $p50/$p90/$p99 not monotone")
    }
    // a hash sample is uniform: sampled quantiles track the population
    val exact = Extras.queries("q19_quantity_percentiles")(spark, sf01)
      .select(col("l_returnflag"), col("p50"), col("p90")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    exact.foreach { case (k, (p50, p90)) =>
      val (_, s50, s90, _) = rows(k)
      assert(math.abs(s50 - p50) / p50 <= 0.15, s"$k p50_s: $s50 vs $p50")
      assert(math.abs(s90 - p90) / p90 <= 0.15, s"$k p90_s: $s90 vs $p90")
    }
    // determinism: a second evaluation picks the identical sample and
    // the identical elements
    val again = Extras.queries("q19c_sampled_percentiles")(spark, sf01).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(again == rows)
  }

  test("q19c plan: the sample filter runs below the exchange (map-side 2% sliver)") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: walk(q.plan)
      case _ => p +: p.children.flatMap(walk)
    }
    val df = Extras.queries("q19c_sampled_percentiles")(spark, sf)
    df.collect() // finalize the adaptive plan
    val nodes = walk(df.queryExecution.executedPlan)
    // find the exchange; a Filter must appear beneath it (the sample
    // predicate), so only the sliver shuffles to the per-group sort
    val ex = nodes.collectFirst {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(ex.isDefined, s"q19c lost its shuffle?\n${df.queryExecution.executedPlan}")
    val filterBelow = walk(ex.get).collectFirst {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }
    assert(filterBelow.isDefined,
      "the sample filter is not below the exchange — the full corpus would " +
        s"shuffle:\n${df.queryExecution.executedPlan}")
  }

  test("q31 OLS: statistics match a driver-side reference and the line fits the means") {
    val r = Extras.queries("q31_ols_trend")(spark, sf).collect()(0)
    // independent reference: recompute the monthly table and the
    // closed form with plain Scala BigInts
    val monthly = graft.Tables.load(spark, sf, "orders")
      .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate"))
        - lit(24000)).as("x"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).as("y"))
      .collect().map(row => (row.getInt(0).toLong, row.getLong(1)))
    val n = monthly.length.toLong
    val (sx, sy) = (monthly.map(_._1).sum, monthly.map(_._2).sum)
    val sxy = monthly.map { case (x, y) => x * y }.sum
    val sxx = monthly.map { case (x, _) => x * x }.sum
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((n, sx, sy, sxy, sxx)))
    val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    assert(r.getDouble(5) == slope)
    // the fitted line passes through the centroid (ȳ = slope·x̄ + b)
    val b = r.getDouble(6)
    val (xbar, ybar) = (sx.toDouble / n, sy.toDouble / n)
    assert(math.abs(slope * xbar + b - ybar) < 1e-6 * math.abs(ybar))
  }

  test("q30 merge: deletes vanish, updates overwrite, inserts append, kept pass through") {
    val o = graft.Tables.load(spark, sf, "orders")
    val merged = Extras.queries("q30_merge_upsert")(spark, sf).cache()
    def nWithMod(m: Int) = o.filter(col("o_orderkey") % 10 === m).count()
    // cardinality: all orders minus the deleted tier (mod 7 rows were in
    // the base; mod 9 rows arrive via the insert branch)
    assert(merged.count() == o.count() - nWithMod(7))
    assert(merged.filter(col("o_orderkey") % 10 === 7).count() == 0,
      "deleted keys must not survive the merge")
    assert(merged.filter(col("src") === "inserted").count() == nWithMod(9))
    assert(merged.filter(col("src") === "updated").count() == nWithMod(3))
    // every updated row carries the feed's values: status X, price +1000
    val probe = o.filter(col("o_orderkey") % 10 === 3)
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val upd = merged.filter(col("src") === "updated")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .collect()
    upd.foreach { r =>
      assert(r.getString(1) == "X")
      assert(r.getDouble(2) == probe(r.getLong(0)) + 1000.0)
    }
    // no full-outer: the plan must not sort-merge the whole base —
    // the update/delete side joins as a broadcast (feed ≪ base)
    val plan = merged.queryExecution.executedPlan.toString
    assert(!plan.contains("FullOuter"), s"merge degenerated to full outer:\n$plan")
    merged.unpersist()
  }

  test("q32 SCD-2: contiguous versions, one open interval, chained " +
    "validity, no no-op versions, point-in-time lookups replay the log") {
    import java.time.LocalDateTime
    val hist = Extras.queries("q32_scd2_history")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getAs[LocalDateTime](3),
        if (r.isNullAt(4)) null else r.getAs[LocalDateTime](4),
        r.getBoolean(5)))
      .groupBy(_._1).map { case (c, vs) => c -> vs.sortBy(_._2).toSeq }

    hist.foreach { case (c, vs) =>
      // versions are 1..n with exactly one open (current) interval,
      // and it is the last one
      assert(vs.map(_._2).toSeq == (1 to vs.length), s"customer $c versions")
      assert(vs.count(_._5 == null) == 1 && vs.last._5 == null, s"customer $c open")
      assert(vs.count(_._6) == 1 && vs.last._6, s"customer $c is_current")
      // intervals chain: v.valid_to == (v+1).valid_from, never reordered
      vs.sliding(2).filter(_.length == 2).foreach { case Seq(a, b) =>
        assert(a._5 == b._4, s"customer $c: gap between v${a._2} and v${b._2}")
        assert(!a._4.isAfter(b._4), s"customer $c: time went backwards")
        // SCD-2 stores CHANGES: consecutive versions never repeat a status
        assert(a._3 != b._3, s"customer $c: no-op version v${b._2}")
      }
    }

    // point-in-time reconstruction: for every customer, the version
    // covering time t must carry the status of the last change event
    // <= t in the raw log's (date, orderkey) order — replayed here
    // with an independent driver-side scan of orders
    val log = graft.Tables.load(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        col("o_orderstatus")).collect()
      .map(r => (r.getLong(0), r.getAs[LocalDateTime](1), r.getLong(2),
        r.getString(3)))
      .groupBy(_._1).map { case (c, es) =>
        c -> es.sortBy(e =>
          (java.sql.Timestamp.valueOf(e._2).getTime, e._3)).toSeq
      }
    val t = LocalDateTime.parse("1998-06-15T00:00:00")
    log.foreach { case (c, es) =>
      val expected = es.takeWhile(!_._2.isAfter(t)).foldLeft(null: String) {
        case (st, e) => if (e._4 != st) e._4 else st
      }
      val covering = hist(c).find(v =>
        !v._4.isAfter(t) && (v._5 == null || v._5.isAfter(t)))
      assert(covering.map(_._3).orNull == expected,
        s"customer $c at $t: ${covering.map(_._3)} vs $expected")
    }
  }
}
