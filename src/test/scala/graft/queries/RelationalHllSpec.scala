package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins q08c's deterministic-HLL semantics: the single-pass aggregate
  * must produce the EXACT registers of the exploded md5 derivation it
  * compresses (same 20-bit bucket mod 2^p, same 33 − bitlen rho), the
  * merge must be idempotent under duplication (the defining HLL
  * property), and the raw estimate must land inside the m=256 error
  * band at sf0.001's cardinality (which is why q08c keys on the
  * (partkey, suppkey) PAIR: thousands of distinct keys per group keep
  * every group above the raw formula's ~2.5m validity floor). */
class RelationalHllSpec extends SparkSpec {

  private val P = 8
  private val M = 1 << P

  private def keyed =
    graft.Tables.load(spark, sf, "lineitem")
      .select(concat_ws("_", col("l_partkey"), col("l_suppkey")).as("pk"))

  private def explodedRegisters = {
    // the reference derivation, column-by-column: bucket = first 5 hex
    // digits of md5(key) mod 2^p; rho = 33 - bit_length(next 8 hex
    // digits), via bin() (the oracle replay uses pure-integer bitlen;
    // bin-string length is the same integer for w > 0)
    keyed.distinct()
      .select(
        (conv(substring(md5(col("pk")), 1, 5), 16, 10)
          .cast("long") % M).as("b"),
        conv(substring(md5(col("pk")), 6, 8), 16, 10)
          .cast("long").as("w"))
      .withColumn("rho",
        when(col("w") === 0, lit(33))
          .otherwise(lit(33) - length(bin(col("w")))))
      .groupBy(col("b")).agg(max(col("rho")).as("m_j"))
      .collect().map(r => r.getLong(0).toInt -> r.getInt(1)).toMap
  }

  test("the single-pass HLL aggregate equals the exploded md5 derivation register-for-register") {
    val regs = keyed
      .agg(graft.functions.Hll.hllSketch(col("pk"), P).as("regs"))
      .collect()(0).getSeq[Int](0)
    assert(regs.length == M)
    val expected = explodedRegisters
    (0 until M).foreach { b =>
      assert(regs(b) == expected.getOrElse(b, 0),
        s"register $b diverged: aggregate=${regs(b)} exploded=${expected.getOrElse(b, 0)}")
    }
  }

  test("HLL registers are duplication-invariant: corpus ∪ corpus sketches identically") {
    def sketch(df: org.apache.spark.sql.DataFrame) =
      df.agg(graft.functions.Hll.hllSketch(col("pk"), P))
        .collect()(0).getSeq[Int](0)
    val k = keyed
    assert(sketch(k) == sketch(k.union(k)),
      "max-merge must make duplicates free")
  }

  test("q08c: estimate within the m=256 error band, integer columns consistent") {
    val df = Relational.queries("q08c_hll_distinct")(spark, sf).cache()
    // every group must sit above the raw formula's validity floor —
    // the whole reason q08c keys on pairs
    assert(df.filter(col("n_exact") <= 2.5 * M).count() == 0,
      "a group fell into the small-range regime the raw formula is biased in")
    // reg_sum bounded by m * 2^33
    assert(df.filter(col("reg_sum") > expr(s"CAST($M AS BIGINT) * CAST(8589934592 AS BIGINT)"))
      .count() == 0)
    // raw-formula HLL, m=256: standard error 1.04/16 ≈ 6.5%; 20% is
    // the loose structural gate (sf0.001 measured ~4%, sf0.01 ~2%)
    assert(df.filter(abs(col("rel_err")) > 0.20).count() == 0,
      df.select("l_returnflag", "n_exact", "hll_estimate", "rel_err")
        .collect().mkString(", "))
    df.unpersist()
  }

  test("q08d set algebra: union registers dominate, estimates track exact overlap") {
    val df = Relational.queries("q08d_hll_overlap")(spark, sf).cache()
    assert(df.count() == 3, "three flag pairs")
    // register-wise max can only RAISE registers, so the union's
    // register sum (Σ 2^(33−M_j)) can only SHRINK: the structural
    // invariant of max-merge, independent of data
    assert(df.filter(col("reg_sum_union") >
      least(col("reg_sum_a"), col("reg_sum_b"))).count() == 0,
      "union register sum exceeded a constituent's — max-merge broken")
    // inclusion–exclusion stacks three raw estimates, so the band is
    // looser than q08c's single-sketch 20%; sf0.001 measures ≤ 12.5%
    assert(df.filter(abs(col("rel_err")) > 0.35).count() == 0,
      df.select("flag_a", "flag_b", "est_intersect", "n_exact_intersect", "rel_err")
        .collect().mkString(", "))
    df.unpersist()
  }

  test("q08e sliding windows: one window per 3-consecutive-month run, tracks exact at sf0.01") {
    // structural shape at the spec SF: every valid window = a month
    // with both followers present; months are contiguous here, so
    // windows = months - 2, and reg_sum stays within the m * 2^33 cap
    val df = Relational.queries("q08e_hll_sliding")(spark, sf).cache()
    val nMonths = graft.Tables.load(spark, sf, "lineitem")
      .select(trunc(col("l_shipdate"), "month")).distinct().count()
    assert(df.count() == nMonths - 2,
      s"expected ${nMonths - 2} windows, got ${df.count()}")
    assert(df.filter(col("reg_sum_union") >
      expr(s"CAST($M AS BIGINT) * CAST(8589934592 AS BIGINT)")).count() == 0)
    df.unpersist()
    // the accuracy claim needs windows above the raw formula's ~2.5m
    // floor — sf0.01 (~2000 distinct pairs per window; sf0.001's ~200
    // sits in the documented small-range-bias regime)
    val sf01 = "/root/testdata/sf0.01"
    val acc = Relational.queries("q08e_hll_sliding")(spark, sf01).cache()
    assert(acc.filter(col("n_exact") <= 2.5 * M).count() == 0,
      "a window fell below the raw-formula validity floor at sf0.01")
    assert(acc.filter(abs(col("rel_err")) > 0.25).count() == 0,
      acc.orderBy(abs(col("rel_err")).desc)
        .select("w_start", "n_exact", "est_union", "rel_err")
        .limit(3).collect().mkString(", "))
    acc.unpersist()
  }

  test("pair algebra runs DISTRIBUTED at 1024 sketch groups — no driver loop, exact vs reference") {
    // the operator's own 100 TB pitch: n per-source sketches answer all
    // n²/2 overlap questions. At n = 1024 (the high-cardinality regime
    // a driver-side pair loop would choke on first), the algebra must
    // (a) run inside the plan — the old collect-based shape re-entered
    // as a LocalTableScan of driver-built rows; the distributed one is
    // a broadcast nested-loop self-join — and (b) produce exactly the
    // driver-computed register arithmetic on a sampled slice.
    import graft.functions.Hll
    val sk = graft.Tables.load(spark, sf, "lineitem")
      .withColumn("pk", concat_ws("_", col("l_partkey"), col("l_suppkey")))
      .groupBy(pmod(xxhash64(col("l_orderkey"), col("l_linenumber")),
        lit(1024)).cast("int").as("g"))
      .agg(Hll.hllSketch(col("pk"), P).as("regs"))
    val nGroups = sk.count()
    assert(nGroups >= 1000, s"want >= 1000 sketch groups, got $nGroups")
    val pairs = Hll.pairUnions(sk, "g", "regs")
    val planStr = pairs.queryExecution.executedPlan.toString
    assert(planStr.contains("BroadcastNestedLoopJoin"),
      s"pair algebra lost its in-plan self-join:\n$planStr")
    assert(!planStr.contains("LocalTableScan"),
      "pair algebra re-entered the plan as driver-built rows")
    assert(pairs.count() == nGroups * (nGroups - 1) / 2,
      "every unordered pair exactly once")
    // reference arithmetic on a bounded slice: all pairs among the
    // first 24 groups, driver-computed from the collected sketches
    val byKey = sk.filter(col("g") < 24).collect()
      .map(r => r.getInt(0) -> r.getSeq[Int](1).toArray).toMap
    val got = pairs.filter(col("key_a") < 24 && col("key_b") < 24)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.size == 24 * 23 / 2)
    got.foreach { case ((ka, kb), (sa, sb, su)) =>
      val (ra, rb) = (byKey(ka), byKey(kb))
      assert(sa == Hll.regSum(ra.toSeq) && sb == Hll.regSum(rb.toSeq),
        s"per-key sums diverged for ($ka, $kb)")
      val u = ra.indices.map(i => math.max(ra(i), rb(i)))
      assert(su == Hll.regSum(u), s"union sum diverged for ($ka, $kb)")
    }
  }

  test("slidingUnion is W-generic: W in {2, 4} equals the driver reference") {
    import graft.functions.Hll
    val sk = graft.Tables.load(spark, sf, "lineitem")
      .withColumn("m", trunc(col("l_shipdate"), "month"))
      .withColumn("pk", concat_ws("_", col("l_partkey"), col("l_suppkey")))
      .groupBy(col("m")).agg(Hll.hllSketch(col("pk"), P).as("regs"))
    val byMonth = sk.collect()
      .map(r => r.getDate(0).toLocalDate -> r.getSeq[Int](1).toArray)
      .sortBy(_._1.toString)
    val idx = byMonth.map(_._1).zipWithIndex.toMap
    for (w <- Seq(2, 4)) {
      val expected = byMonth.flatMap { case (m0, _) =>
        val members = (0 until w).map(k => idx.get(m0.plusMonths(k.toLong)))
        if (members.forall(_.isDefined)) {
          val regs = members.flatten.map(byMonth(_)._2)
          val u = regs.head.indices.map(i => regs.map(_(i)).max)
          Some(m0.toString -> Hll.regSum(u))
        } else None
      }.toMap
      val got = Hll.slidingUnion(sk, "m", "regs", w).collect()
        .map(r => r.getDate(0).toLocalDate.toString -> r.getLong(1)).toMap
      assert(got == expected, s"W=$w window algebra diverged from reference")
    }
  }

  test("q08c plan: ONE hll_sketch aggregate over lineitem — constant-size shuffle") {
    val plan = Relational.queries("q08c_hll_distinct")(spark, sf)
      .queryExecution.sparkPlan
    assert(plan.toString.contains("hll_sketch"),
      s"q08c lost the single-pass sketch aggregate:\n$plan")
  }
}
