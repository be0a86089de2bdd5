package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private val offset = 1000000L

  test("dd01 exact groups: every group has exactly 2 copies and keeps the original id") {
    val df = Dedup.queries("dd01_exact_groups")(spark, sf)
    val bad = df.filter(col("n_copies") =!= 2 || col("keep_id") >= offset).count()
    assert(bad == 0)
  }

  test("dd02 keep-first returns exactly the original doc_ids") {
    val kept = Dedup.queries("dd02_dedup_keep_first")(spark, sf)
    assert(kept.filter(col("doc_id") >= offset).count() == 0)
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(kept.count() == nDocs)
  }

  test("dd03 MinHash-LSH recovers most planted near-dup pairs") {
    val pairs = Dedup.queries("dd03_minhash_lsh")(spark, sf)
      .filter(col("b") === col("a") + offset)
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    val recall = pairs.count().toDouble / nDocs
    assert(recall >= 0.8, s"LSH recall $recall below 0.8")
  }

  test("dd10 semantic dedup drops every planted duplicate vector and keeps all originals") {
    val survivors = Dedup.queries("dd10_semantic_dedup")(spark, sf).cache()
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(survivors.filter(col("vec_id") < offset).count() == n,
      "an original vector was wrongly dropped")
    assert(survivors.filter(col("vec_id") >= offset).count() == 0,
      "a planted duplicate vector survived")
  }

  test("dd04 SimHash block-LSH recovers planted pairs it claims (hamming<=3) and no false hamming") {
    val df = Dedup.queries("dd04_simhash")(spark, sf)
    assert(df.filter(col("hamming") > 3).count() == 0)
    assert(df.filter(col("b") === col("a") + offset).count() > 0)
  }

  test("dd05 n-gram jaccard: planted pairs dominate and jaccard in (0,1]") {
    val df = Dedup.queries("dd05_ngram_jaccard")(spark, sf).cache()
    assert(df.filter(col("jaccard") <= 0 || col("jaccard") > 1).count() == 0)
    val planted = df.filter(col("b") === col("a") + offset).count()
    assert(planted > 0)
  }

  test("dd08 connected components: chain, star, and disjoint clusters resolve to min-id reps") {
    import spark.implicits._
    // chain 1-2-3-4-5 (diameter 4, forces multi-round + pointer jumping),
    // star 10-{11,12,13}, disjoint pair 20-21
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L),
      (10L, 11L), (10L, 12L), (13L, 10L), (20L, 21L)).toDF("a", "b")
    val got = Dedup.connectedComponents(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Set(
      (1L, 1L, 5L), (2L, 1L, 5L), (3L, 1L, 5L), (4L, 1L, 5L), (5L, 1L, 5L),
      (10L, 10L, 4L), (11L, 10L, 4L), (12L, 10L, 4L), (13L, 10L, 4L),
      (20L, 20L, 2L), (21L, 20L, 2L))
    assert(got == want)
  }

  test("dd08 cluster reps are cluster members and every strong-pair endpoint is clustered") {
    val pairs = Dedup.minhashPairs(spark, sf).filter(col("jaccard") >= 0.7)
    val cc = Dedup.queries("dd08_cc_clusters")(spark, sf).cache()
    val nodes = pairs.select(col("a")).union(pairs.select(col("b"))).distinct().count()
    assert(cc.count() == nodes)
    // every rep is itself a clustered node with rep == itself
    val reps = cc.select(col("cluster_rep")).distinct()
    val badReps = reps.join(cc.filter(col("doc_id") === col("cluster_rep"))
      .select(col("cluster_rep")), Seq("cluster_rep"), "left_anti").count()
    assert(badReps == 0)
  }

  test("dd06 embedding pairs are ordered by cosine descending") {
    val rows = Dedup.queries("dd06_embed_cosine_pairs")(spark, sf)
      .select(col("cos")).collect().map(_.getDouble(0))
    assert(rows.length == 20)
    assert(rows.sameElements(rows.sortBy(-_.doubleValue())))
  }

  test("dd11 bloom routing equals dd07; bloom probes evaluate below every shuffle") {
    val d7 = Dedup.queries("dd07_incremental_dedup")(spark, sf)
    val d11 = Dedup.queries("dd11_incremental_dedup_bloom")(spark, sf)
    assert(d11.exceptAll(d7).isEmpty && d7.exceptAll(d11).isEmpty,
      "bloom-routed incremental dedup diverged from the exact anti-join")
    // both branch filters (definitely-new keep and maybe-seen probe) are
    // scan-side: pruning happens BEFORE any data moves
    val plan = d11.queryExecution.sparkPlan
    val probes = plan.collect {
      case f: org.apache.spark.sql.execution.FilterExec if f.expressions.exists(
        _.exists(_.isInstanceOf[graft.functions.BloomMightContainBcast])) => f
    }
    assert(probes.size >= 2, s"expected both branch probes in the plan:\n$plan")
    probes.foreach { f =>
      assert(f.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }.isEmpty, s"bloom probe above a shuffle:\n$plan")
    }
  }

  test("dd12 spans are maximal (disjoint, gap-separated, >= K tokens) and every copy starts at 0") {
    val K = 6L
    val spans = Dedup.queries("dd12_exact_substring")(spark, sf).cache()
    // internal consistency: length column matches bounds, no span shorter
    // than one seed window
    assert(spans.filter(col("span_tokens") =!= col("span_end") - col("span_start"))
      .count() == 0)
    assert(spans.filter(col("span_tokens") < K).count() == 0)
    // maximality: within a doc, consecutive spans must be separated by a
    // strict gap — two spans with start <= previous end should have merged
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("span_start"))
    val touching = spans
      .withColumn("prev_end", lag(col("span_end"), 1).over(w))
      .filter(col("prev_end").isNotNull && col("span_start") <= col("prev_end"))
    assert(touching.count() == 0, "adjacent/overlapping spans failed to merge")
    // every near-dup copy's first 6-token run (copy pos 0 = base tokens
    // 1..6, consecutive in both) is a guaranteed duplicate seed
    val copies = spans.filter(col("doc_id") >= offset)
      .groupBy(col("doc_id")).agg(min(col("span_start")).as("first_start"))
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(copies.count() == nDocs, "a copy doc produced no duplicate span")
    assert(copies.filter(col("first_start") =!= 0).count() == 0,
      "a copy's leading duplicated run was missed")
  }

  test("dd13 scrub accounting: n_cut equals span tokens, untouched docs keep their text") {
    val spans = Dedup.queries("dd12_exact_substring")(spark, sf)
    val scrub = Dedup.queries("dd13_substring_scrub")(spark, sf).cache()
    // one audit row per corpus doc (base + copies)
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(scrub.count() == 2 * nDocs)
    assert(scrub.filter(col("n_kept") + col("n_cut") =!= col("n_tokens")).count() == 0)
    // spans are disjoint (dd12's maximality), so cut tokens per doc are
    // exactly the per-doc sum of span lengths; docs with no spans cut 0
    val perDoc = spans.groupBy(col("doc_id"))
      .agg(sum(col("span_tokens")).as("span_sum"))
    val joined = scrub.join(perDoc, Seq("doc_id"), "left")
      .withColumn("expect", coalesce(col("span_sum"), lit(0L)))
    assert(joined.filter(col("n_cut") =!= col("expect")).count() == 0,
      "n_cut disagrees with the dd12 span table")
    // a doc with no duplicated span must round-trip its text unchanged
    val untouched = scrub.filter(col("n_cut") === 0)
      .join(spark.read.parquet(s"$sf/documents.parquet"), Seq("doc_id"))
    assert(untouched.filter(col("clean_md5") =!= md5(col("text"))).count() == 0,
      "an untouched doc's reassembled text drifted")
    scrub.unpersist()
  }

  test("dd12 plan: no window over the gram table, occurrence count partially aggregates") {
    // the 100 TB contract (qa05's, applied to dd12): count(*) over
    // (partition by h) would push every (doc_id, pos, h) gram row
    // through the h-exchange with zero map-side combining — the plan
    // must instead show the partial/final occurrence aggregate and
    // route grams through the hint-free duplicated-h join; the only
    // windows left are the per-doc interval sweep's
    import spark.implicits._
    val corpus = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h"))
      .toDF("doc_id", "text")
    val plan = Dedup.spanPipeline(corpus, 6).queryExecution.sparkPlan
    val hWindows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.exists(_.references.exists(_.name == "h")) => w
    }
    assert(hWindows.isEmpty, s"dd12 regressed to a gram-table window plan:\n$plan")
    assert(plan.toString.contains("partial_count"),
      s"occurrence count lost map-side partial aggregation:\n$plan")
  }

  test("dd13b spare rule: duplicated content survives in exactly one doc") {
    import spark.implicits._
    // two identical docs + one unrelated: the keep-one span table must
    // scrub the HIGHER doc completely and leave the canonical (minimal
    // doc_id) occurrence — and the unrelated doc — untouched
    val corpus = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g h"),
      (3L, "p q r s t u v w")).toDF("doc_id", "text")
    val spans = Dedup.spanPipeline(corpus, 6, spareOne = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans == Set((2L, 0L, 8L)),
      s"expected only doc 2 fully spanned, got $spans")
    // the remove-all form cuts BOTH copies — the semantic difference
    val all = Dedup.spanPipeline(corpus, 6)
      .select(col("doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(all == Set(1L, 2L))
  }

  test("dd13b cuts a per-doc subset of dd13 and still scrubs every planted copy") {
    val full = Dedup.queries("dd13_substring_scrub")(spark, sf)
      .select(col("doc_id"), col("n_cut").as("cut_all"))
    val keep1 = Dedup.queries("dd13b_substring_scrub_keep1")(spark, sf)
      .select(col("doc_id"), col("n_cut").as("cut_keep1"))
    val j = full.join(keep1, Seq("doc_id")).cache()
    assert(j.filter(col("cut_keep1") > col("cut_all")).count() == 0,
      "the spare rule grew a span")
    val sums = j.agg(sum(col("cut_all")), sum(col("cut_keep1"))).collect()(0)
    assert(sums.getLong(1) < sums.getLong(0), "the spare rule spared nothing")
    // a planted copy's duplicated grams all have their minimal
    // occurrence in the base doc (smaller id), so every copy is still
    // scrubbed under keep-one
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(j.filter(col("doc_id") >= offset && col("cut_keep1") > 0)
      .count() == nDocs, "a planted copy escaped the keep-one scrub")
    j.unpersist()
  }

  test("dd13 plan: the span join is hint-free (no forced broadcast)") {
    // the span table is usually tiny (duplicated regions only) but
    // unbounded in the worst case — the doc_id join must carry no
    // broadcast hint, so with auto-broadcast off it can only plan as a
    // shuffle join (TextPlanSpec's vocabulary-join contract)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "-1")
    val plan =
      try Dedup.queries("dd13_substring_scrub")(spark, sf)
        .queryExecution.sparkPlan
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    val bhj = plan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }
    assert(bhj.isEmpty, s"forced broadcast on the span side:\n$plan")
    assert(plan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }.nonEmpty, s"expected the span join to plan as sort-merge:\n$plan")
  }

  test("dd13 plan: the span cut is the fused codegen expression, not lambda fallback") {
    val plan = Dedup.queries("dd13_substring_scrub")(spark, sf)
      .queryExecution.sparkPlan
    val planStr = plan.toString
    assert(planStr.contains("spanfilter"),
      s"expected the fused SpanFilter in the scrub projection:\n$plan")
    // the CodegenFallback shape it replaced (filter+exists over the
    // span structs) must be gone — the only lambda left in the plan is
    // the test-corpus construction's every-7th-token drop
    assert(!planStr.contains("exists("),
      s"the interpreted exists() cut survived in the scrub plan:\n$plan")
  }

  test("dd14 containment flags every sampled base's planted near-dup copy") {
    val df = Dedup.queries("dd14_containment_audit")(spark, sf).cache()
    assert(df.filter(col("containment") < 0.5 || col("containment") > 1.0)
      .count() == 0, "containment outside (threshold, 1]")
    // the copy of a sampled base (every 7th token dropped) keeps almost
    // all its grams inside the base — each must be reported against it
    val missing = df.filter(col("doc_id") === col("base_id") + offset)
      .select(col("base_id")).distinct().count()
    assert(missing == 10, s"only $missing of 10 planted copies flagged")
    df.unpersist()
  }

  test("qa07 flow matrix accounts for exactly the qa06 drop totals") {
    val flow = Dedup.queries("qa07_dedup_flow")(spark, sf)
    val impact = Dedup.queries("qa06_dedup_impact")(spark, sf)
    val flowTotal = flow.agg(sum(col("n_dropped"))).collect()(0).getLong(0)
    val impactTotal = impact.agg(sum(col("n_dropped"))).collect()(0).getLong(0)
    assert(flowTotal == impactTotal,
      s"flow matrix total $flowTotal != per-source drop total $impactTotal")
    // per-source marginals must agree too, not just the grand total
    val fromMarginal = flow.groupBy(col("from_source").as("source"))
      .agg(sum(col("n_dropped")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val perSource = impact.filter(col("n_dropped") > 0).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(fromMarginal == perSource, "from_source marginals diverge from qa06")
  }

  test("qa05 novelty is a ratio of its own integer sums, bounded in [0,1]") {
    val df = Dedup.queries("qa05_ngram_novelty")(spark, sf).cache()
    assert(df.filter(col("unique_grams") > col("total_grams")).count() == 0)
    assert(df.filter(col("novelty") < 0 || col("novelty") > 1).count() == 0)
    val recomputed = df.filter(
      col("novelty") =!= col("unique_grams").cast("double") / col("total_grams"))
    assert(recomputed.count() == 0)
    // word-soup documents are mostly novel at the 8-gram level; a
    // collapse here means the occurrence count went global-wrong
    assert(df.filter(col("novelty") < 0.5).count() == 0)
    // unpersist so the plan test below sees the real physical plan, not
    // an InMemoryTableScan over this test's cache
    df.unpersist()
  }

  test("qa05 plan: no window over the gram table, occurrence count partially aggregates") {
    // the 100 TB contract: count(*) over (partition by h) would force
    // every (doc_id, source, pos, h) gram row through the h-shuffle with
    // zero map-side combining — the plan must instead show hash
    // aggregates (which Spark always splits partial/final around the
    // exchange) and no Window at all
    val plan = Dedup.queries("qa05_ngram_novelty")(spark, sf)
      .queryExecution.sparkPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty, s"qa05 regressed to a window plan:\n$plan")
    // totals (2) + occurrence count (2, SortAggregate — the min(string)
    // buffer is not hash-aggregable, but it still splits partial/final
    // around the exchange) + per-source uniques (2): three pairs
    val aggs = plan.collect {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
      case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec => a
    }
    assert(aggs.size >= 6, s"expected three partial/final aggregate " +
      s"pairs, found ${aggs.size}:\n$plan")
    assert(plan.toString.contains("partial_count"),
      s"occurrence count lost map-side partial aggregation:\n$plan")
  }
}
