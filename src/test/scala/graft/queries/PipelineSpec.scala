package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {

  test("pp02 near-dedup eliminates planted copies and keeps originals") {
    val survivors = Pipeline.queries("pp02_near_dedup_corpus")(spark, sf).cache()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    // most originals survive — a few are genuine near-dups of OTHER
    // originals and are correctly deduped among themselves
    val keptOriginals = survivors.filter(col("doc_id") < 1000000L).count()
    assert(keptOriginals >= (nDocs * 0.9).toLong && keptOriginals <= nDocs)
    // the overwhelming majority of planted copies are dropped (bounded by
    // LSH recall, gated >= 0.8 in DedupSpec)
    val keptCopies = survivors.filter(col("doc_id") >= 1000000L).count()
    assert(keptCopies <= nDocs / 5, s"too many near-dup copies survived: $keptCopies")
  }

  test("dc01: benchmark docs excluded; hit counts match a model recount") {
    val out = Pipeline.queries("dc01_decontaminate")(spark, sf).cache()
    assert(out.filter(col("doc_id") % 20 === 0).count() == 0)
    assert(out.filter(col("contaminated") =!= (col("n_hit_grams") > 0)).count() == 0)
    // recompute hit counts in plain Scala for a sample of docs
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split(" ", -1).toSeq)
      .toMap
    def grams(t: Seq[String]): Set[String] =
      if (t.size >= 5) t.sliding(5).map(_.mkString(" ")).toSet
      else Set.empty[String]
    val benchGrams =
      docs.collect { case (id, t) if id % 20 == 0 => grams(t) }.flatten.toSet
    out.orderBy("doc_id").limit(25).collect().foreach { r =>
      val expect = grams(docs(r.getLong(0))).count(benchGrams.contains)
      assert(r.getLong(1) == expect, s"doc ${r.getLong(0)}")
    }
    out.unpersist()
  }

  test("dc03: scrub agrees with dc01's flags, cuts whole grams, and " +
    "matches a model scrub on a sample") {
    val scrub = Pipeline.queries("dc03_decontaminate_scrub")(spark, sf).cache()
    val flags = Pipeline.queries("dc01_decontaminate")(spark, sf)
      .select(col("doc_id"), col("contaminated"))
    // a doc loses tokens iff dc01 flags it, and a contaminated doc
    // loses at least one full 5-gram
    val j = scrub.join(flags, "doc_id")
    assert(j.filter((col("n_cut") > 0) =!= col("contaminated")).count() == 0)
    assert(j.filter(col("contaminated") && col("n_cut") < 5).count() == 0)
    assert(scrub.filter(col("n_kept") + col("n_cut") =!= col("n_tokens"))
      .count() == 0)
    // model scrub in plain Scala on a sample: cut the union of hit
    // intervals from the raw tokens, compare the audit hash
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def lowTok(t: String) = t.toLowerCase.split(" ", -1).toSeq
    def grams(t: Seq[String]) =
      if (t.size >= 5) t.sliding(5).map(_.mkString(" ")).toVector
      else Vector.empty[String]
    val bench = docs.collect { case (id, t) if id % 20 == 0 =>
      grams(lowTok(t)) }.flatten.toSet
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    scrub.orderBy("doc_id").limit(40).collect().foreach { r =>
      val raw = docs(r.getLong(0)).split(" ", -1).toSeq
      val covered = grams(lowTok(docs(r.getLong(0)))).zipWithIndex
        .collect { case (g, p) if bench(g) => p until p + 5 }
        .flatten.toSet
      val kept = raw.zipWithIndex.collect {
        case (t, i) if !covered(i) => t }
      assert(r.getLong(2) == kept.size.toLong, s"n_kept of doc ${r.getLong(0)}")
      assert(r.getString(4) == md5hex(kept.mkString(" ")),
        s"clean_md5 of doc ${r.getLong(0)}")
    }
    scrub.unpersist()
  }

  test("pp07: chunk count, index, and length laws hold per document") {
    val out = Pipeline.queries("pp07_chunk_overlap")(spark, sf).cache()
    val lens = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), length(col("text")).as("len"))
    val j = out.join(lens, "doc_id")
    assert(j.filter(
      col("chunk_len") =!= least(lit(200), col("len") - col("chunk_idx") * 150))
      .count() == 0)
    val counts = out.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("chunk_idx").as("mx"))
      .join(lens, "doc_id")
    assert(counts.filter(col("n") =!= (floor((col("len") - 1) / 150) + 1)).count() == 0)
    assert(counts.filter(col("mx") =!= col("n") - 1).count() == 0)
    out.unpersist()
  }

  test("pp13: every leakage row is val/test, cites a train-bearing " +
    "cluster, and the near-dup relation is the dd08 map") {
    val out = Pipeline.queries("pp13_split_leakage")(spark, sf).cache()
    // only non-train docs can leak
    assert(out.filter(col("split") === "train").count() == 0)
    // n_train_members ≥ 1 by construction (inner join against the
    // train-bearing clusters)
    assert(out.filter(col("n_train_members") < 1).count() == 0)
    // cross-check one row end-to-end against the cluster map + split rule
    val clusters = graft.ops.Dedup.clusterMap(spark, sf)
      .select((col("doc_id") % 1000000L).as("base_id"), col("cluster_rep"))
      .distinct()
    val splitOf = Pipeline.queries("pp03_hash_split")(spark, sf)
      .select(col("doc_id").cast("long").as("base_id"), col("split"))
    val expected = clusters.join(splitOf, "base_id")
    val trainC = expected.filter(col("split") === "train")
      .groupBy("cluster_rep").agg(count(lit(1)).as("n"))
    val manual = expected.filter(col("split") =!= "train")
      .join(trainC, "cluster_rep").count()
    assert(out.count() == manual && manual > 0)
    out.unpersist()
  }

  test("pp14 weighted sample: per-source top-k laws, independent E-S " +
    "replay, and the weighting actually biases toward heavy docs") {
    val out = Pipeline.queries("pp14_weighted_sample")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

    // per source: exactly min(10, |source|) rows, ranks contiguous
    val bySrc = out.groupBy(_._2)
    val srcSizes = docs.groupBy(_._2).map { case (s0, d) => s0 -> d.length }
    srcSizes.foreach { case (s0, n) =>
      val got = bySrc.getOrElse(s0, Array.empty)
      assert(got.length == math.min(10, n), s"$s0: ${got.length} of $n")
      assert(got.map(_._4).sorted.toSeq == (1 to got.length), s"$s0 ranks")
    }

    // independent replay: recompute the E-S keys with java's own md5
    // and ln, take the top-10 per source — must select the same docs
    // with the same ranks (certifies the whole key chain, not just
    // the row count)
    val md = java.security.MessageDigest.getInstance("MD5")
    def esKey(id: Long, w: Long): Double = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 13)
      val u = (java.lang.Long.parseLong(hex, 16) + 1).toDouble / 4503599627370497.0
      math.log(u) / math.max(w, 1L).toDouble
    }
    val expected = docs.groupBy(_._2).map { case (s0, d) =>
      s0 -> d.map(x => (x._1, esKey(x._1, x._3)))
        .sortBy { case (id, k) => (-k, id) }.take(10).map(_._1).toSeq
    }
    bySrc.foreach { case (s0, got) =>
      assert(got.sortBy(_._4).map(_._1).toSeq == expected(s0),
        s"$s0: selection diverged from the driver replay")
    }

    // the point of weighting: long docs are overrepresented — the
    // sample's mean length exceeds the corpus mean (deterministic
    // given the fixed md5 draws; a uniform sample would not be biased)
    val sampleMean = out.map(_._3).sum.toDouble / out.length
    val corpusMean = docs.map(_._3).sum.toDouble / docs.length
    assert(sampleMean > corpusMean,
      s"weighted sample not length-biased: $sampleMean vs $corpusMean")
  }

  test("pp15 DSIR: threshold consistency, token accounting, and the " +
    "target slice selects at a higher rate") {
    val out = Pipeline.queries("pp15_dsir_sample")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    val docs = spark.read.parquet(s"$sf/documents.parquet").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("lang"), r.getAs[String]("text")))
      .toMap
    assert(out.length == docs.size, "one weight row per document")
    // token accounting: n_tokens is the whitespace token count
    out.foreach { case (id, lang, n, _, _) =>
      assert(lang == docs(id)._1)
      assert(n == docs(id)._2.toLowerCase.split(" ", -1).length, s"doc $id")
    }
    // selection is a consistent global threshold on the rounded weight:
    // every selected weight strictly exceeds every unselected one's
    val (sel, unsel) = out.partition(_._5)
    assert(sel.nonEmpty && unsel.nonEmpty, "mean threshold is degenerate")
    assert(sel.map(_._4).min > unsel.map(_._4).max,
      "selected/unselected weights interleave — not a single threshold")
    // the DSIR point: docs from the target slice (en) are closer to the
    // target distribution, so they select at a visibly higher rate
    def rate(rows: Array[(Long, String, Long, Double, Boolean)]) =
      rows.count(_._5).toDouble / rows.length
    val en = out.filter(_._2 == "en")
    val rest = out.filter(_._2 != "en")
    assert(rate(en) > rate(rest) + 0.1,
      s"no target lean: en ${rate(en)} vs rest ${rate(rest)}")
  }

  test("qa08 selection shift: shares sum to 1, counts nest, and the " +
    "selected mix shifts toward the target language") {
    val rows = Pipeline.queries("qa08_dsir_shift")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, nDocs, nSel, toks, toksSel, _, _) =>
      assert(nSel <= nDocs, s"$lang selected more docs than it has")
      assert(toksSel <= toks, s"$lang selected more tokens than it has")
    }
    assert(math.abs(rows.map(_._6).sum - 1.0) < 1e-9, "before-shares != 1")
    assert(math.abs(rows.map(_._7).sum - 1.0) < 1e-9, "after-shares != 1")
    // the shift the report exists to show: the target language's token
    // share GROWS under selection, so some other language's shrinks
    val en = rows.find(_._1 == "en").get
    assert(en._7 > en._6, s"en share did not grow: ${en._6} -> ${en._7}")
    assert(rows.exists(r => r._1 != "en" && r._7 < r._6),
      "no non-target language lost share")
    // consistency with pp15 itself
    assert(rows.map(_._2).sum ==
      spark.read.parquet(s"$sf/documents.parquet").count(),
      "n_docs sum diverges from the corpus")
    val sel = Pipeline.queries("pp15_dsir_sample")(spark, sf)
      .filter(col("selected")).count()
    assert(rows.map(_._3).sum == sel, "n_sel sum diverges from pp15")
  }

  test("mm03 resize: constant output size, correct kept-byte accounting") {
    val df = graft.ops.Multimodal.queries("mm03_resize_payload")(spark, sf).cache()
    assert(df.filter(col("resized_bytes") =!= 1024).count() == 0)
    val bad = df.filter(
      col("kept_bytes") =!= least(col("orig_bytes"), lit(1024))).count()
    assert(bad == 0)
  }
}
