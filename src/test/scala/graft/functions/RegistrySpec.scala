package graft.functions

import graft.{GraftSql, SparkSpec}
import org.apache.spark.sql.functions._

/** Every custom expression is reachable from plain SQL, and the SQL
  * path computes the same values as the Column API path. */
class RegistrySpec extends SparkSpec {

  test("all custom functions resolve and evaluate through spark.sql") {
    val df = GraftSql.sql(spark, sf,
      """SELECT doc_id,
        |  size(shingle_hashes(split(text, ' '), 3)) AS n_sh,
        |  size(minhash_sig(shingle_hashes(split(text, ' '), 3))) AS n_sig,
        |  size(char_gram_hashes(text, 5)) AS n_grams,
        |  simhash64(split(text, ' ')) AS sh64,
        |  char_entropy(text) AS ent,
        |  size(winnow_fingerprint(text)) AS n_fp,
        |  vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot,
        |  jaccard_sorted(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS jac,
        |  z_value(3L, 1L) AS zv,
        |  size(split(text, ' ')) AS n_toks,
        |  size(span_cut(split(text, ' '),
        |    array(named_struct('span_start', CAST(0 AS BIGINT),
        |                       'span_end', CAST(2 AS BIGINT))))) AS n_after_cut
        |FROM documents ORDER BY doc_id LIMIT 10""".stripMargin).collect()
    assert(df.length == 10)
    df.foreach { r =>
      assert(r.getAs[Int]("n_sig") == 64)
      assert(r.getAs[Int]("n_sh") > 0 && r.getAs[Int]("n_grams") > 0)
      assert(r.getAs[Double]("dot") == 11.0)
      assert(r.getAs[Double]("ent") > 0.0 && r.getAs[Int]("n_fp") > 0)
      assert(r.getAs[Double]("jac") == 0.5)
      assert(r.getAs[Long]("zv") == 7L)
      assert(r.getAs[Int]("n_after_cut") == r.getAs[Int]("n_toks") - 2)
    }
  }

  test("the sketch aggregates resolve and evaluate through spark.sql") {
    val r = GraftSql.sql(spark, sf,
      """SELECT size(cms_sketch(doc_id, 4, 1024)) AS n_cells,
        |  size(hll_sketch(CAST(doc_id AS STRING), 8)) AS n_regs,
        |  aggregate(hll_sketch(CAST(doc_id AS STRING), 8), 0,
        |    (a, x) -> a + CASE WHEN x > 0 THEN 1 ELSE 0 END) AS nonzero
        |FROM documents""".stripMargin).collect()(0)
    assert(r.getAs[Int]("n_cells") == 4 * 1024)
    assert(r.getAs[Int]("n_regs") == 256)
    assert(r.getAs[Int]("nonzero") > 0 && r.getAs[Int]("nonzero") <= 256)
  }

  test("SQL path equals Column API path on the same rows") {
    val viaSql = GraftSql.sql(spark, sf,
      "SELECT doc_id, simhash64(split(text, ' ')) AS sh, char_entropy(text) AS e " +
        "FROM documents ORDER BY doc_id LIMIT 20").collect()
    val viaCol = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), SimHash.simhash64(split(col("text"), " ")).as("sh"),
        Entropy.charEntropy(col("text")).as("e"))
      .orderBy("doc_id").limit(20).collect()
    assert(viaSql.map(_.toSeq).toSeq == viaCol.map(_.toSeq).toSeq)
  }

  test("span_cut through SQL stays a codegen expression in the plan") {
    // the full dd13 scrub is SQL-expressible; the facade must not cost
    // the fused SpanFilter its whole-stage-codegen placement
    val df = GraftSql.sql(spark, sf,
      """SELECT doc_id, span_cut(split(text, ' '),
        |  array(named_struct('span_start', CAST(0 AS BIGINT),
        |                     'span_end', CAST(2 AS BIGINT)))) AS kept
        |FROM documents""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("spanfilter"),
      s"SpanFilter vanished from the plan:\n$plan")
    // "*(n)" prefixes are the WholeStageCodegen markers; the projection
    // carrying spanfilter must sit inside one
    assert(plan.linesIterator.exists(l =>
      l.contains("spanfilter") && l.trim.startsWith("*(")),
      s"span_cut SQL plan lost whole-stage codegen:\n$plan")
  }

  test("negative and folded-constant bounds are accepted as literals") {
    // -100 parses as UnaryMinus(Literal(100)) and 4 * 256 arrives
    // unfolded — both are compile-time constants and must register
    val r = GraftSql.sql(spark, sf,
      """SELECT size(hist_sketch(CAST(n_chars AS BIGINT), -100, 10000, 64)) AS nb,
        |  size(cms_sketch(doc_id, 2 + 2, 4 * 256)) AS nc
        |FROM documents""".stripMargin).collect()(0)
    assert(r.getAs[Int]("nb") == 64)
    assert(r.getAs[Int]("nc") == 4 * 1024)
  }

  test("non-literal size argument is rejected with a clear error") {
    val e = intercept[Exception] {
      GraftSql.sql(spark, sf,
        "SELECT shingle_hashes(split(text, ' '), CAST(n_chars AS INT)) FROM documents").collect()
    }
    assert(e.getMessage.contains("INT literal") ||
      Option(e.getCause).exists(_.getMessage.contains("INT literal")))
  }
}
