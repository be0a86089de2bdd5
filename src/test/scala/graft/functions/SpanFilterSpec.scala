package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The fused span cut must equal the higher-order `filter`+`exists`
  * composition it replaced, on every span-list shape: unsorted,
  * overlapping, touching, empty, out-of-range, full-cover. */
class SpanFilterSpec extends SparkSpec {

  private def lambdaCut = (toks: org.apache.spark.sql.Column,
      spans: org.apache.spark.sql.Column) =>
    filter(toks, (_, i) => !exists(spans, sp =>
      i >= sp("span_start") && i < sp("span_end")))

  test("span_cut equals the lambda form on adversarial span lists") {
    import spark.implicits._
    val text = (0 until 40).map(i => s"t$i").mkString(" ")
    // (doc, spans): unsorted, overlapping, adjacent, duplicate,
    // zero-length, past-the-end, empty, full-cover
    val cases = Seq(
      (1L, text, Seq((30L, 36L), (2L, 8L), (6L, 12L))),   // unsorted + overlap
      (2L, text, Seq((0L, 6L), (6L, 12L))),               // touching
      (3L, text, Seq((5L, 11L), (5L, 11L))),              // duplicate
      (4L, text, Seq((7L, 7L))),                          // zero-length
      (5L, text, Seq((38L, 90L))),                        // past the end
      (6L, text, Seq.empty[(Long, Long)]),                // empty list
      (7L, text, Seq((0L, 40L))),                         // full cover
      (8L, "one", Seq((0L, 1L))))                         // single token
    val df = cases.toDF("doc_id", "text", "raw")
      .select(col("doc_id"), split(col("text"), " ").as("toks"),
        transform(col("raw"), r =>
          struct(r.getField("_1").as("span_start"),
            r.getField("_2").as("span_end"))).as("spans"))
    val both = df.select(col("doc_id"),
        SpanFilter.spanCut(col("toks"), col("spans")).as("fused"),
        lambdaCut(col("toks"), col("spans")).as("lambda"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"doc ${r.getLong(0)}: fused ${r.getSeq[String](1)} != " +
          s"lambda ${r.getSeq[String](2)}")
    }
    // decisive spot checks, independent of the lambda oracle
    val byId = both.map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(byId(7L).isEmpty, "full cover must cut everything")
    assert(byId(6L).size == 40, "empty span list must keep everything")
    assert(byId(4L).size == 40, "zero-length span cuts nothing")
    assert(byId(2L) == (12 until 40).map(i => s"t$i"))
  }

  test("SpanFilter participates in whole-stage codegen (not CodegenFallback)") {
    assert(!classOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback]
      .isAssignableFrom(classOf[SpanFilter]))
    // and the codegen path actually evaluates: force a codegen-only
    // projection over it
    import spark.implicits._
    val df = Seq((Seq("a", "b", "c"), Seq((0L, 1L)))).toDF("toks", "raw")
      .select(col("toks"), transform(col("raw"), r =>
        struct(r.getField("_1").as("span_start"),
          r.getField("_2").as("span_end"))).as("spans"))
    val out = df.select(SpanFilter.spanCut(col("toks"), col("spans")))
      .collect()(0).getSeq[String](0)
    assert(out == Seq("b", "c"))
  }
}
