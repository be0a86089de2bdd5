package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The fused merge jaccard must equal the built-in
  * size(array_intersect)/size(array_union) composition on every pair —
  * including duplicates, empties, and negative hash values. */
class SetOpsSpec extends SparkSpec {
  import spark.implicits._

  test("jaccardSorted equals the built-in composition on random pairs") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(200) { i =>
      val a = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong - 20)
      val b = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong - 20)
      (i.toLong, a.sorted, b.sorted)
    } :+ ((200L, Seq.empty[Long], Seq.empty[Long])) :+
      ((201L, Seq(1L, 1L, 2L), Seq.empty[Long]))
    // under ANSI mode the plain division THROWS on the both-empty pair;
    // try_divide yields null there, and the fused form yields NaN — a
    // strictly more total behavior for the same "no information" case
    val df = rows.toDF("id", "a", "b")
      .withColumn("fused", SetOps.jaccardSorted(col("a"), col("b")))
      .withColumn("builtin", try_divide(
        size(array_intersect(col("a"), col("b"))).cast("double"),
        size(array_union(col("a"), col("b")))))
    val diff = df.filter(
      !(col("fused") <=> coalesce(col("builtin"), lit(Double.NaN)))).count()
    assert(diff == 0, s"$diff rows diverged from the built-in composition")
  }

  test("jaccard_sorted rejects arrays with nullable elements at analysis") {
    val df = Seq((Seq(Option(1L), None), Seq(Option(1L))))
      .toDF("a", "b") // Option elements → containsNull = true
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(SetOps.jaccardSorted(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("jaccard_sorted"),
      s"expected the jaccard_sorted type-check message, got: ${e.getMessage}")
  }

  test("jaccard_sorted fails loudly on unsorted input instead of lying") {
    val df = Seq((Seq(3L, 1L, 2L), Seq(1L, 2L))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(SetOps.jaccardSorted(col("a"), col("b"))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("not ascending-sorted")),
      s"expected the unsorted-input failure, got: ${messages(e).mkString(" | ")}")
  }

  test("jaccardSorted on the real shingle path matches the pre-fusion formula") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .limit(50)
      .withColumn("g", sort_array(MinHash.charGramHashes(col("text"), 5)))
      .select(col("doc_id"), col("g"))
    val pairs = docs.as("x").join(docs.as("y"), col("x.doc_id") < col("y.doc_id"))
      .withColumn("fused", SetOps.jaccardSorted(col("x.g"), col("y.g")))
      .withColumn("builtin",
        size(array_intersect(col("x.g"), col("y.g"))).cast("double") /
          size(array_union(col("x.g"), col("y.g"))))
    assert(pairs.filter(!(col("fused") <=> col("builtin"))).count() == 0)
  }
}
