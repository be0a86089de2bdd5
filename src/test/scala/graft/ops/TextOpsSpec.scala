package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semantics gates for the n-gram text operators (tx10/tx11/dc01 share
  * the let-bound wordGrams builder). */
class TextOpsSpec extends SparkSpec {

  test("wordGrams matches naive sliding-window construction") {
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), split(lower(col("text")), " ").as("t"))
      .withColumn("g", TextAnalysis.wordGrams(col("t"), 5))
      .limit(50).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getSeq[String](1)
      val expected =
        if (t.size >= 5) t.sliding(5).map(_.mkString(" ")).toSeq
        else Seq.empty[String]
      assert(r.getSeq[String](2) == expected, s"doc ${r.getLong(0)}")
    }
  }

  test("wordGrams yields empty array below n tokens") {
    import spark.implicits._
    val out = Seq("a b c", "a b c d e").toDF("text")
      .select(TextAnalysis.wordGrams(split(col("text"), " "), 5).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq.empty[String])
    assert(out(1) == Seq("a b c d e"))
  }

  test("tx11 bigram LM: exact conditional probabilities, ranked top-3") {
    val df = TextAnalysis.queries("tx11_bigram_lm")(spark, sf).cache()
    // p is the exact rational c12/c1 (single double division)
    assert(df.filter(col("p") =!= col("c12").cast("double") / col("c1")).count() == 0)
    assert(df.filter(col("c12") > col("c1")).count() == 0)
    assert(df.filter(col("rank") < 1 || col("rank") > 3).count() == 0)
    // within each head word, probability is non-increasing with rank
    val w = Window.partitionBy("w1").orderBy("rank")
    val inversions = df.withColumn("prev", lag(col("p"), 1).over(w))
      .filter(col("prev").isNotNull && col("p") > col("prev")).count()
    assert(inversions == 0)
    df.unpersist()
  }
}
