package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EntropySpec extends SparkSpec {
  import spark.implicits._

  private def h(text: String): Double =
    Seq(text).toDF("t").select(Entropy.charEntropy(col("t"))).as[Double].collect()(0)

  test("entropy of a single repeated byte is 0") {
    assert(h("aaaaaaaa") == 0.0)
  }

  test("entropy of a uniform 4-symbol string is exactly 2 bits") {
    assert(math.abs(h("abcdabcdabcd") - 2.0) < 1e-12)
  }

  test("matches a model implementation on arbitrary text") {
    val texts = Seq("the quick brown fox", "aabbbcccc dd", "spark scans shuffle")
    texts.foreach { t =>
      val bytes = t.getBytes("UTF-8")
      val model = bytes.groupBy(identity).values.map { g =>
        val p = g.length.toDouble / bytes.length
        -p * math.log(p) / math.log(2.0)
      }.sum
      assert(math.abs(h(t) - model) < 1e-12, s"mismatch for '$t'")
    }
  }

  test("empty and null are safe") {
    assert(h("") == 0.0)
    val r = Seq(Option.empty[String]).toDF("t")
      .select(Entropy.charEntropy(col("t"))).collect()(0)
    assert(r.isNullAt(0))
  }
}
