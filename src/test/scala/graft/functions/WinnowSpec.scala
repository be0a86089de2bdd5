package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def fps(text: String): Set[Long] =
    Seq(text).toDF("t").select(Winnow.fingerprint(col("t")))
      .as[Array[Long]].collect()(0).toSet

  test("identical documents → identical fingerprint sets") {
    val t = "the quick brown fox jumps over the lazy dog again and again"
    assert(fps(t) == fps(t))
  }

  test("near-duplicates share most fingerprints; unrelated docs share few") {
    val words = (1 to 80).map(i => s"word$i")
    val a = fps(words.mkString(" "))
    val b = fps(words.patch(40, Nil, 2).mkString(" ")) // drop 2 words mid-doc
    val c = fps((1 to 80).map(i => s"other$i").mkString(" "))
    val jab = (a intersect b).size.toDouble / (a union b).size
    val jac = (a intersect c).size.toDouble / (a union c).size
    assert(jab > 0.6, s"near-dup winnow jaccard $jab should be high")
    assert(jac < 0.1, s"unrelated winnow jaccard $jac should be low")
  }

  test("guarantee: any shared substring of length >= w+k-1 yields a shared fingerprint") {
    val shared = "thisisalongsharedsubstringxyz" // 29 >= 4+8-1
    val a = fps(s"prefixAAA $shared suffixBBB")
    val b = fps(s"differentCCC $shared otherDDD")
    assert((a intersect b).nonEmpty)
  }

  test("short text (< k bytes) yields empty set; null-safe") {
    assert(fps("tiny") == Set.empty)
    val df = Seq(Option.empty[String]).toDF("t").select(Winnow.fingerprint(col("t")))
    assert(df.collect()(0).isNullAt(0))
  }
}
