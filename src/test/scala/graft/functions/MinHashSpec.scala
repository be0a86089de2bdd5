package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MinHashSpec extends SparkSpec {
  import spark.implicits._

  private def sig(tokens: Seq[String]): Array[Long] =
    Seq(tokens).toDF("t")
      .select(MinHash.minhashSig(col("t")))
      .as[Array[Long]].collect()(0)

  test("identical sets → identical signatures") {
    assert(sig(Seq("a", "b", "c")).sameElements(sig(Seq("a", "b", "c"))))
  }

  test("signature length is 64 and deterministic across invocations") {
    val s1 = sig(Seq("x", "y"))
    assert(s1.length == 64)
    assert(s1.sameElements(sig(Seq("x", "y"))))
  }

  test("signature agreement estimates Jaccard similarity") {
    val universe = (1 to 200).map(i => s"sh$i")
    val a = universe.take(150) // |A∩B|=100, |A∪B|=200 → J=0.5
    val b = universe.drop(50)
    val (sa, sb) = (sig(a), sig(b))
    val agree = sa.zip(sb).count { case (x, y) => x == y } / 64.0
    assert(math.abs(agree - 0.5) < 0.2, s"agreement $agree should estimate J=0.5")
  }

  test("long-array input path (pre-hashed shingles) matches expectations") {
    val df = Seq(Seq(1L, 2L, 3L)).toDF("t")
    val s1 = df.select(MinHash.minhashSig(col("t"))).as[Array[Long]].collect()(0)
    assert(s1.length == 64)
    // subset property: min over subset >= min over superset, per perm —
    // in UNSIGNED order, matching the oracle's mod-2^64 value order
    val s2 = Seq(Seq(1L, 2L, 3L, 4L)).toDF("t")
      .select(MinHash.minhashSig(col("t"))).as[Array[Long]].collect()(0)
    assert(s1.zip(s2).forall { case (a, b) =>
      java.lang.Long.compareUnsigned(a, b) >= 0 })
  }
}
