package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimHashSpec extends SparkSpec {
  import spark.implicits._

  private def hashOf(text: String): Long =
    Seq(text).toDF("t")
      .select(SimHash.simhash64(split(col("t"), " ")))
      .as[Long].collect()(0)

  test("identical token streams get identical simhash") {
    assert(hashOf("spark scans shuffle sort merge join") ==
      hashOf("spark scans shuffle sort merge join"))
  }

  test("near-duplicate texts land within small hamming distance") {
    val words = (1 to 60).map(i => s"tok$i")
    val a = hashOf(words.mkString(" "))
    val b = hashOf(words.filterNot(_ == "tok7").mkString(" "))
    val c = hashOf((1 to 60).map(i => s"other$i").mkString(" "))
    assert(java.lang.Long.bitCount(a ^ b) <= 8, "near-dup should be close")
    assert(java.lang.Long.bitCount(a ^ c) > 16, "unrelated should be far")
  }

  test("simhash is stable across eval and codegen paths") {
    // collect() with a single literal row goes through interpreted eval in
    // some plans and codegen in others; compare against a direct call.
    val tokens = Array("alpha", "beta", "gamma")
    val viaDf = hashOf(tokens.mkString(" "))
    val direct = SimHashUtil.simhash64(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        tokens.map(org.apache.spark.unsafe.types.UTF8String.fromString)))
    assert(viaDf == direct)
  }
}
