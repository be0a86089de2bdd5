package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.VectorOps._

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  test("VecDot matches a hand-computed double fold on float arrays") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.5f, -1.5f), Array(2.0f, 2.0f))).toDF("a", "b")
    val got = df.select(vecDot(col("a"), col("b"))).as[Double].collect()
    assert(got(0) == 1.0 * 4 + 2.0 * 5 + 3.0 * 6)
    assert(got(1) == 0.5 * 2.0 + (-1.5) * 2.0)
  }

  test("VecDot mixes float and double arrays; shorter side bounds the loop") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(10.0, 20.0))).toDF("a", "b")
    val got = df.select(vecDot(col("a"), col("b"))).as[Double].collect()
    assert(got(0) == 1.0 * 10 + 2.0 * 20)
  }

  test("VecDot is null-safe") {
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]])).toDF("a", "b")
    assert(df.select(vecDot(col("a"), col("b"))).collect()(0).isNullAt(0))
  }

  test("cosine of identical vectors is 1.0") {
    val df = Seq((Array(3.0f, 4.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    val got = df.select(cosine(col("a"), col("b"))).as[Double].collect()(0)
    assert(math.abs(got - 1.0) < 1e-12)
  }

  test("vec_dot is callable from SQL after registration") {
    VectorOps.register(spark)
    Seq((Array(1.0f, 1.0f), Array(2.0f, 3.0f))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val got = spark.sql("SELECT vec_dot(a, b) FROM vecs").as[Double].collect()(0)
    assert(got == 5.0)
  }
}
