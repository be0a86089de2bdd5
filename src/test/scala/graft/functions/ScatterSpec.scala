package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScatterSpec extends SparkSpec {

  private val dim = 5
  private lazy val vecs: Seq[(Long, Array[Int])] = {
    val rnd = new scala.util.Random(7)
    Seq.tabulate(257)(i => (i.toLong, Array.fill(dim)(rnd.nextInt(201) - 100)))
  }

  private def reference: Array[Array[Long]] = {
    val ref = Array.ofDim[Long](dim, dim)
    for ((_, c) <- vecs; i <- 0 until dim; j <- 0 until dim)
      ref(i)(j) += c(i).toLong * c(j)
    ref
  }

  test("scatter_matrix equals the driver outer-product sum and is " +
    "symmetric — including through partial-buffer merges") {
    import spark.implicits._
    // 7 partitions of 257 rows force map-side partials + merge()
    val s = vecs.toDF("id", "c").repartition(7)
      .agg(Scatter.scatterMatrix(col("c"), dim)).head
      .getSeq[scala.collection.Seq[Long]](0).map(_.toArray).toArray
    val ref = reference
    for (i <- 0 until dim; j <- 0 until dim) {
      assert(s(i)(j) == ref(i)(j), s"cell ($i,$j): ${s(i)(j)} vs ${ref(i)(j)}")
      assert(s(i)(j) == s(j)(i), s"asymmetry at ($i,$j)")
    }
  }

  test("null rows are skipped; a wrong-dimension vector fails loudly") {
    import spark.implicits._
    val withNull = vecs.map { case (id, c) => (id, Option(c)) } :+
      (999L, None: Option[Array[Int]])
    val s = withNull.toDF("id", "c")
      .agg(Scatter.scatterMatrix(col("c"), dim)).head
      .getSeq[scala.collection.Seq[Long]](0).map(_.toArray).toArray
    assert(s(0)(0) == reference(0)(0))

    val bad = Seq((1L, Array(1, 2, 3))).toDF("id", "c")
    val e = intercept[Exception] {
      bad.agg(Scatter.scatterMatrix(col("c"), dim)).collect()
    }
    assert(e.getMessage != null)
  }

  test("SQL facade: scatter_matrix(c, dim) registers and matches the Column form") {
    import spark.implicits._
    Registry.register(spark)
    vecs.toDF("id", "c").createOrReplaceTempView("scatter_in")
    val viaSql = spark.sql(s"SELECT scatter_matrix(c, $dim) AS s FROM scatter_in")
      .head.getSeq[scala.collection.Seq[Long]](0).map(_.toArray).toArray
    val ref = reference
    for (i <- 0 until dim; j <- 0 until dim)
      assert(viaSql(i)(j) == ref(i)(j), s"SQL cell ($i,$j)")
  }
}
