package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class MN(p: String, q: String)
case class MRec(id: Long, a: String, b: String, xs: Seq[MN], ys: Seq[MN])

/** Model-based fuzz for the signature operator: a 20-line pure-Scala
  * implementation of the reference flatten semantics (SURVEY.md §2.4) is
  * the model; Flatten's output must equal it value-for-value on random
  * records with TWO repeated keys. */
class FlattenModelSpec extends SparkSpec {
  import spark.implicits._

  /** The reference semantics in plain Scala: per-array expansions for
    * non-empty arrays (union, not cross product); base row iff all
    * arrays empty. Row = (id, a, b, p, q) with nulls for absent fields. */
  private def model(r: MRec): Seq[(Long, String, String, Option[String], Option[String])] = {
    val fromXs = r.xs.map(n => (r.id, r.a, r.b, Option(n.p), Option(n.q)))
    val fromYs = r.ys.map(n => (r.id, r.a, r.b, Option(n.p), Option(n.q)))
    val expansions = fromXs ++ fromYs
    if (expansions.isEmpty) Seq((r.id, r.a, r.b, None, None)) else expansions
  }

  test("flatten equals the reference model on randomized two-array records") {
    val rnd = new scala.util.Random(99)
    (1 to 3).foreach { round =>
      val recs = (1 to 40).map { i =>
        def ns() = (0 until rnd.nextInt(3)).map(j => MN(s"p$round-$i-$j", s"q$j"))
        MRec(i.toLong, s"a$i", s"b$i", ns(), ns())
      }
      val got = Flatten(recs.toDF())
        .select(col("id"), col("a"), col("b"), col("p"), col("q"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          Option(r.getString(3)), Option(r.getString(4))))
        .sortBy(_.toString).toSeq
      val want = recs.flatMap(model).sortBy(_.toString)
      assert(got == want, s"round $round mismatch")
    }
  }
}
