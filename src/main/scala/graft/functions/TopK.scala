package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A scored item for top-k aggregation. */
final case class Scored(id: Long, score: Double)

/** Bounded top-k as a typed Aggregator (UDAF surface, SURVEY.md §2.5).
  *
  * Why not `row_number().over(window)`: the window form shuffles EVERY
  * candidate row to its group's reducer and sorts all of them. An
  * Aggregator does PARTIAL aggregation: each map task keeps only its
  * local top-k (bounded buffer), so the exchange carries k rows per
  * group per task instead of the whole candidate set — the shape that
  * survives a 100 TB candidate stream.
  *
  * Deterministic order: score desc, then id asc on ties.
  */
class TopK(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  private def lt(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: Seq[Scored] = Vector.empty

  override def reduce(buf: Seq[Scored], item: Scored): Seq[Scored] =
    if (buf.size < k) (buf :+ item).sortWith(lt)
    else if (lt(item, buf.last)) (buf.init :+ item).sortWith(lt)
    else buf

  override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
    (b1 ++ b2).sortWith(lt).take(k)

  override def finish(reduction: Seq[Scored]): Seq[Scored] = reduction

  override def bufferEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()

  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}

object TopK {
  def apply(k: Int): TopK = new TopK(k)
}
