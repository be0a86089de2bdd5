package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryMinus}
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** SQL registration for every custom Catalyst expression, so the whole
  * engine surface — including the fused dedup/similarity/text kernels —
  * is reachable from plain `spark.sql` (GraftSql wires this into the
  * view facade). Registered as temp functions: session-scoped, no
  * catalog mutation.
  */
object Registry {

  // A "literal" in SQL text is not always a Literal node by the time
  // the function builder sees it: `-100` parses as
  // UnaryMinus(Literal(100)), and constant arithmetic like `4 * 256`
  // arrives unfolded (the builder runs before ConstantFolding). Fold
  // any foldable integral expression instead of rejecting it.
  private def foldIntegral(e: Expression): Option[Long] = e match {
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Short, ShortType) => Some(v.toLong)
    case Literal(v: Byte, ByteType) => Some(v.toLong)
    case UnaryMinus(c, _) => foldIntegral(c).map(x => -x)
    case _ if e.resolved && e.foldable &&
        Seq(ByteType, ShortType, IntegerType, LongType).contains(e.dataType) =>
      Option(e.eval(org.apache.spark.sql.catalyst.InternalRow.empty)).map {
        case v: java.lang.Number => v.longValue()
      }
    case _ => None
  }

  private def litInt(e: Expression, fn: String): Int =
    foldIntegral(e) match {
      case Some(v) if v >= Int.MinValue && v <= Int.MaxValue => v.toInt
      case _ => throw new IllegalArgumentException(
        s"$fn: the size argument must be an INT literal")
    }

  private def litLong(e: Expression, fn: String): Long =
    foldIntegral(e).getOrElse(throw new IllegalArgumentException(
      s"$fn: the bound argument must be an integer literal"))

  def register(spark: SparkSession): Unit = {
    val fr = spark.sessionState.functionRegistry
    def reg(name: String, b: Seq[Expression] => Expression): Unit =
      fr.createOrReplaceTempFunction(name, b, "scala_udf")
    reg("vec_dot", es => VecDot(es(0), es(1)))
    reg("minhash_sig", es => MinHashSig(es(0)))
    reg("shingle_hashes", es => ShingleHashes(es(0), litInt(es(1), "shingle_hashes")))
    reg("char_gram_hashes", es => CharGramHashes(es(0), litInt(es(1), "char_gram_hashes")))
    reg("simhash64", es => SimHash64(es(0)))
    reg("winnow_fingerprint", es => WinnowFingerprint(es(0)))
    reg("char_entropy", es => CharEntropy(es(0)))
    reg("jaccard_sorted", es => JaccardSortedLongs(es(0), es(1)))
    reg("span_cut", es => SpanFilter(es(0), es(1)))
    // the sketch AGGREGATES register like any builtin aggregate: the
    // builder returns the AggregateFunction and the analyzer wraps it
    reg("cms_sketch", es => CmsAggregate(es(0),
      litInt(es(1), "cms_sketch"), litInt(es(2), "cms_sketch")))
    reg("hll_sketch", es => HllAggregate(es(0), litInt(es(1), "hll_sketch")))
    reg("z_value", es => ZValue(es(0), es(1)))
    reg("hist_sketch", es => HistAggregate(es(0),
      litLong(es(1), "hist_sketch"), litLong(es(2), "hist_sketch"),
      litInt(es(3), "hist_sketch")))
    reg("scatter_matrix", es => ScatterAggregate(es(0),
      litInt(es(1), "scatter_matrix")))
  }
}
