package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dot product of two numeric arrays (float or double elements), computed
  * in double with a sequential left-to-right loop.
  *
  * Why a custom Catalyst expression instead of `zip_with`+`aggregate`:
  * the built-in composition materializes an intermediate array per row and
  * walks it twice; this expression is a single fused loop that whole-stage
  * codegen inlines — on the brute-force similarity path (rows × dims) that
  * is the difference between memory-bound and FLOP-bound. At 100 TB the
  * ANN candidate-verification stage is exactly this loop.
  *
  * Null handling: null if either side is null (BinaryExpression default);
  * length mismatch uses the shorter side.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override lazy val resolved: Boolean =
    childrenResolved && Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double)$a.$lGet($i) * (double)$b.$rGet($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Product-quantization encoder: for each subspace m, the id of the
  * codebook centroid nearest (integer squared L2, ties to the LOWEST
  * id) to the vector's m-th subvector.
  *
  * Why a custom expression: the DataFrame formulation — M columns of
  * `array_min(array(struct(dist, cid)...))` over M×K unrolled distance
  * expressions — generates a projection whose Janino compilation alone
  * costs seconds per plan and whose struct allocations dominate the
  * scan (measured: ss09's encode at 9-12s/rep at sf0.1). This is one
  * fused loop, O(1) generated code regardless of M and K, fully inside
  * whole-stage codegen (the VecDot argument, applied to encoding) —
  * same measured scan at 0.3s.
  *
  * `left`: the int-array vector (M·subD elements, subspaces
  * concatenated). `right`: the codebook literal, array of M books,
  * each an array of centroid rows `[cid, c_0, ..., c_{subD-1}]` sorted
  * by cid ascending (so strict `<` keeps the lowest cid on ties —
  * dropped empty clusters may leave cid gaps, which is why the cid
  * travels inside the row instead of being the row's position). */
case class PqEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override lazy val resolved: Boolean = childrenResolved &&
    (left.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }) &&
    (right.dataType match {
      case ArrayType(ArrayType(ArrayType(IntegerType, _), _), _) => true
      case _ => false
    })

  override def nullSafeEval(v: Any, cb: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val books = cb.asInstanceOf[ArrayData]
    val m = books.numElements()
    val out = new Array[Int](m)
    var mi = 0
    var off = 0
    while (mi < m) {
      val book = books.getArray(mi)
      val k = book.numElements()
      val subD = book.getArray(0).numElements() - 1
      var best = Long.MaxValue
      var bestCid = -1
      var ki = 0
      while (ki < k) {
        val row = book.getArray(ki)
        var s = 0L
        var i = 0
        while (i < subD) {
          val d = (vec.getInt(off + i) - row.getInt(i + 1)).toLong
          s += d * d
          i += 1
        }
        if (s < best) { best = s; bestCid = row.getInt(0) }
        ki += 1
      }
      out(mi) = bestCid
      off += subD
      mi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb) => {
      val ad = "org.apache.spark.sql.catalyst.util.ArrayData"
      val m = ctx.freshName("m"); val mi = ctx.freshName("mi")
      val out = ctx.freshName("out"); val off = ctx.freshName("off")
      val book = ctx.freshName("book"); val k = ctx.freshName("k")
      val subD = ctx.freshName("subD"); val best = ctx.freshName("best")
      val bestCid = ctx.freshName("bestCid"); val ki = ctx.freshName("ki")
      val row = ctx.freshName("row"); val s = ctx.freshName("s")
      val i = ctx.freshName("i"); val dv = ctx.freshName("dv")
      s"""
         |int $m = $cb.numElements();
         |int[] $out = new int[$m];
         |int $off = 0;
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  $ad $book = $cb.getArray($mi);
         |  int $k = $book.numElements();
         |  int $subD = $book.getArray(0).numElements() - 1;
         |  long $best = Long.MAX_VALUE;
         |  int $bestCid = -1;
         |  for (int $ki = 0; $ki < $k; $ki++) {
         |    $ad $row = $book.getArray($ki);
         |    long $s = 0L;
         |    for (int $i = 0; $i < $subD; $i++) {
         |      long $dv = (long)($v.getInt($off + $i) - $row.getInt($i + 1));
         |      $s += $dv * $dv;
         |    }
         |    if ($s < $best) { $best = $s; $bestCid = $row.getInt(0); }
         |  }
         |  $out[$mi] = $bestCid;
         |  $off += $subD;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level wrappers + SQL registration for the vector expressions. */
object VectorOps {
  import org.apache.spark.sql.GraftBridge

  private def asExpr(c: Column): Expression = GraftBridge.toExpression(c)
  private def asCol(e: Expression): Column = GraftBridge.toColumn(e)

  /** dot(a, b) in double — fused codegen loop. */
  def vecDot(a: Column, b: Column): Column = asCol(VecDot(asExpr(a), asExpr(b)))

  /** L2 norm. */
  def vecNorm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(vecDot(a, a))

  /** Cosine similarity in double; 0-norm guarded to NaN like x/0. */
  def cosine(a: Column, b: Column): Column =
    vecDot(a, b) / (vecNorm(a) * vecNorm(b))

  /** PQ subspace codes for an int vector against `[cid, c...]`-row
    * codebooks (see [[PqEncode]]). Books ship as one plan literal. */
  def pqEncode(vec: Column, codebooks: Seq[Seq[(Int, Seq[Int])]]): Column = {
    val rows: Seq[Seq[Seq[Int]]] = codebooks.map(_.sortBy(_._1)
      .map { case (cid, c) => cid +: c })
    asCol(PqEncode(asExpr(vec),
      asExpr(org.apache.spark.sql.functions.typedlit(rows))))
  }

  /** Register `vec_dot` for SQL use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs(0), exprs(1)), "scala_udf")
}
