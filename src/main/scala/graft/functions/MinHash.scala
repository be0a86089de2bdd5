package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Shared kernel for interpreted eval and codegen. */
object MinHashUtil {
  val NumPerms = 64

  // Fixed affine permutation family h_i(x) = a_i*x + b_i over Z_2^64
  // (a_i odd ⇒ bijective). Seeded deterministically: same signatures on
  // every run, every engine, every cluster size.
  private val (as, bs): (Array[Long], Array[Long]) = {
    val rnd = new java.util.Random(0x5eed)
    val a = Array.fill(NumPerms)(rnd.nextLong() | 1L)
    val b = Array.fill(NumPerms)(rnd.nextLong())
    (a, b)
  }

  /** 64-perm MinHash signature of a string array — each element hashed
    * ONCE (two murmur32 halves → 64-bit), then 64 affine permutations.
    * O(n + 64n cheap ops) vs O(64n) full rehashes of the naive form. */
  def signature(arr: ArrayData): ArrayData = {
    val mins = Array.fill(NumPerms)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val lo = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42)
        val hi = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 0x9747b28c)
        update(mins, (hi.toLong << 32) | (lo.toLong & 0xffffffffL))
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Signature over pre-hashed 64-bit shingles (array<long>). */
  def signatureLong(arr: ArrayData): ArrayData = {
    val mins = Array.fill(NumPerms)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) update(mins, arr.getLong(i))
      i += 1
    }
    new GenericArrayData(mins)
  }

  private def update(mins: Array[Long], x: Long): Unit = {
    var p = 0
    while (p < NumPerms) {
      val h = as(p) * x + bs(p)
      if (h < mins(p)) mins(p) = h
      p += 1
    }
  }

  /** Distinct order-sensitive hashes of each n consecutive tokens —
    * one murmur pass per token, fmix-style combining per shingle. */
  def shingleHashes(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    val toks = new Array[Long](len)
    var i = 0
    while (i < len) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val lo = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42)
        val hi = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 0x9747b28c)
        toks(i) = (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
      }
      i += 1
    }
    val m = math.max(len - n + 1, 0)
    val set = new java.util.HashSet[java.lang.Long](m * 2)
    i = 0
    while (i < m) {
      var h = 0x9e3779b97f4a7c15L
      var j = 0
      while (j < n) {
        h = (h ^ toks(i + j)) * 0xff51afd7ed558ccdL
        h ^= (h >>> 33)
        j += 1
      }
      set.add(h)
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** Distinct rolling (Rabin–Karp) hashes of all byte k-grams. */
  def charGramHashes(s: org.apache.spark.unsafe.types.UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val B = 1000003L
    var bk = 1L
    var i = 0
    while (i < k) { bk *= B; i += 1 }
    val set = new java.util.HashSet[java.lang.Long](n * 2)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + (bytes(i) & 0xff); i += 1 }
    set.add(h)
    i = 1
    while (i <= n - k) {
      h = h * B - (bytes(i - 1) & 0xff) * bk + (bytes(i + k - 1) & 0xff)
      set.add(h)
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}

/** MinHash signature as a native Catalyst expression:
  * array<string> → array<long> (64 permutations).
  *
  * Replaces the built-in composition
  * `transform(sequence(0,63), s -> array_min(transform(sh, x -> xxhash64(x,s))))`,
  * which rehashes every shingle's bytes 64 times and allocates 64
  * intermediate arrays per row. On the dedup path (SURVEY.md §2.5
  * extension) this is the dominant cost at corpus scale.
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override lazy val resolved: Boolean = childrenResolved && (child.dataType match {
    case ArrayType(StringType | LongType, _) => true
    case _ => false
  })

  private def isLong: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def nullSafeEval(input: Any): Any =
    if (isLong) MinHashUtil.signatureLong(input.asInstanceOf[ArrayData])
    else MinHashUtil.signature(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isLong) "signatureLong" else "signature"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashUtil.$fn($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHash {
  def minhashSig(shingles: Column): Column =
    GraftBridge.toColumn(MinHashSig(GraftBridge.toExpression(shingles)))

  def shingleHashes(tokens: Column, n: Int): Column =
    GraftBridge.toColumn(ShingleHashes(GraftBridge.toExpression(tokens), n))

  def charGramHashes(text: Column, k: Int): Column =
    GraftBridge.toColumn(CharGramHashes(GraftBridge.toExpression(text), k))
}

/** Distinct rolling-hash set of all byte k-grams of a string:
  * string → array<long>. One O(n) pass (Rabin–Karp roll), no per-gram
  * substring allocation — the fused form of
  * `transform(sequence(1, len-k+1), i -> substring(text, i, k))`. */
case class CharGramHashes(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override lazy val resolved: Boolean =
    childrenResolved && k > 0 && child.dataType == StringType

  override def nullSafeEval(input: Any): Any =
    MinHashUtil.charGramHashes(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashUtil.charGramHashes($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hashed word-n-gram shingle set: array<string> tokens → array<long>
  * (distinct hashes of each n consecutive tokens).
  *
  * Replaces `transform(sequence(...), i -> concat_ws(' ', slice(tokens,
  * i, n)))` + per-shingle string hash: that form builds an intermediate
  * string per shingle (O(doc length) allocation churn). Here each token
  * is hashed once and n-gram hashes combine the token hashes with an
  * order-sensitive mix — one pass, zero string building.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override lazy val resolved: Boolean = childrenResolved && n > 0 &&
    (child.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })

  override def nullSafeEval(input: Any): Any =
    MinHashUtil.shingleHashes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashUtil.shingleHashes($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
