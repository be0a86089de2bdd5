package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
/** Shared kernel for interpreted eval and codegen. */
object MinHashUtil {
  val NumPerms = 64

  // Fixed affine permutation family h_i(x) = a_i*x + b_i over Z_2^64
  // (a_i odd ⇒ bijective). Seeded deterministically: same signatures on
  // every run, every engine, every cluster size. PUBLIC so the DuckDB
  // oracle can embed the exact constants as literals and replay the
  // signature arithmetic (mod-2^64 in HUGEINT) — see Dedup.dd03Sql.
  private val perms: (Array[Long], Array[Long]) = {
    val rnd = new java.util.Random(0x5eed)
    val a = Array.fill(NumPerms)(rnd.nextLong() | 1L)
    val b = Array.fill(NumPerms)(rnd.nextLong())
    (a, b)
  }
  val As: Array[Long] = perms._1
  val Bs: Array[Long] = perms._2

  // one MessageDigest per thread; digest() resets the instance after use
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def first8BE(dig: Array[Byte]): Long =
    ((dig(0) & 0xffL) << 56) | ((dig(1) & 0xffL) << 48) |
      ((dig(2) & 0xffL) << 40) | ((dig(3) & 0xffL) << 32) |
      ((dig(4) & 0xffL) << 24) | ((dig(5) & 0xffL) << 16) |
      ((dig(6) & 0xffL) << 8) | (dig(7) & 0xffL)

  /** 64-perm MinHash signature of a string array — each element hashed
    * ONCE (md5-derived 64-bit, the engine-portable family — see
    * SimHashUtil.tokenHash64), then 64 affine permutations.
    * O(n + 64n cheap ops) vs O(64n) full rehashes of the naive form. */
  def signature(arr: ArrayData): ArrayData = {
    val mins = Array.fill(NumPerms)(-1L) // unsigned max
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i))
        update(mins, SimHashUtil.tokenHash64(arr.getUTF8String(i)))
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Signature over pre-hashed 64-bit shingles (array<long>). */
  def signatureLong(arr: ArrayData): ArrayData = {
    val mins = Array.fill(NumPerms)(-1L) // unsigned max
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) update(mins, arr.getLong(i))
      i += 1
    }
    new GenericArrayData(mins)
  }

  // UNSIGNED min per permutation: the oracle replays a_i*x + b_i as
  // nonnegative mod-2^64 HUGEINT values whose natural order IS the
  // unsigned order of the Java wrap-around bits — a signed min here
  // would diverge on every value with the top bit set.
  private def update(mins: Array[Long], x: Long): Unit = {
    var p = 0
    while (p < NumPerms) {
      val h = As(p) * x + Bs(p)
      if (java.lang.Long.compareUnsigned(h, mins(p)) < 0) mins(p) = h
      p += 1
    }
  }

  /** Distinct 64-bit hashes of each n consecutive tokens: the first 8
    * bytes (big-endian) of md5 over the space-joined shingle bytes —
    * exactly `md5(tok_i || ' ' || ... || tok_{i+n-1})`, which DuckDB
    * recomputes verbatim (then parses the 16 hex chars in HUGEINT), so
    * the whole LSH pipeline downstream of this hash is oracle-exact.
    * The digest streams over the token bytes — no shingle string is
    * ever built. md5 over ~20-byte shingles costs a few ns more than a
    * murmur mix; candidate-join shuffle dominates the dedup path. */
  def shingleHashes(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    val toks = new Array[Array[Byte]](len)
    var i = 0
    while (i < len) {
      toks(i) =
        if (arr.isNullAt(i)) Array.emptyByteArray
        else arr.getUTF8String(i).getBytes
      i += 1
    }
    val m = math.max(len - n + 1, 0)
    val set = new java.util.HashSet[java.lang.Long](m * 2)
    val digest = md.get()
    i = 0
    while (i < m) {
      digest.reset()
      var j = 0
      while (j < n) {
        if (j > 0) digest.update(' '.toByte)
        digest.update(toks(i + j))
        j += 1
      }
      set.add(first8BE(digest.digest()))
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
