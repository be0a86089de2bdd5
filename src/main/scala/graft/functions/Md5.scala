package graft.functions

/** Thread-local MD5 reuse for the sketch aggregates' per-row hashing.
  *
  * `MessageDigest.getInstance("MD5")` walks the JCA provider registry
  * and allocates on every call — measurable when an aggregate calls it
  * once per input row (q08c/ev16 at sf0.1 ≈ 600k rows). `digest()`
  * resets the instance after each computation, so one instance per
  * thread is safe to reuse; ThreadLocal because a plan fragment (and
  * the expression tree inside it) can be shared across executor task
  * threads in local mode.
  */
private[functions] object Md5 {
  private val tl = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** md5 bytes of the UTF-8 encoding of `s`. */
  def digest(s: String): Array[Byte] = tl.get().digest(s.getBytes("UTF-8"))
}
