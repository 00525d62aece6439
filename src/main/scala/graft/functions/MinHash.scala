package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash kernel: shingle-set (array<string>) -> signature (array<long>).
  *
  * One tight JVM loop per row replaces 128 interpreted higher-order
  * `transform` lambdas (measured 56 s -> sub-second at sf0.01). The hash
  * family is (a_i * x + b_i) mod p over a 64-bit FNV-1a of each shingle,
  * with fixed seed-42 coefficients — deterministic on any partition layout.
  */
object MinHashKernel {
  val Prime: Long = 2147483647L // 2^31 - 1

  def coefficients(numHashes: Int): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(42)
    val a = Array.fill(numHashes)(1L + rnd.nextInt(Int.MaxValue - 1).toLong)
    val b = Array.fill(numHashes)(rnd.nextInt(Int.MaxValue).toLong)
    (a, b)
  }

  // cached per numHashes (tiny; only one size in practice)
  private val cache = new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  def cached(numHashes: Int): (Array[Long], Array[Long]) =
    cache.computeIfAbsent(numHashes, n => coefficients(n))

  private def fnv64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Estimated Jaccard = fraction of equal signature components. With 128
    * hashes the estimate of a true-Jaccard-j pair is Binomial(128, j)/128
    * (sd ≈ 0.044 at j=0.5), so a floor well below the query threshold
    * rejects the low-similarity candidate mass at ~zero false-negative
    * risk — the cheap pre-filter before the exact gram-set verification.
    */
  def estJaccard(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    if (n == 0) return 0.0
    var eq = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) eq += 1
      i += 1
    }
    eq.toDouble / n
  }

  /** Signature of a shingle array; empty input -> all-Prime sentinel. */
  def signature(grams: ArrayData, numHashes: Int): ArrayData = {
    val (a, b) = cached(numHashes)
    val out = Array.fill(numHashes)(Prime)
    val n = grams.numElements()
    var g = 0
    while (g < n) {
      val s = grams.getUTF8String(g)
      if (s != null) {
        // non-negative 31-bit input keeps a*x+b < 2^63 (no overflow)
        val x = (fnv64(s) & 0x7fffffffL)
        var i = 0
        while (i < numHashes) {
          val v = (a(i) * x + b(i)) % Prime
          if (v < out(i)) out(i) = v
          i += 1
        }
      }
      g += 1
    }
    new GenericArrayData(out)
  }

  /** One-pass signature straight from text: slides a `gramLen`-CHARACTER
    * window over the UTF-8 payload (windows aligned to code-point starts,
    * so each window's bytes are exactly the UTF-8 encoding of the
    * character gram — the hash matches `fnv64(gram)` on any corpus, not
    * just ASCII), FNV-hashes each window, updates the running minima. No
    * gram materialization, no per-gram UTF8String allocation, no
    * `array_distinct` (min over a multiset equals min over the set) —
    * this is the candidate-generation kernel; exact verification still
    * uses real character grams.
    */
  def signatureFromText(text: UTF8String, gramLen: Int, numHashes: Int): ArrayData = {
    val (a, b) = cached(numHashes)
    val out = Array.fill(numHashes)(Prime)
    val bytes = text.getBytes
    // offsets of each character start, plus the terminal offset
    val starts = new Array[Int](text.numChars() + 1)
    var p = 0
    var c = 0
    while (p < bytes.length) {
      starts(c) = p
      p += UTF8String.numBytesForFirstByte(bytes(p))
      c += 1
    }
    starts(c) = bytes.length
    val nGrams = c - gramLen + 1
    var g = 0
    while (g < nGrams) {
      var h = 0xcbf29ce484222325L
      var j = starts(g)
      val end = starts(g + gramLen)
      while (j < end) { h ^= (bytes(j) & 0xffL); h *= 0x100000001b3L; j += 1 }
      val x = h & 0x7fffffffL
      var i = 0
      while (i < numHashes) {
        val v = (a(i) * x + b(i)) % Prime
        if (v < out(i)) out(i) = v
        i += 1
      }
      g += 1
    }
    new GenericArrayData(out)
  }
}

/** `minhash_sig(array<string>, numHashes)` as a native expression. */
case class MinHashSignature(child: Expression, numHashesExpr: Expression)
    extends BinaryExpression with Serializable {
  override def prettyName: String = "minhash_sig"
  override def left: Expression = child
  override def right: Expression = numHashesExpr
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(g: Any, n: Any): Any =
    MinHashKernel.signature(g.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (g, n) =>
      s"${ev.value} = graft.functions.MinHashKernel.signature($g, $n);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(child = l, numHashesExpr = r)
}

/** `minhash_text(string, gramLen, numHashes)` — one-pass signature from
  * raw text (see [[MinHashKernel.signatureFromText]]).
  */
case class MinHashText(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with Serializable {
  override def prettyName: String = "minhash_text"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(t: Any, g: Any, n: Any): Any =
    MinHashKernel.signatureFromText(
      t.asInstanceOf[UTF8String], g.asInstanceOf[Int], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, g, n) =>
      s"${ev.value} = graft.functions.MinHashKernel.signatureFromText($t, $g, $n);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** `sig_jaccard_est(array<long>, array<long>)` — componentwise-equality
  * fraction of two MinHash signatures (unbiased Jaccard estimator).
  */
case class SigJaccardEst(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def prettyName: String = "sig_jaccard_est"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    MinHashKernel.estJaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.MinHashKernel.estJaccard($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
