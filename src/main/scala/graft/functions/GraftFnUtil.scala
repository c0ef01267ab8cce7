package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Row-local kernels behind the native Catalyst expressions. All of them
  * are called from whole-stage-generated Java (Scala objects expose static
  * forwarders), so each must be a pure static function of its arguments.
  *
  * Hash portability contract (shared with `graft.ops.Dedup` and the DuckDB
  * oracles): h32(s) = first 8 hex digits of md5(s) as an unsigned int —
  * i.e. the first 4 digest bytes big-endian. MinHash permutations are
  * h_i(x) = (a_i·x + b_i) mod P with the same a/b/P constants as
  * `Dedup.permA/permB/P`, so a per-row signature is bit-identical to the
  * explode + groupBy(min) formulation it replaces (min and ±1 bit sums are
  * order-independent — that is WHY these are per-row computable at all).
  */
object GraftFnUtil {

  private val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val wsPattern = Pattern.compile("\\s+")

  /** First 4 md5 bytes of the UTF-8 encoding, as an unsigned 32-bit value.
    * ≡ Spark `conv(substring(md5(s),1,8),16,10)` ≡ DuckDB
    * `CAST('0x'||substr(md5(s),1,8) AS BIGINT)`. */
  def h32(b: Array[Byte]): Long = {
    val d = mdLocal.get()
    d.reset()
    val out = d.digest(b)
    ((out(0) & 0xffL) << 24) | ((out(1) & 0xffL) << 16) |
      ((out(2) & 0xffL) << 8) | (out(3) & 0xffL)
  }

  /** Distinct word n-gram shingles; the whole text when shorter than n
    * words. Split semantics = Java regex `\s+` with limit -1, matching both
    * the former compiled-UDF form and Spark's `split` builtin. */
  def shingleStrings(t: String, n: Int): Array[String] = {
    val w = wsPattern.split(t, -1)
    if (w.length < n) Array(t)
    else w.sliding(n).map(_.mkString(" ")).toArray.distinct
  }

  /** Unicode NFC normalization (java.text.Normalizer — the JDK's ICU
    * tables; ≡ DuckDB `nfc_normalize` for the stable BMP sequences the
    * oracle exercises). The isNormalized fast path skips the rebuild —
    * ASCII (and any already-composed text) returns the input buffer
    * untouched, so at scan speed the common case costs one table walk. */
  def nfc(t: UTF8String): UTF8String = {
    val s = t.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) t
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  def shingles(t: UTF8String, n: Int): ArrayData =
    new GenericArrayData(
      shingleStrings(t.toString, n).map(UTF8String.fromString): Array[AnyRef])

  /** MinHash signature of the distinct 3-word shingles: per permutation i,
    * min over shingles of (a_i·h32 + b_i) mod P. Single pass, no shuffle. */
  def minhashSig(t: UTF8String, numPerms: Int): ArrayData = {
    val sh = shingleStrings(t.toString, 3)
    val hs = new Array[Long](sh.length)
    var i = 0
    while (i < sh.length) { hs(i) = h32(sh(i).getBytes(UTF_8)); i += 1 }
    val out = new Array[Long](numPerms)
    val P = graft.ops.Dedup.P
    var p = 0
    while (p < numPerms) {
      val a = graft.ops.Dedup.permA(p)
      val b = graft.ops.Dedup.permB(p)
      var m = Long.MaxValue
      var j = 0
      while (j < hs.length) {
        val v = (a * hs(j) + b) % P
        if (v < m) m = v
        j += 1
      }
      out(p) = m
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** 32-bit term-frequency-weighted SimHash over whitespace tokens: bit j
    * is 1 iff the sum over tokens of (±1 by bit j of h32(token)) is
    * positive. Single pass, no explode, no shuffle. */
  def simhash32(t: UTF8String): Long = {
    val toks = wsPattern.split(t.toString, -1)
    val counts = new Array[Int](32)
    var i = 0
    while (i < toks.length) {
      val h = h32(toks(i).getBytes(UTF_8))
      var j = 0
      while (j < 32) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var v = 0L
    var j = 0
    while (j < 32) { if (counts(j) > 0) v |= 1L << j; j += 1 }
    v
  }

  /** 64-bit SimHash: like simhash32 but over a 64-bit token hash built
    * from the first 8 md5 digest bytes big-endian — bits 32..63 come from
    * hex digits 1..8 (= h32) and bits 0..31 from digits 9..16, so the
    * DuckDB mirror computes both halves with the same nonneg 32-bit
    * CAST('0x'||substr(md5(tok),...,8) AS BIGINT) trick and recombines.
    * Bit 63 can be set, so the returned long may be negative (the signed
    * reinterpretation of the unsigned 64-bit signature). */
  def simhash64(t: UTF8String): Long = {
    val toks = wsPattern.split(t.toString, -1)
    val counts = new Array[Int](64)
    val d = mdLocal.get()
    var i = 0
    while (i < toks.length) {
      d.reset()
      val out = d.digest(toks(i).getBytes(UTF_8))
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (out(b) & 0xffL); b += 1 }
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var v = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) v |= 1L << j; j += 1 }
    v
  }

  /** Estimator-B token count (graft.text.Tokens.estimateB) for codegen. */
  def tokenEstB(t: UTF8String): Int = graft.text.Tokens.estimateB(t.toString)

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03)
    * over a Rabin–Karp rolling hash of character k-grams:
    *
    *  - code-point k-grams hashed with the rolling recurrence
    *    h' = ((h − c_out·B^(k−1))·B + c_in) mod M (B=131, M=1e9+7) — one
    *    O(n) pass, equal to per-gram Horner, which is how the DuckDB
    *    oracle recomputes it;
    *  - window minima over w consecutive gram hashes via a monotonic
    *    deque (O(n) total), consecutive duplicate minima collapsed —
    *    the winnowing guarantee that any ≥(w+k−1)-char match between two
    *    documents shares a fingerprint;
    *  - texts shorter than k fingerprint as one whole-text hash
    *    (empty → 0), mirroring the shingle short-text fallback.
    */
  def winnow(t: UTF8String, k: Int, w: Int): ArrayData = {
    val M = 1000000007L
    val B = 131L
    val cps = t.toString.codePoints().toArray
    val n = cps.length
    if (n < k) {
      var h = 0L
      var i = 0
      while (i < n) { h = (h * B + cps(i)) % M; i += 1 }
      return UnsafeArrayData.fromPrimitiveArray(Array(h))
    }
    // rolling gram hashes
    val m = n - k + 1
    val hs = new Array[Long](m)
    var bk1 = 1L
    var i = 0
    while (i < k - 1) { bk1 = bk1 * B % M; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = (h * B + cps(i)) % M; i += 1 }
    hs(0) = h
    i = 1
    while (i < m) {
      h = (((h - cps(i - 1) * bk1 % M + M) % M) * B + cps(i + k - 1)) % M
      hs(i) = h
      i += 1
    }
    if (m <= w) {
      var mn = hs(0)
      i = 1
      while (i < m) { if (hs(i) < mn) mn = hs(i); i += 1 }
      return UnsafeArrayData.fromPrimitiveArray(Array(mn))
    }
    // sliding-window minima (monotonic deque), consecutive dupes collapsed
    val out = new scala.collection.mutable.ArrayBuffer[Long](m - w + 1)
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0 // deque indices in [head, tail)
    i = 0
    while (i < m) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val mn = hs(deque(head))
        if (out.isEmpty || out(out.length - 1) != mn) out += mn
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out.toArray)
  }

  /** All T random-hyperplane bucket signatures of one vector in a single
    * pass: element t = Σ_p (dot(v, planes[t·b+p]) > 0 ? 1<<p : 0) over
    * b = planesPerTable. Bit-identical to the per-plane
    * `when(graft_dot(v, plane) > 0, 1<<p).otherwise(0)` + sum formulation
    * it replaces (same left-to-right dot order, same >0 compare) — that
    * formulation inlined T×b dot loops into ONE generated consume method
    * and blew janino's 64 KB method limit at adaptive table counts
    * (T ≈ 400 at n=20k, threshold 0.85), dropping the hottest stage of
    * candidate generation out of whole-stage codegen entirely.
    *
    * Null semantics replicate the old per-plane dots exactly: a null
    * vector, a null element, or a length≠dims vector made every dot null,
    * so every `when` fell to otherwise(0) — here: all-zero buckets. */
  def rhpSignature(v: ArrayData, planes: Array[Array[Double]],
      planesPerTable: Int): ArrayData = {
    val tables = planes.length / planesPerTable
    val out = new Array[Int](tables)
    if (v != null && planes.nonEmpty) {
      val n = v.numElements()
      if (n == planes(0).length) {
        var hasNull = false
        var i = 0
        while (i < n && !hasNull) { if (v.isNullAt(i)) hasNull = true; i += 1 }
        if (!hasNull) {
          val x = new Array[Double](n)
          i = 0
          while (i < n) { x(i) = v.getDouble(i); i += 1 }
          var t = 0
          while (t < tables) {
            var b = 0
            var p = 0
            while (p < planesPerTable) {
              val w = planes(t * planesPerTable + p)
              var s = 0.0
              var d = 0
              while (d < n) { s += x(d) * w(d); d += 1 }
              if (s > 0) b += (1 << p)
              p += 1
            }
            out(t) = b
            t += 1
          }
        }
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
