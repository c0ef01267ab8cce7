package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the engine's hot scalar kernels.
  *
  * Preference order per the Spark-first design: builtin functions, then a
  * native `Expression` with `doGenCode` (stays inside whole-stage codegen,
  * no ScalaUDF encoder round-trip, no interpreted higher-order-function
  * fallback), then UDF. These replace the two spots that previously needed
  * a compiled UDF (shingles) or interpreted HOFs (array dot/norm — Spark's
  * `aggregate`/`zip_with` are CodegenFallback), and make MinHash/SimHash
  * per-row projections instead of explode + shuffle + groupBy plans.
  *
  * Null semantics: all are null-intolerant (null in → null out), matching
  * the HOF formulations they replace; length-mismatched arrays and null
  * elements yield null like `zip_with` + `aggregate` would.
  */

/** Dot product of two array<double> columns — left-to-right summation,
  * bit-identical to `aggregate(zip_with(a,b,(x,y)=>x*y),0d,(s,x)=>s+x)`. */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) { ${ev.isNull} = true; }
         |else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** L2 norm of an array<double> — `sqrt(aggregate(v,0d,(s,x)=>s+x*x))`. */
case class ArrayNormL2(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_norm"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = x.getDouble(i)
      s += v * v
      i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $x.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  final double $v = $x.getDouble($i);
         |  $s += $v * $v;
         |}
         |if (!${ev.isNull}) { ${ev.value} = java.lang.Math.sqrt($s); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct word n-gram shingles (Dedup contract; whole text if < n words). */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"graft_shingles: shingle width must be >= 1, got $n")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any =
    GraftFnUtil.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftFnUtil.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode NFC normalization — the normalize-before-dedup/tokenize
  * stage Spark has no public function for (collation internals only).
  * Codegen'd static call; the ASCII/already-composed fast path returns
  * the input buffer untouched. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any =
    GraftFnUtil.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftFnUtil.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-row MinHash signature (array<bigint> of length numPerms). */
case class MinHashSignature(child: Expression, numPerms: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(numPerms >= 1 && numPerms <= 1024,
    s"graft_minhash_sig: numPerms must be in [1, 1024], got $numPerms")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    GraftFnUtil.minhashSig(input.asInstanceOf[UTF8String], numPerms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftFnUtil.minhashSig($c, $numPerms)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-row 32-bit SimHash over whitespace tokens. */
case class SimHash32(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash32"

  override protected def nullSafeEval(input: Any): Any =
    GraftFnUtil.simhash32(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftFnUtil.simhash32($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-row 64-bit SimHash over whitespace tokens (token hash = first 16
  * md5 hex digits, i.e. two h32 halves — the split keeps every derived
  * quantity the DuckDB oracle needs inside non-negative 32-bit math). */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any =
    GraftFnUtil.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftFnUtil.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing fingerprints over a Rabin–Karp rolling hash of character
  * k-grams (window-min selection, consecutive dupes collapsed). One O(n)
  * codegen'd pass per row — see GraftFnUtil.winnow for the algorithm. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1, s"graft_winnow: gram size k must be >= 1, got $k")
  require(w >= 1, s"graft_winnow: window w must be >= 1, got $w")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override protected def nullSafeEval(input: Any): Any =
    GraftFnUtil.winnow(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftFnUtil.winnow($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Estimator-B token count (T2) as one codegen'd call — replaces the
  * interpreted `regexp_extract_all` + `aggregate` HOF formulation. */
case class TokenEstimateB(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_token_est_b"

  override protected def nullSafeEval(input: Any): Any =
    GraftFnUtil.tokenEstB(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftFnUtil.tokenEstB($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All T random-hyperplane bucket signatures of a vector in ONE loop-based
  * kernel call: array<int> of length planes.length/planesPerTable, element
  * t = Σ_p (dot(v, plane_{t,p}) > 0 ? 1<<p : 0). Replaces the T×b-separate
  * `when(graft_dot(v, lit-array) > 0, …)` projection whose inlined dot
  * loops overflowed janino's 64 KB method limit at adaptive table counts
  * (T grows with ln recall / p^b — ~400 tables at 20k vectors, θ=0.85),
  * knocking the candidate-generation stage out of whole-stage codegen.
  * The plane matrix rides along as a driver-broadcast reference object,
  * not as expression-tree literals, so generated code size is CONSTANT in
  * T×b. Arithmetic is bit-identical to the per-plane dots (same
  * left-to-right summation, same >0 compare), and the old null semantics
  * are preserved: null vector / null element / length≠dims made every
  * per-plane dot null so every bucket summed to 0 — here, all-zero output
  * (hence nullable=false and a custom eval instead of nullSafeEval). */
case class RhpSignature(child: Expression, planes: Array[Array[Double]],
    planesPerTable: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(planesPerTable >= 1 && planesPerTable <= 31,
    s"graft_rhp_signature: planesPerTable must be in [1, 31], got $planesPerTable")
  require(planes.nonEmpty && planes.length % planesPerTable == 0,
    s"graft_rhp_signature: ${planes.length} planes not a multiple of " +
      s"planesPerTable=$planesPerTable")

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_rhp_signature"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    GraftFnUtil.rhpSignature(
      if (v == null) null else v.asInstanceOf[ArrayData], planes, planesPerTable)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val planesRef = ctx.addReferenceObj("rhpPlanes", planes, "double[][]")
    val resultCode =
      code"""
         |${childGen.code}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  graft.functions.GraftFnUtil.rhpSignature(
         |    ${childGen.isNull} ? null : ${childGen.value},
         |    $planesRef, $planesPerTable);
       """.stripMargin
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
