package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** Column API + registration for the native expressions.
  *
  * Two installation paths:
  *  - `GraftFunctions.install(spark)` — idempotent runtime registration
  *    (used by SparkEntry/Verify/Bench and the test base);
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` — config-time
  *    injection for clusters, the standard `SparkSessionExtensions` route.
  * After either, the functions are callable from SQL as `graft_*`.
  */
object GraftFunctions {

  private def c(e: Expression): Column = GraftSqlBridge.column(e)
  private def e(col: Column): Expression = GraftSqlBridge.expression(col)

  def dot(a: Column, b: Column): Column = c(ArrayDotProduct(e(a), e(b)))
  def norm(v: Column): Column = c(ArrayNormL2(e(v)))
  def shingles(text: Column, n: Int = 3): Column = c(WordShingles(e(text), n))
  def nfc(text: Column): Column = c(NfcNormalize(e(text)))
  def minhashSig(text: Column, numPerms: Int = 8): Column =
    c(MinHashSignature(e(text), numPerms))
  def simhash32(text: Column): Column = c(SimHash32(e(text)))
  def simhash64(text: Column): Column = c(SimHash64(e(text)))
  def tokenEstimateB(text: Column): Column = c(TokenEstimateB(e(text)))
  def winnow(text: Column, k: Int = 8, w: Int = 8): Column =
    c(WinnowFingerprints(e(text), k, w))
  /** Not in the SQL registry: the plane matrix is a driver-side constant
    * (md5-derived), not something a SQL literal can carry. */
  def rhpSignature(v: Column, planes: Array[Array[Double]],
      planesPerTable: Int): Column =
    c(RhpSignature(e(v), planes, planesPerTable))

  private def intLit(x: Expression, what: String): Int = x match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** name → SQL builder, shared by both installation paths. */
  val registry: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> { case Seq(a, b) => ArrayDotProduct(a, b)
      case args => throw new IllegalArgumentException(
        s"graft_dot expects 2 arguments, got ${args.length}") },
    "graft_norm" -> { case Seq(a) => ArrayNormL2(a)
      case args => throw new IllegalArgumentException(
        s"graft_norm expects 1 argument, got ${args.length}") },
    "graft_shingles" -> {
      case Seq(t) => WordShingles(t, 3)
      case Seq(t, n) => WordShingles(t, intLit(n, "shingle width"))
      case args => throw new IllegalArgumentException(
        s"graft_shingles expects 1-2 arguments, got ${args.length}") },
    "graft_minhash_sig" -> {
      case Seq(t) => MinHashSignature(t, 8)
      case Seq(t, n) => MinHashSignature(t, intLit(n, "numPerms"))
      case args => throw new IllegalArgumentException(
        s"graft_minhash_sig expects 1-2 arguments, got ${args.length}") },
    "graft_nfc" -> { case Seq(t) => NfcNormalize(t)
      case args => throw new IllegalArgumentException(
        s"graft_nfc expects 1 argument, got ${args.length}") },
    "graft_simhash32" -> { case Seq(t) => SimHash32(t)
      case args => throw new IllegalArgumentException(
        s"graft_simhash32 expects 1 argument, got ${args.length}") },
    "graft_simhash64" -> { case Seq(t) => SimHash64(t)
      case args => throw new IllegalArgumentException(
        s"graft_simhash64 expects 1 argument, got ${args.length}") },
    "graft_token_est_b" -> { case Seq(t) => TokenEstimateB(t)
      case args => throw new IllegalArgumentException(
        s"graft_token_est_b expects 1 argument, got ${args.length}") },
    "graft_winnow" -> {
      case Seq(t) => WinnowFingerprints(t, 8, 8)
      case Seq(t, k, w) =>
        WinnowFingerprints(t, intLit(k, "gram size"), intLit(w, "window"))
      case args => throw new IllegalArgumentException(
        s"graft_winnow expects 1 or 3 arguments, got ${args.length}") })

  /** Runtime registration (functions + the MintRank planner strategy);
    * safe to call repeatedly. */
  def install(spark: SparkSession): Unit = {
    registry.foreach { case (name, builder) =>
      GraftSqlBridge.registerFunction(spark, name, builder)
    }
    graft.plans.MintRank.install(spark)
  }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.registry.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder))
    }
    ext.injectPlannerStrategy(_ => graft.plans.MintRank.Strategy)
    // default-off runtime cartesian ban (spark.graft.guard.cartesian)
    ext.injectOptimizerRule(_ => graft.plans.CartesianGuard.Rule)
  }
}
