package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** The native expressions must be drop-in equal to the formulations they
  * replaced: HOF dot/norm (bit-level — same fold order), the shingle UDF,
  * the explode+groupBy MinHash/SimHash plans, and the HOF token estimator.
  * Also pins SQL registration (both install() and the
  * SparkSessionExtensions path) and that the plans stay codegen'd
  * projections with no exchange.
  */
class GraftFunctionsSpec extends SparkSpecBase {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one"),
      (3L, ""),
      (4L, "  leading and trailing  "),
      (5L, "Revenue grew 12.5% — strong, resilient; margins (gross) up."),
      (6L, ("lorem ipsum dolor sit amet " * 40).trim)
    ).toDF("doc_id", "text")
  }

  test("dot/norm match the HOF fold bit-for-bit") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(0.1, -0.2, 0.3, 0.7), Array(0.5, 0.4, -0.3, 0.2)),
      (2L, Array(1e-9, 2e9, -3.3, 0.0), Array(7.7, -1e-8, 2.2, 9.9)),
      (3L, Array.fill(64)(0.123456789), Array.fill(64)(-0.987654321))
    ).toDF("id", "a", "b")
    val hofDot = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val hofNorm = sqrt(aggregate(col("a"), lit(0.0), (acc, x) => acc + x * x))
    val rows = vecs.select(
      GraftFunctions.dot(col("a"), col("b")).as("nd"), hofDot.as("hd"),
      GraftFunctions.norm(col("a")).as("nn"), hofNorm.as("hn")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
  }

  test("dot null semantics: length mismatch and null elements yield null") {
    import spark.implicits._
    val df = Seq(
      (Array[java.lang.Double](1.0, 2.0), Array[java.lang.Double](1.0)),
      (Array[java.lang.Double](1.0, null), Array[java.lang.Double](1.0, 2.0))
    ).toDF("a", "b")
    val out = df.select(GraftFunctions.dot(
      col("a").cast("array<double>"), col("b").cast("array<double>"))).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("shingles match the former UDF logic, including short/empty texts") {
    val udfForm = udf((t: String) => {
      if (t == null) Array.empty[String]
      else {
        val w = t.split("\\s+", -1)
        if (w.length < 3) Array(t)
        else w.sliding(3).map(_.mkString(" ")).toArray.distinct
      }
    })
    val rows = docs.select(
      GraftFunctions.shingles(col("text")).as("native"),
      udfForm(col("text")).as("old")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("per-row minhash equals the explode+groupBy(min) formulation") {
    import graft.ops.Dedup
    val exploded = docs
      .select(col("doc_id"), explode(GraftFunctions.shingles(col("text"))).as("shingle"))
      .withColumn("h", Dedup.h32(col("shingle")))
    val aggs = (0 until 8).map(i =>
      min((lit(Dedup.permA(i)) * col("h") + lit(Dedup.permB(i))) % lit(Dedup.P)).as(s"m$i"))
    val oldForm = exploded.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .orderBy("doc_id").collect()
    val newForm = Dedup.minhashSignature(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(newForm.map(_.toSeq).toSeq == oldForm.map(_.toSeq).toSeq)
  }

  test("per-row simhash equals the explode+bit-sum formulation") {
    import graft.ops.Dedup
    val exploded = docs
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("tok"))
      .withColumn("h", Dedup.h32(col("tok")))
    val bitSums = (0 until 32).map(j =>
      sum(when(shiftright(col("h"), j) % 2 === 1, 1).otherwise(-1)).as(s"s$j"))
    val agg = exploded.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val value = (0 until 32).map(j =>
      when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    val oldForm = agg.withColumn("simhash", value)
      .select("doc_id", "simhash").orderBy("doc_id").collect()
    val newForm = Dedup.simhash32(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(newForm.map(_.toSeq).toSeq == oldForm.map(_.toSeq).toSeq)
  }

  test("token estimator column equals the pure Scala estimator") {
    val rows = docs.select(col("text"),
      graft.text.Tokens.estimateBCol(col("text")).as("est")).collect()
    rows.foreach { r =>
      assert(r.getInt(1) == graft.text.Tokens.estimateB(r.getString(0)))
    }
  }

  test("per-row minhash/simhash plans are exchange-free codegen'd projections") {
    import graft.ops.Dedup
    // a real file scan — a local relation would be constant-folded away
    val scanned = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    for (df <- Seq(Dedup.minhashSignature(scanned, "doc_id", "text"),
        Dedup.simhash32(scanned, "doc_id", "text"))) {
      val physical = df.queryExecution.executedPlan
      val rendered = physical.toString
      assert(!rendered.contains("Exchange"), rendered)
      assert(!rendered.contains("ScalaUDF"), rendered)
      // codegen stages render as "*(n)"; also assert structurally
      assert(physical.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]),
        rendered)
    }
  }

  test("SQL registration via install(): graft_* callable from SQL") {
    // drop one function first so this run proves install() itself (the
    // session had them injected at build time via GraftExtensions)
    assert(org.apache.spark.sql.GraftSqlBridge.dropFunction(spark, "graft_simhash32"))
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_simhash32('x')").collect()
    }
    GraftFunctions.install(spark)
    docs.createOrReplaceTempView("gf_docs")
    val row = spark.sql(
      """SELECT graft_simhash32(text) AS sh,
        |       graft_token_est_b(text) AS est,
        |       size(graft_shingles(text, 3)) AS ns,
        |       size(graft_minhash_sig(text, 8)) AS nm,
        |       size(graft_winnow(text, 8, 8)) AS nw,
        |       graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       graft_norm(array(3.0d, 4.0d)) AS n
        |FROM gf_docs WHERE doc_id = 5""".stripMargin).collect()(0)
    assert(row.getAs[Long]("sh") == GraftFnUtil.simhash32(
      org.apache.spark.unsafe.types.UTF8String.fromString(
        "Revenue grew 12.5% — strong, resilient; margins (gross) up.")))
    assert(row.getAs[Double]("d") == 11.0)
    assert(row.getAs[Double]("n") == 5.0)
    assert(row.getAs[Int]("nm") == 8)
    assert(row.getAs[Int]("nw") >= 1)
  }

  test("SparkSessionExtensions path registers the functions at session build") {
    // The shared test session is built with
    // spark.sql.extensions=graft.functions.GraftExtensions and never calls
    // install() — resolution here proves the injection path end to end.
    // (Extensions are static conf: they apply only when the session is
    // constructed, so this cannot be tested on a second session over the
    // already-running shared SparkContext.)
    assert(spark.conf.get("spark.sql.extensions") ==
      "graft.functions.GraftExtensions")
    val v = spark.sql("SELECT graft_token_est_b('alpha beta gamma') AS t")
      .collect()(0).getInt(0)
    assert(v == graft.text.Tokens.estimateB("alpha beta gamma"))
  }
}
