package graft.ops

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** A-Res weighted sampling: agreement with an independent in-memory
  * reference, the weight-bias property it exists for, and
  * partitioning-determinism of the top-k.
  */
class WeightedSampleSpec extends SparkSpecBase {

  private def docs = Tables.documents(spark, sfDir)
    .select(col("doc_id"), col("n_chars"))

  /** Independent reference: same hash, same key, plain Scala sort. */
  private def refSample(rows: Seq[(Long, Long)], k: Int): Seq[Long] = {
    def key(id: Long, w: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val hv = java.lang.Long.parseLong(hex, 16) + 1L
      val lnu = BigDecimal(math.log(hv / 1152921504606846976.0))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      BigDecimal(lnu / w).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    rows.map { case (id, w) => (key(id, w), id) }
      .sortBy { case (s, id) => (-s, id) }.take(k).map(_._2)
  }

  test("matches the independent A-Res reference exactly") {
    val all = docs.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = CorpusFilters.weightedSample(docs, "doc_id", "n_chars", 50)
      .orderBy(col("skey").desc, col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got === refSample(all, 50))
  }

  test("inclusion is weight-biased: sampled docs are longer on average") {
    val sampleMean = CorpusFilters
      .weightedSample(docs, "doc_id", "n_chars", 50)
      .agg(avg("n_chars")).collect().head.getDouble(0)
    val corpusMean = docs.agg(avg("n_chars")).collect().head.getDouble(0)
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean not above corpus mean $corpusMean")
  }

  test("the sample is independent of input partitioning") {
    def ids(parts: Int) = CorpusFilters
      .weightedSample(docs.repartition(parts), "doc_id", "n_chars", 50)
      .orderBy(col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val a = ids(2)
    assert(a.length === 50)
    assert(a === ids(9))
  }
}
