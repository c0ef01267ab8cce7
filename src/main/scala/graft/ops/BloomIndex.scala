package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.ShiftLeft

/** Partition-level Bloom-filter skip index — "which partitions of a
  * 100 TB fact table MIGHT contain this key?" answered from a
  * metadata-scale artifact instead of a full scan.
  *
  * A min/max zone map (Layout.fileStats) prunes range predicates; it is
  * useless for point lookups on a high-cardinality key spread across
  * every partition's range (a customer id hits every month's min/max
  * span). The Bloom index stores, per partition, an m-bit filter over
  * the partition's distinct keys: probing costs k hash lookups against
  * partitions × (m/63) long words, guarantees NO false negatives, and
  * bounds false positives by (1 − e^{−kn/m})^k.
  *
  * Engine shape: the filter words are built as SUM of DISTINCT
  * single-bit masks (a sum of distinct powers of two IS the bitwise OR)
  * — a plain two-level aggregation that map-side combines, needs no
  * bit_or aggregate, and is exactly reproducible in DuckDB from the
  * portable md5-prefix hash, so the whole index and probe surface is
  * hash-compare oracle-checkable. Bits live at positions p ∈ [0, m):
  * word p div 63, bit p mod 63 — 63-bit words sidestep the sign bit,
  * keeping every mask positive in both engines' BIGINT.
  *
  * Scale: building is one distinct + one groupBy over (partition,
  * word); the index is partitions × m/63 rows (metadata). Probing
  * broadcasts the index under the probe stream — never the reverse.
  */
object BloomIndex {

  /** Usable bits per stored long word (sign bit never set). */
  val WordBits = 63

  /** Portable position of `key` under `seed` in an m-bit filter. */
  def positionOf(key: Column, seed: Column, mBits: Int): Column =
    pmod(
      conv(substring(md5(concat(seed.cast("string"), lit(":"),
        key.cast("string"))), 1, 15), 16, 10).cast("long"),
      lit(mBits.toLong))

  /** Variable-distance shift (functions.shiftleft only takes a literal
    * Int distance). */
  private def shl(a: Column, bits: Column): Column =
    GraftSqlBridge.column(ShiftLeft(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(bits)))

  private def maskOf(pos: Column): Column =
    shl(lit(1L), pmod(pos, lit(WordBits.toLong)).cast("int"))

  private def wordOf(pos: Column): Column =
    Layout.idiv(pos, lit(WordBits.toLong))

  /** Build the per-partition Bloom index of `keyCol` grouped by
    * `partCol`: one row per (part, non-zero word) with the OR of its
    * bits. `mBits` must be a multiple of 63. */
  def build(df: DataFrame, partCol: String, keyCol: String,
      mBits: Int, k: Int): DataFrame = {
    require(mBits % WordBits == 0, s"mBits $mBits not a multiple of 63")
    require(k >= 1, s"need at least one hash, got $k")
    df.select(col(partCol).as("part"), col(keyCol).as("__k")).distinct()
      .select(col("part"),
        explode(array((0 until k).map(lit): _*)).as("seed"), col("__k"))
      .withColumn("pos", positionOf(col("__k"), col("seed"), mBits))
      .select(col("part"), wordOf(col("pos")).as("word"),
        maskOf(col("pos")).as("mask"))
      .distinct() // distinct single-bit masks -> their sum is the OR
      .groupBy(col("part"), col("word"))
      .agg(sum(col("mask")).cast("long").as("bits"))
  }

  /** The build, restated as a duplicate-insensitive running OR
    * (`bit_or` aggregate) — no key-level distinct, so the identical
    * plan runs under readStream/complete with state bounded at
    * partitions × m/63 words forever: the streaming face of the index
    * (new fact rows OR their bits in as they arrive; a bit already set
    * absorbs re-arrivals). Batch output is row-identical to `build`
    * (OR of masks ≡ sum of distinct masks — BloomStreamSpec pins both
    * equalities). */
  def buildIncremental(df: DataFrame, partCol: String, keyCol: String,
      mBits: Int, k: Int): DataFrame = {
    require(mBits % WordBits == 0, s"mBits $mBits not a multiple of 63")
    require(k >= 1, s"need at least one hash, got $k")
    df.select(col(partCol).as("part"), col(keyCol).as("__k"))
      .select(col("part"),
        explode(array((0 until k).map(lit): _*)).as("seed"), col("__k"))
      .withColumn("pos", positionOf(col("__k"), col("seed"), mBits))
      .select(col("part"), wordOf(col("pos")).as("word"),
        maskOf(col("pos")).as("mask"))
      .groupBy(col("part"), col("word"))
      .agg(expr("bit_or(mask)").as("bits"))
  }

  /** Candidate (probe, part) pairs: parts where EVERY one of the k
    * probe positions finds its bit set. Partitions missing a probed
    * word row (all-zero word) drop out of the inner join — exactly the
    * "bit not set" verdict. The index is broadcast (metadata-scale);
    * probes keep all their columns. SET semantics: probes are grouped
    * by their full column tuple, so duplicate probe rows collapse to
    * one candidate row per (probe-tuple, part) — carry a distinct
    * request id column if per-row multiplicity matters downstream. */
  def mightContain(index: DataFrame, probes: DataFrame, keyCol: String,
      mBits: Int, k: Int): DataFrame = {
    val probeCols = probes.columns.map(col).toSeq
    probes
      .select(probeCols :+
        explode(array((0 until k).map(lit): _*)).as("seed"): _*)
      .withColumn("pos", positionOf(col(keyCol), col("seed"), mBits))
      .withColumn("word", wordOf(col("pos")))
      .withColumn("mask", maskOf(col("pos")))
      .join(broadcast(index), Seq("word"))
      .filter(col("bits").bitwiseAND(col("mask")) =!= 0L)
      .groupBy(probeCols :+ col("part"): _*)
      .agg(countDistinct(col("seed")).as("__hits"))
      .filter(col("__hits") === k)
      .drop("__hits")
  }
}
