package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded-state cardinality sketches. At corpus scale you cannot
  * `COUNT(DISTINCT ...)` a 100 TB token stream — the distinct values
  * themselves would shuffle. A k-minimum-values (KMV) sketch keeps only
  * the k smallest distinct hash values per group: the partial state is
  * ≤ k longs regardless of input size, it map-side combines, and the
  * merge of two sketches is a sorted-merge truncation — exactly the
  * algebra Spark's typed `Aggregator` distributes. The estimator
  * (Bar-Yossef et al. 2002): with h_k the k-th smallest of distinct
  * uniform hashes over [0, M), E[distinct] ≈ (k−1)·M / h_k.
  *
  * Unlike HLL (`approx_count_distinct`), the KMV state is a plain
  * deterministic set-function of the input values — independent of
  * partitioning and merge order — so the whole report is exact-compare
  * oracle-checkable against DuckDB rebuilding the same sketch in SQL.
  */
object Sketches {

  /** Hash space: 60-bit md5 prefix (15 hex chars), portable across
    * engines (`conv(hex,16,10)` ≡ DuckDB `CAST('0x'||hex AS BIGINT)`). */
  val HashBits = 60
  val HashSpace: Double = 1152921504606846976d // 2^60, exact as a double

  /** Mergeable KMV state: a sorted array of at most k distinct hashes.
    * `reduce` is a binary-search insert that rejects anything not below
    * the current max once full; `merge` is a deduping sorted merge cut
    * at k. Both are order-insensitive, so the result is deterministic
    * under any partitioning. */
  class KmvAggregator(k: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k >= 2, s"KMV needs k >= 2, got $k")

    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      val idx = java.util.Arrays.binarySearch(buf, h)
      if (idx >= 0) buf // already in the sketch
      else {
        val ins = -idx - 1
        if (buf.length >= k && ins >= k) buf // not below the current max
        else {
          val out = new Array[Long](math.min(buf.length + 1, k))
          System.arraycopy(buf, 0, out, 0, math.min(ins, out.length))
          if (ins < out.length) {
            out(ins) = h
            System.arraycopy(buf, ins, out, ins + 1, out.length - ins - 1)
          }
          out
        }
      }
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var n = 0
      var last = 0L; var seen = false
      while (n < out.length && (i < a.length || j < b.length)) {
        val v =
          if (j >= b.length || (i < a.length && a(i) <= b(j))) {
            val x = a(i); i += 1; x
          } else { val x = b(j); j += 1; x }
        if (!seen || v != last) { out(n) = v; n += 1; last = v; seen = true }
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }

    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** Per-group distinct-count report from a 60-bit-hash column: sketch
    * size, the k-th minimum, the KMV estimate, the exact distinct count
    * (audit column — the one thing here that would NOT run at 100 TB;
    * it exists to oracle-check the estimate), and the relative error.
    * Groups with fewer than k distinct hashes hold them all, so the
    * "estimate" is exact there by construction. */
  def kmvDistinct(df: DataFrame, groupCol: String, hashCol: String,
      k: Int): DataFrame = {
    val kmv = udaf(new KmvAggregator(k), Encoders.scalaLong)
    val est = when(col("sketch_size") < k, col("sketch_size").cast("double"))
      .otherwise(round(
        lit((k - 1).toDouble) * lit(HashSpace) /
          col("kth_hash").cast("double"), 4))
    df.groupBy(col(groupCol))
      .agg(kmv(col(hashCol)).as("sketch"),
        countDistinct(col(hashCol)).as("exact_distinct"))
      .select(col(groupCol),
        size(col("sketch")).cast("long").as("sketch_size"),
        when(size(col("sketch")) >= k, element_at(col("sketch"), k))
          .as("kth_hash"),
        col("exact_distinct"))
      .withColumn("est_distinct", est)
      .withColumn("rel_err",
        round(abs(col("est_distinct") - col("exact_distinct")) /
          col("exact_distinct").cast("double"), 6))
      .select(col(groupCol), col("sketch_size"), col("kth_hash"),
        col("est_distinct"), col("exact_distinct"), col("rel_err"))
  }

  /** Join-key overlap estimation from two KMV sketches (the KMV
    * set-operation synopsis of Beyer et al. 2007) — the pre-join
    * planning question "how selective is this join?" answered without
    * touching either table beyond one bounded-state pass: sketch each
    * side's distinct key hashes (≤ k longs of state), merge-truncate to
    * the union sketch, estimate |A ∪ B| from its k-th minimum, and
    * estimate |A ∩ B| as ρ·|A ∪ B| where ρ is the fraction of union-
    * sketch members present in BOTH side sketches. The two sketch
    * collects are metadata-scale (≤ k longs each — the engine's
    * quantizer-collect budget); the exact audit columns are the one
    * thing here that would NOT run at 100 TB.
    *
    * Deterministic end to end (sketches are set functions, the
    * estimator is fixed-order double arithmetic with HALF_UP rounds),
    * so the whole report is hash-oracle-checkable. */
  def kmvOverlap(a: DataFrame, keyA: String, b: DataFrame, keyB: String,
      k: Int): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    def hashed(df: DataFrame, c: String): DataFrame =
      // a NULL key is "no key": md5(NULL) would ride through as a NULL
      // hash and reach the aggregator's primitive-long encoder as 0 —
      // a silent phantom key shared by every null row on both sides
      df.filter(col(c).isNotNull)
        .select(conv(substring(
          md5(col(c).cast("string").cast("binary")), 1, 15), 16, 10)
          .cast("long").as("hv"))
    val kmv = udaf(new KmvAggregator(k), Encoders.scalaLong)
    def round4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def est(s: Array[Long]): Double =
      if (s.length < k) s.length.toDouble
      else round4((k - 1).toDouble * HashSpace / s(k - 1).toDouble)
    val ha = hashed(a, keyA)
    val hb = hashed(b, keyB)
    // ONE job sketches both sides: tag, union, groupBy(tag) — the
    // bounded partials (<= k longs each) still combine map-side, and
    // the driver collects two rows instead of running two jobs
    // (r10 shipped this as two sequential agg/collect jobs).
    val sides = ha.withColumn("__side", lit(0))
      .unionByName(hb.withColumn("__side", lit(1)))
      .groupBy(col("__side")).agg(kmv(col("hv")).as("__s"))
      .collect()
      .map(r => r.getInt(0) -> r.getAs[scala.collection.Seq[Long]](1).toArray)
      .toMap
    val sa = sides.getOrElse(0, Array.empty[Long])
    val sb = sides.getOrElse(1, Array.empty[Long])
    val u = (sa ++ sb).distinct.sorted.take(k)
    val (inA, inB) = (sa.toSet, sb.toSet)
    val nBoth = u.count(x => inA(x) && inB(x))
    // empty union (both inputs empty or all-null keys) is zero overlap,
    // not 0.0/0 = NaN — BigDecimal(NaN) would throw on the driver
    val estInter =
      if (u.isEmpty) 0.0 else round4(nBoth.toDouble / u.length * est(u))
    val exact = ha.distinct().withColumnRenamed("hv", "hv_a")
      .join(hb.distinct(), col("hv_a") === col("hv"), "full")
      .agg(count(col("hv_a")).as("exact_distinct_a"),
        count(col("hv")).as("exact_distinct_b"),
        count(when(col("hv_a").isNotNull && col("hv").isNotNull, 1))
          .as("exact_overlap"))
    exact.select(
      lit(est(sa)).as("est_distinct_a"),
      lit(est(sb)).as("est_distinct_b"),
      lit(estInter).as("est_overlap"),
      col("exact_distinct_a"), col("exact_distinct_b"),
      col("exact_overlap"),
      // disjoint inputs have exact_overlap 0 — NULL, not a division
      // error (ANSI) or an Infinity that differs across engines
      when(col("exact_overlap") === 0L, lit(null).cast("double"))
        .otherwise(round(abs(lit(estInter) - col("exact_overlap")) /
          col("exact_overlap").cast("double"), 6)).as("rel_err"))
  }

  /** Pairwise KMV overlap MATRIX across the groups of one frame — the
    * corpus-contamination report: estimated shared-key cardinality and
    * Jaccard for every group pair, from ONE bounded aggregate. Per-group
    * sketch state is ≤ k longs, so |groups| sketches collect to the
    * driver as metadata (the adjudicated-collect convention: KMV
    * sketches ≤ 256 longs); the |groups|²/2 pair arithmetic is
    * driver-side on that metadata and parallelizes back out as the
    * result frame. At 100 TB this is the ONLY shape that works — the
    * exact pairwise intersection needs a per-key self-join, which the
    * registered query adds as the small-|groups| audit leg.
    *
    * Estimator (Beyer et al. 2007, as kmvOverlap): over the combined
    * k smallest union hashes u, est_union = (k−1)·2⁶⁰/u(k−1) (exact
    * size when |u| < k), est_jaccard = |both|/|u|, est_inter =
    * est_jaccard · est_union — every value a deterministic function of
    * the portable md5 hash stream, so DuckDB replays it exactly.
    *
    * EAGER, unlike every other builder in Sketches: the per-group
    * aggregate and the driver collect run AT CONSTRUCTION TIME (the
    * pair arithmetic needs the sketch metadata on the driver), so the
    * returned frame is a pre-computed local relation, not a lazy plan —
    * callers composing it must account for the up-front job. A NULL
    * group key is dropped alongside NULL hashes (r12 ADVICE: it would
    * NPE in the driver-side toString and name no real group). */
  def kmvOverlapMatrix(df: DataFrame, groupCol: String, hashCol: String,
      k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val kmv = udaf(new KmvAggregator(k), Encoders.scalaLong)
    def round4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sketches = df
      // NULL hash is "no key", never a phantom; NULL group names no group
      .filter(col(hashCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(col(groupCol)).agg(kmv(col(hashCol)).as("__s"))
      .collect()
      .map(r => r.get(0).toString ->
        r.getAs[scala.collection.Seq[Long]](1).toArray)
      .sortBy(_._1)
    val rows = for {
      ((a, sa), i) <- sketches.zipWithIndex
      (b, sb) <- sketches.drop(i + 1)
    } yield {
      val u = (sa ++ sb).distinct.sorted.take(k)
      val (inA, inB) = (sa.toSet, sb.toSet)
      val nBoth = u.count(x => inA(x) && inB(x))
      val estU =
        if (u.isEmpty) 0.0
        else if (u.length < k) u.length.toDouble
        else round4((k - 1).toDouble * HashSpace / u(k - 1).toDouble)
      val jac = if (u.isEmpty) 0.0 else round4(nBoth.toDouble / u.length)
      val inter =
        if (u.isEmpty) 0.0
        else round4(nBoth.toDouble / u.length * estU)
      (a, b, u.length.toLong, nBoth.toLong, estU, inter, jac)
    }
    rows.toSeq.toDF("group_a", "group_b", "u_size", "n_both",
      "est_union", "est_inter", "est_jaccard")
  }

  /** Bounded-state quantile estimation over positive integer values
    * (token counts, byte sizes): a log-scale histogram with a 2-bit
    * sub-exponent mantissa — values clamp below at 4, bin key =
    * 4·⌊log₂ v⌋ + (the two bits after the leading one), so there are at
    * most 4·62 bins per group REGARDLESS of input size, every bin
    * boundary is a dyadic rational, and the relative quantization error
    * is bounded by the bin width (≤ 1/8 of the value). This is the
    * percentile report that still runs when the corpus is 100 TB —
    * `percentile()` shuffles every value to sort; this shuffles ≤ 248
    * counter rows per group (and the same plan is streamable: counts
    * are sums).
    *
    * Everything is integer/string arithmetic (`length(bin(v))`, integer
    * divide, shift) — no floating log whose last-ulp could flip a bin
    * at a boundary — so DuckDB rebuilds the identical histogram and the
    * report is exact-compare oracle-checkable. The per-prob estimate is
    * the MIDPOINT of the first bin whose cumulative count reaches
    * ⌈p·n⌉: (2^(e−2))·(sub + 4.5), computed in the same operation order
    * on both engines.
    *
    * The cumulative window runs over the BINNED frame (≤ 248 rows per
    * group), never the raw values — the global-window ban does not
    * apply to a frame whose size is a constant of the encoding. */
  /** The histogram's bounded counter state alone: one row per
    * (group, bin key) with the bin's count — ≤ 4·62 rows per group at
    * any input size. Counts are sums, so the identical plan runs under
    * readStream/complete with state bounded forever (the streaming
    * face; HistStreamSpec pins drain ≡ batch bin-for-bin). */
  def histBins(df: DataFrame, groupCol: String, valCol: String): DataFrame =
    df.select(col(groupCol).as("__g"),
        greatest(col(valCol).cast("long"), lit(4L)).as("__v"))
      .selectExpr("__g",
        "4 * (length(bin(__v)) - 1) + " +
          "(__v div shiftleft(CAST(1 AS BIGINT), length(bin(__v)) - 3)) " +
          "- 4 AS __key")
      .groupBy(col("__g"), col("__key"))
      .agg(count(lit(1)).as("__cnt"))
      .select(col("__g").as(groupCol), col("__key").as("bin_key"),
        col("__cnt").as("bin_count"))

  def histQuantiles(df: DataFrame, groupCol: String, valCol: String,
      probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1),
      s"probs must be in (0, 1]: $probs")
    import org.apache.spark.sql.expressions.Window
    val binned = histBins(df, groupCol, valCol)
      .select(col(groupCol).as("__g"), col("bin_key").as("__key"),
        col("bin_count").as("__cnt"))
    val wCum = Window.partitionBy(col("__g")).orderBy(col("__key"))
    val wAll = Window.partitionBy(col("__g"))
    val wb = binned
      .withColumn("__cum", sum(col("__cnt")).over(wCum))
      .withColumn("__n", sum(col("__cnt")).over(wAll))
    val picks = probs.zipWithIndex.map { case (p, i) =>
      min(when(col("__cum") >= ceil(lit(p) * col("__n")), col("__key")))
        .as(s"__k$i")
    }
    val decoded = probs.indices.map { i =>
      expr(s"round(CAST(shiftleft(CAST(1 AS BIGINT), " +
        s"CAST(__k$i div 4 AS INT) - 2) AS DOUBLE) * " +
        s"((__k$i % 4) + 4.5), 6)")
        .as(s"p${(probs(i) * 100).round}_est")
    }
    wb.groupBy(col("__g"))
      .agg(max(col("__n")).as("__nn"), picks: _*)
      .select(col("__g").as(groupCol) +: col("__nn").as("n_rows") +:
        decoded: _*)
  }

  /** HyperLogLog registers (Flajolet et al. 2007) for the same 60-bit
    * hash column: register index = hash mod 2^p, register value = the
    * 1-based position of the highest set bit missing from the remaining
    * 60−p hash bits (the classic leading-zero rank ρ), register state =
    * MAX ρ per (group, index).
    *
    * Where KMV keeps k exact hash values, HLL keeps 2^p six-bit ranks —
    * smaller state for the same error (1.04/√m), and the per-register
    * MAX is monotone, so the identical plan runs under
    * readStream/complete with state bounded at groups × 2^p rows
    * forever (the streaming face; see StreamingRefresh). The rank is
    * computed portably — `instr(lpad(bin(rem)))` string arithmetic, no
    * engine-specific bit intrinsics — so DuckDB rebuilds the identical
    * register file and the whole report stays exact-compare
    * oracle-checkable despite being an "approximate" structure. */
  def hllRegisters(df: DataFrame, groupCol: String, hashCol: String,
      p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"HLL precision out of range: $p")
    val m = 1L << p
    val rhoBits = HashBits - p
    val rem = Layout.idiv(col(hashCol), lit(m))
    val bs = lpad(bin(rem), rhoBits, "0")
    val rho = when(instr(bs, "1") === 0, lit(rhoBits + 1))
      .otherwise(instr(bs, "1"))
    df.select(col(groupCol), pmod(col(hashCol), lit(m)).as("idx"),
        rho.cast("int").as("rho"))
      .groupBy(col(groupCol), col("idx"))
      .agg(max(col("rho")).as("reg"))
  }

  /** Per-group distinct-count report from the HLL register file: the
    * zero-register count, the exact integer Σ 2^(60−reg) over all 2^p
    * registers (absent register ⇒ reg 0 ⇒ 2^60 — the state column the
    * oracle pins, DECIMAL(38,0): the sum can reach 2^(60+p), past
    * BIGINT), the raw estimate α_m·m²·2^60 / Σ, the small-range
    * linear-counting correction m·ln(m/zeros) when the raw estimate is
    * ≤ 2.5m with zero registers present (the published estimator), the
    * exact distinct count (audit column — the one thing here that would
    * NOT run at 100 TB), and the relative error.
    *
    * Determinism: the register file is a set-function MAX (independent
    * of partitioning and merge order); the integer sum is exact in both
    * engines; the estimate is one double division from it, with the α
    * constant written as the identical literal chain on both sides and
    * ln 9-rounded at the source (the engine's cross-engine ln
    * convention). */
  def hllDistinct(df: DataFrame, groupCol: String, hashCol: String,
      p: Int): DataFrame = {
    val m = 1L << p
    val mD = m.toDouble
    val powTop = lit(new java.math.BigDecimal(HashSpace)
      .setScale(0).toBigInteger.toString).cast("decimal(38,0)")
    val regs = hllRegisters(df, groupCol, hashCol, p)
    val agg = regs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_regs"),
        sum(expr(s"CAST(shiftleft(CAST(1 AS BIGINT), $HashBits - reg) " +
          "AS DECIMAL(38,0))")).as("pow_present"))
      .select(col(groupCol), (lit(m) - col("n_regs")).as("zero_regs"),
        (col("pow_present") +
          (lit(m) - col("n_regs")).cast("decimal(38,0)") * powTop)
          .cast("decimal(38,0)").as("reg_sum"))
    val exact = df.groupBy(col(groupCol))
      .agg(countDistinct(col(hashCol)).as("exact_distinct"))
    // identical literal chain in the mirror SQL: left-to-right
    // alpha * m^2 * 2^60, then ONE divide. Flajolet 2007 publishes
    // dedicated alpha constants below m=128 — the asymptotic
    // 0.7213/(1+1.079/m) formula carries a systematic bias there
    // (r10 ADVICE), so switch on m exactly as the paper tabulates.
    val alpha =
      if (m <= 16L) lit(0.673)
      else if (m <= 32L) lit(0.697)
      else if (m <= 64L) lit(0.709)
      else lit(0.7213) / (lit(1.0) + lit(1.079) / lit(mD))
    val alphaNum = alpha * lit(mD * mD) * lit(HashSpace)
    val raw = alphaNum / col("reg_sum").cast("double")
    val est = round(
      when(raw <= lit(2.5 * mD) && col("zero_regs") > 0,
        lit(mD) * round(log(lit(mD) / col("zero_regs")), 9))
        .otherwise(raw), 4)
    agg.join(exact, groupCol)
      .withColumn("est_distinct", est)
      .withColumn("rel_err",
        round(abs(col("est_distinct") - col("exact_distinct")) /
          col("exact_distinct").cast("double"), 6))
      .select(col(groupCol), col("zero_regs"), col("reg_sum"),
        col("est_distinct"), col("exact_distinct"), col("rel_err"))
  }
}
