package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF-PQ index: build once, query many — the production ANN
  * deployment shape. [[Similarity.ivfPqTopK]] retrains its quantizers on
  * every call, which is right for a one-shot query battery but wrong for
  * a serving corpus that is indexed nightly and probed thousands of
  * times; this layer splits the two halves across a parquet layout:
  *
  *   <dir>/centroids/  (cell, weights)        — C rows
  *   <dir>/codebooks/  (subspace, code, weights) — M·K rows
  *   <dir>/codes/      (vec_id, codes), PARTITIONED BY cell
  *   <dir>/meta/       (numCells, numSubspaces, codebookSize, dims)
  *
  * The cell-partitioned codes layout is the scale feature: a query
  * probes nProbe of numCells cells, and the probe join's broadcast keys
  * dynamically prune the parquet scan to those directories (Spark's
  * dynamic partition pruning fires on the broadcast equi-join against
  * the partition column — at deployment scale that is nProbe/numCells
  * of the corpus read instead of all of it, before any compute).
  * Centroids and codebooks are metadata-scale (same collect budget as
  * the in-memory path).
  *
  * Query results are IDENTICAL to ivfPqTopK with the same parameters —
  * both halves call the same shared [[Similarity.encodeIvfPq]] /
  * [[Similarity.ivfPqScore]], so equality is by construction and
  * q_knn_ivfpq_index verifies against the same DuckDB mirror as
  * q_knn_ivfpq.
  */
object AnnIndex {

  /** The directory holding the CURRENT committed index build — the
    * shared [[IndexVersioning]] resolution (highest committed `v_<n>`,
    * else the pre-r10 flat layout). */
  private[graft] def resolveDir(spark: SparkSession, dir: String): String =
    IndexVersioning.resolveDir(spark, dir)

  /** Build the index from `emb` (vec_id, embedding) and persist it
    * under `dir`. Rebuild-while-serving safe: each build writes into a
    * fresh `v_<n>` directory and publishes it by CREATING the
    * `_COMMITTED` marker (atomic; an aborted build leaves an
    * uncommitted directory readers never resolve) — a reader that
    * resolved the previous version mid-probe keeps reading a complete,
    * self-consistent quadruple; it can never see quantizers from one
    * build and codes from another (the pre-r10 four-overwrite layout
    * could). The previous committed version is retained for exactly
    * those in-flight readers; older versions and aborted build dirs
    * are garbage-collected here. */
  def save(emb: DataFrame, dir: String, numCells: Int = 16,
      numSubspaces: Int = 8, codebookSize: Int = 16,
      dims: Int = 64): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    val subDims = dims / numSubspaces
    require(subDims * numSubspaces == dims, "dims must split evenly")
    IndexVersioning.publish(spark, dir) { vdir =>
      val centroids = Similarity.ivfCentroids(emb, numCells)
      val cbs = Similarity.pqCodebooks(emb, numSubspaces, codebookSize,
        subDims)
      centroids.zipWithIndex.map { case (w, c) => (c, w.toSeq) }.toSeq
        .toDF("cell", "weights")
        .repartition(1).write.mode("overwrite").parquet(s"$vdir/centroids")
      cbs.zipWithIndex.flatMap { case (cb, m) =>
        cb.zipWithIndex.map { case (w, code) => (m, code, w.toSeq) }
      }.toSeq.toDF("subspace", "code", "weights")
        .repartition(1).write.mode("overwrite").parquet(s"$vdir/codebooks")
      Seq((numCells, numSubspaces, codebookSize, dims))
        .toDF("num_cells", "num_subspaces", "codebook_size", "dims")
        .repartition(1).write.mode("overwrite").parquet(s"$vdir/meta")
      Similarity.encodeIvfPq(emb, centroids, cbs, subDims)
        .write.mode("overwrite").partitionBy("cell").parquet(s"$vdir/codes")
    }
  }

  /** Load the index's quantizers: (centroids by cell, codebooks by
    * (subspace, code), subspace dimensionality). Driver-side,
    * metadata-scale. `dir` must already be version-resolved
    * ([[resolveDir]]) — resolving HERE would let a rebuild that commits
    * between the quantizer and codes loads hand the caller a mixed
    * index; the caller resolves ONCE and passes the pinned build dir
    * to both loads. */
  private[graft] def loadQuantizers(spark: SparkSession, dir: String)
      : (Array[Array[Double]], Array[Array[Array[Double]]], Int) = {
    val meta = spark.read.parquet(s"$dir/meta").head()
    val numSubspaces = meta.getAs[Int]("num_subspaces")
    val subDims = meta.getAs[Int]("dims") / numSubspaces
    val centroids = spark.read.parquet(s"$dir/centroids")
      .orderBy("cell").collect()
      .map(_.getAs[Seq[Double]]("weights").toArray)
    val cbs = spark.read.parquet(s"$dir/codebooks")
      .orderBy("subspace", "code").collect()
      .groupBy(_.getAs[Int]("subspace")).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_.getAs[Int]("code"))
        .map(_.getAs[Seq[Double]]("weights").toArray))
      .toArray
    (centroids, cbs, subDims)
  }

  /** The index's encoded-corpus frame, with the directory-inferred
    * partition column normalized to the int the scoring joins expect. */
  private[graft] def loadCodes(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/codes")
      .select(col("vec_id"), col("cell").cast("int").as("cell"),
        col("codes"))

  /** Probe a persisted index: top-k ADC candidates from the probed
    * cells' code partitions, exact-cosine re-rank against `emb` (the
    * raw-vector store lives outside the index). Output schema and
    * values match ivfPqTopK exactly. */
  def topK(spark: SparkSession, dir: String, emb: DataFrame,
      queries: DataFrame, k: Int, nProbe: Int = 4,
      refine: Int = 5): DataFrame = {
    val vdir = resolveDir(spark, dir) // pin ONE committed build
    val (centroids, cbs, subDims) = loadQuantizers(spark, vdir)
    Similarity.ivfPqScore(loadCodes(spark, vdir), emb, queries, centroids,
      cbs, k, nProbe, refine, subDims)
  }

  /** STATELESS candidate generation against a persisted index — works
    * on a batch OR STREAMING query frame: each query row computes its
    * own probe cells and ADC lookup table from the broadcast quantizer
    * constants (no driver-side collect of the queries, unlike
    * ivfPqScore's per-query dtable map), then joins the static codes on
    * the cell key. Emits one row per (query, candidate): (query_id,
    * neighbor_id, adist rounded 6) — the top-k cut and exact re-rank
    * are rollups over the drained sink, per the streaming-leg
    * convention. `codes` must be [[loadCodes]] of the same index (the
    * caller persists it for a long-running stream — the static subtree
    * of a stream-static join is re-planned every micro-batch). */
  def probeCandidates(queries: DataFrame, codes: DataFrame,
      centroids: Array[Array[Double]], cbs: Array[Array[Array[Double]]],
      subDims: Int, nProbe: Int = 4): DataFrame = {
    val probesU = udf((v: Seq[Float]) => {
      val ds = centroids.zipWithIndex.map { case (cv, c) =>
        var d = 0.0; var i = 0
        while (i < cv.length) { val x = v(i) - cv(i); d += x * x; i += 1 }
        (c, d)
      }
      ds.sortBy(_._2).take(nProbe).map(_._1)
    })
    // per-query ADC table computed ONCE per arriving row (numSubspaces
    // × codebookSize doubles), then each candidate's distance is a
    // codes-length gather over it
    val dtableU = udf((v: Seq[Float]) => {
      val dv = v.map(_.toDouble).toIndexedSeq
      Array.tabulate(cbs.length, cbs.head.length)((m, c) =>
        Similarity.pqD2(cbs(m)(c), Similarity.pqSub(subDims)(dv, m)))
    })
    val adistU = udf((cs: Seq[Int], dt: Seq[Seq[Double]]) => {
      var s = 0.0; var m = 0
      while (m < cs.length) { s += dt(m)(cs(m)); m += 1 }
      s
    })
    val q = queries
      .select(col("vec_id").as("query_id"), col("embedding"))
      .withColumn("_dt", dtableU(col("embedding")))
      .withColumn("cell", explode(probesU(col("embedding"))))
    q.join(codes, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(adistU(col("codes"), col("_dt")), 6).as("adist"))
  }
}
