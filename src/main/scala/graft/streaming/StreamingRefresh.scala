package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface (SURVEY §2.10).
  *
  * The reference is pure batch; its incremental-refresh loop (CDC → process
  * → upsert, with skip flags and checkpoints) maps onto Structured
  * Streaming as: file source + `Trigger.AvailableNow` (process everything
  * new, then stop — the batch-job contract, checkpointed), event-time
  * windows + watermark for the aggregations, and `foreachBatch` doing the
  * master-table upsert per micro-batch. Nothing in the operator layer
  * changes — the same DataFrame expressions run incrementally.
  */
object StreamingRefresh {

  /** The typed streaming legs cast the id to long for their tuple
    * encoders; on a non-integral id (string/UUID) that cast silently
    * yields NULL and collapses every doc under one id=null key —
    * corrupt output with no error. Fail fast instead (the generic-id
    * batch operators handle those corpora). */
  private def requireIntegralId(docs: DataFrame, idCol: String,
      op: String): Unit = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val dt = docs.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"$op needs an integral $idCol (got ${dt.simpleString}); " +
        "string ids would cast to null and merge all docs — use the " +
        "batch operator or map ids to longs first")
  }

  /** File-source stream over a parquet directory (schema must be known up
    * front — streaming contract). */
  def parquetStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** Tumbling 1-hour counts per event type with a 2-hour watermark — the
    * streaming form of EventsQueries.windowed. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** SLIDING 1-hour windows every 15 minutes per event type — each event
    * lands in exactly 4 overlapping windows (the engine plans one Expand
    * over the scan, NOT four passes). This is THE query shape for
    * "rolling last-hour metrics refreshed sub-hourly"; the identical
    * plan serves batch (watermark is a no-op there — q_events_sliding
    * calls this directly) and streaming (SlidingStreamSpec pins
    * drain ≡ batch). Window starts align to the epoch in UTC, so the
    * mirror can rebuild membership arithmetically. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Gap-based event-time sessionization (30-minute inactivity closes a
    * session) — the streaming form of EventsQueries.sessions, expressed
    * with the built-in `session_window` so state handling, watermark
    * eviction, and merging stay inside the engine (preferred over a
    * hand-rolled flatMapGroupsWithState for mergeable session state). */
  def sessionized(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        col("n_events"), col("total_value"))

  /** Streaming distinct-cardinality: the KMV sketch as a stateful
    * streaming aggregation over the 60-bit portable user hash. The
    * sketch's merge is the same order-free algebra whether partials
    * come from partitions or micro-batches, so the drained
    * complete-mode state must equal the batch sketch LONG-FOR-LONG
    * (KmvStreamSpec pins it). Aggregation state per group is ≤ k
    * longs — bounded forever, no watermark needed. */
  def kmvDistinctStream(events: DataFrame, k: Int = 64): DataFrame = {
    val kmv = udaf(new graft.ops.Sketches.KmvAggregator(k), Encoders.scalaLong)
    events
      .select(col("event_type"),
        conv(substring(md5(col("user_id").cast("string").cast("binary")),
          1, 15), 16, 10).cast("long").as("hv"))
      .groupBy(col("event_type"))
      .agg(kmv(col("hv")).as("sketch"))
  }

  /** Streaming count-min sketch over a document stream: tokenize and
    * feed FreqSketch.countMin — a plain streaming aggregation whose
    * state is bounded at depth·width counter rows FOREVER (each cell a
    * running sum), no watermark needed. The sketch is a commutative
    * monoid, so the drained complete-mode matrix must equal the batch
    * sketch cell-for-cell regardless of micro-batching (CmsStreamSpec
    * pins it). */
  def cmsStream(docs: DataFrame, depth: Int = 4, width: Int = 2048): DataFrame =
    graft.ops.FreqSketch.countMin(
      docs.select(explode(split(col("text"), "\\s+")).as("word"),
        lit(1L).as("cnt")),
      "word", "cnt", depth, width)

  /** Streaming per-source top-k longest documents: the bounded TopK
    * aggregator under complete mode — state is ≤ k (value, id) pairs
    * per source FOREVER (the merge-truncation law makes micro-batch
    * order irrelevant), where the window formulation would need every
    * row ever seen. Drain ≡ batch row-for-row (TopKStreamSpec). */
  def topkStream(docs: DataFrame, k: Int = 3): DataFrame =
    graft.ops.TopK.perGroup(
      docs.select(col("source"), col("doc_id"),
        size(split(col("text"), "\\s+")).cast("long").as("n_toks")),
      "source", "n_toks", "doc_id", k)

  /** Streaming HyperLogLog register file over a document stream: the
    * SAME shingle→hash→register plan as the batch q_corpus_distinct_hll
    * report, run under complete mode — the per-register MAX is a
    * monotone streaming aggregation whose state is bounded at
    * sources × 2^p rows FOREVER, no watermark needed. Register MAX is a
    * set function of the values seen, so the drained register file must
    * equal the batch one row-for-row regardless of micro-batching
    * (HllStreamSpec pins it, and feeds the drained registers into the
    * batch estimator to close the loop). */
  /** Streaming token-length histogram: the SAME bounded bin counters as
    * the batch q_corpus_hist_pctl sketch (≤ 248 rows per source), run
    * under complete mode — counts are sums, so micro-batch order cannot
    * change the state and the drained bins equal the batch ones
    * bin-for-bin (HistStreamSpec). Quantile decode happens on the
    * drained state, exactly as the batch estimator does. */
  def histStream(docs: DataFrame): DataFrame =
    graft.ops.Sketches.histBins(
      docs.select(col("source"),
        size(split(col("text"), "\\s+")).cast("long").as("n_toks")),
      "source", "n_toks")

  /** Streaming schema-on-read props report: the SAME from_json parse +
    * per-type aggregate as the batch q_events_json_props, under
    * complete mode — every column is a count/min/max/sum (monotone or
    * additive), so state is bounded at one row per event type FOREVER
    * and the drained report equals the batch one row-for-row
    * (JsonPropsStreamSpec); the avg is decoded from the drained sums
    * exactly as the batch query derives it. */
  def jsonPropsStream(events: DataFrame): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType)))
    events
      .select(col("event_type"),
        org.apache.spark.sql.functions.from_json(col("props"), schema)
          .getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), count(col("k")).as("n_parsed"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"),
        sum(col("k")).as("sum_k"),
        count(when(col("k") >= 50, 1)).as("n_k_high"))
  }

  def hllStream(docs: DataFrame, p: Int = 8): DataFrame =
    graft.ops.Sketches.hllRegisters(
      docs.select(col("source"),
        explode(graft.functions.GraftFunctions.shingles(col("text"), 3))
          .as("gram"))
        .select(col("source"),
          conv(substring(md5(col("gram").cast("binary")), 1, 15), 16, 10)
            .cast("long").as("hv")),
      "source", "hv", p)

  /** Streaming SCD2 (ops.Scd2's incremental face): per-key state is the
    * OPEN interval (attr, valid_from_us, open_tie); an attr change
    * closes it, and only CLOSED intervals are appended downstream —
    * production appends them to the dimension table while the open
    * tails live in the state store. Within a micro-batch a key's rows
    * fold in (us, tie) order; arrival is assumed in-order per key
    * ACROSS batches (the lineDedupStream contract). A LATE retroactive
    * event — one older than its key's open interval — is DROPPED here,
    * by the same contract as a beyond-watermark row in a windowed
    * aggregation: the stream leg is forward-only (without the drop, a
    * late differing event would close the open interval with
    * valid_to < valid_from — an inverted row appended downstream, and
    * append-mode cannot retract it). Retroactive repair is the batch
    * [[graft.ops.Scd2.merge]] reconstruction's job — rerun it over
    * dimension ∪ late events; Scd2StreamSpec pins this exact boundary
    * (stream drops the late event, merge splits the interval).
    * State per key: one (attr, long, long) triple — bounded by distinct
    * keys, hash-partitioned by groupByKey. */
  def scd2Stream(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    requireIntegralId(events, "user_id", "scd2Stream")
    requireIntegralId(events, "event_id", "scd2Stream")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id").cast("long"))
      .as[(Long, String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, String, Long, Long)],
            state: GroupState[(String, Long, Long)]) =>
          val ordered = rows.toSeq.sortBy(r => (r._3, r._4))
          var cur = state.getOption
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, String, Long, Long, Long)]
          ordered.foreach { case (_, attr, us, tie) =>
            cur match {
              case None => cur = Some((attr, us, tie))
              case Some((_, from, _)) if us < from =>
                () // LATE retroactive event: forward-only leg drops it
                   // (see scaladoc — batch Scd2.merge is the repair)
              case Some((a, from, t0)) if a != attr =>
                out += ((key, a, from, us, t0))
                cur = Some((attr, us, tie))
              case _ => () // same attr: the open interval absorbs it
            }
          }
          cur.foreach(state.update)
          out.iterator
      }
      .toDF("user_id", "event_type", "valid_from_us", "valid_to_us",
        "open_tie")
  }

  /** J1–J3 as an INCREMENTAL stream: per-file change detection with
    * `flatMapGroupsWithState` — the one CDC piece the declarative
    * streaming surface cannot express (the classification depends on the
    * last emitted decision per key, not on a window of the input).
    *
    * State per file_name is the minute-floored last-modified micros last
    * acted upon (the reference's filesystem-precision guard,
    * `stage1_extract_csv.py:652-655`): an unseen file emits `new`, a
    * file whose minute-floor advanced emits `updated`, sub-minute
    * touches emit nothing. Deletions are inherently absent from an
    * append-only listing stream — the batch CDC (ops.Cdc) owns them.
    *
    * Scale posture: state is one long per distinct file — corpus-sized
    * metadata, hash-partitioned across executors by the groupByKey; each
    * micro-batch shuffles only its own listing rows. Within a batch,
    * rows of a key are folded in mtime order so a burst of touches
    * yields the same classifications the batch rule would produce.
    */
  def cdcStream(listings: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = listings.sparkSession
    import spark.implicits._
    listings
      .select(col("file_name"), col("file_path"),
        unix_micros(date_trunc("minute", col("date_last_modified"))).as("minute_us"))
      .as[(String, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (fileName: String, rows: Iterator[(String, String, Long)],
            state: GroupState[Long]) =>
          val ordered = rows.toSeq.sortBy(r => (r._3, r._2))
          var last = state.getOption.getOrElse(Long.MinValue)
          val seenBefore = state.exists
          val out = ordered.flatMap { case (_, path, minuteUs) =>
            if (!seenBefore && last == Long.MinValue) {
              last = minuteUs
              Some((fileName, path, minuteUs, "new"))
            } else if (minuteUs > last) {
              last = minuteUs
              Some((fileName, path, minuteUs, "updated"))
            } else None
          }
          if (last != Long.MinValue) state.update(last)
          out.iterator
      }
      .toDF("file_name", "file_path", "minute_us", "reason")
  }

  /** Delete detection for the AvailableNow refresh — the snapshot-join
    * step the reference runs after its listing scan
    * (`catalog search/stage1_extract_csv.py:678-686`). A deletion never
    * appears in an append-only listing stream, so `cdcStream` can only
    * emit new/updated; the refresh job closes the gap at drain time with
    * ONE batch anti-join of the master catalog against the CURRENT
    * listing snapshot. Output matches ops.Cdc.toDelete's deleted rows
    * (catalog-side columns + reason), so the streaming refresh and the
    * batch CDC agree row-for-row on vanished files (CdcStreamSpec pins
    * the agreement).
    *
    * Scale posture: same single equi-join shuffle as batch CDC; the
    * snapshot is the listing the stream just drained, so no second NAS
    * scan is needed — pass the files the file source enumerated. */
  def detectDeletes(catalog: DataFrame, listingSnapshot: DataFrame): DataFrame =
    catalog
      .join(listingSnapshot.select(col("file_name")).distinct(),
        Seq("file_name"), "left_anti")
      .select(col("id"), col("file_name"), col("file_path"),
        col("document_source"), col("document_type"), col("document_name"))
      .withColumn("reason", lit("deleted"))

  /** Streaming exact dedup: keep the first arrival per key, dropping
    * re-deliveries that land within the watermark — the streaming
    * counterpart of `Dedup.exactGroups` for an event/document feed.
    * `dropDuplicatesWithinWatermark` bounds the key state by event time
    * (state for a key is evicted once the watermark passes it), so state
    * size tracks the watermark window, not the stream's lifetime. */
  def dedupStream(events: DataFrame, keys: Seq[String],
      tsCol: String = "ts", watermark: String = "2 hours"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Streaming NEAR-dup candidate pairs: the incremental form of
    * `Dedup.minhashSignature` + `Dedup.lshPairs` for a document feed.
    * Each arriving doc's per-row MinHash signature (native expression —
    * a pure projection, no shuffle) is split into LSH bands; per
    * (band, band-values) bucket, `flatMapGroupsWithState` keeps the ids
    * already seen and emits a candidate pair for every (new doc, seen
    * doc) in the bucket — so near-dups are detected ACROSS micro-batches,
    * not just within one, and each doc is compared only against its own
    * buckets, never the corpus.
    *
    * State bound: a bucket retains at most `maxBucket` ids. A doc landing
    * in a full bucket still pairs against the retained ids but is not
    * retained itself (documented recall trade on pathological hot
    * buckets — the same hot-bucket shape the batch side caps with
    * df-capped shingles / adaptive band cardinality). State is therefore
    * ≤ maxBucket longs per DISTINCT bucket ever touched; with 2^64-value
    * band keys, bucket count tracks corpus structure, not band
    * saturation. Candidates repeat when a pair shares several bands —
    * consumers dedup (exactly as the batch `lshPairs` groupBy does);
    * StreamingDedupSpec pins set-equality against the batch operator over
    * a multi-batch drain. */
  def nearDupStream(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", numPerms: Int = 8, rowsPerBand: Int = 2,
      maxBucket: Int = 1024): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    requireIntegralId(docs, idCol, "nearDupStream")
    val numBands = numPerms / rowsPerBand
    val sig = graft.ops.Dedup.minhashSignature(docs, idCol, textCol, numPerms)
    val bandStructs = (0 until numBands).map { b =>
      struct(lit(b).as("band") +:
        (0 until rowsPerBand).map(r => col(s"m${b * rowsPerBand + r}").as(s"v$r")): _*)
    }
    sig
      .select(col(idCol).cast("long").as("id"),
        explode(array(bandStructs: _*)).as("bs"))
      .select(col("id"),
        concat_ws(":", col("bs.band") +:
          (0 until rowsPerBand).map(r => col(s"bs.v$r")): _*).as("bucket"))
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (bucket: String, rows: Iterator[(Long, String)],
            state: GroupState[Seq[Long]]) =>
          var seen = state.getOption.getOrElse(Seq.empty[Long]).toVector
          val out = Vector.newBuilder[(Long, Long, String)]
          rows.map(_._1).toSeq.distinct.sorted.foreach { id =>
            if (!seen.contains(id)) {
              seen.foreach { other =>
                val (a, b) = if (other < id) (other, id) else (id, other)
                out += ((a, b, bucket))
              }
              if (seen.size < maxBucket) seen = seen :+ id
            }
          }
          state.update(seen)
          out.result().iterator
      }
      .toDF("id_a", "id_b", "bucket")
  }

  /** Streaming C4-style line dedup: the incremental form of
    * `CorpusFilters.lineDedup` for a document feed — each line value is
    * kept at its FIRST corpus-wide occurrence and dropped everywhere
    * else, across micro-batches. Docs explode to (id, pos, line); per
    * line value, `flatMapGroupsWithState` claims the value on first
    * sight and emits the claiming (id, pos, line) row; later batches
    * (and later rows in the same batch) carrying the same line emit
    * nothing. Within a micro-batch the claimant is the minimum
    * (id, pos) — identical to the batch operator's
    * `min(struct(docId, pos))` rule, so a single-batch
    * `Trigger.AvailableNow` drain equals batch `lineDedup` doc-for-doc
    * (LineDedupStreamSpec pins fingerprint equality); across batches,
    * first ARRIVAL wins (a late duplicate never un-claims — inherent to
    * append mode, and the behavior an incremental corpus refresh wants:
    * already-published text is never retracted).
    *
    * State per distinct line value is ONE boolean (the claim) — the
    * emitted claimant tuple is not retained. Cross-corpus first-seen
    * inherently needs state per distinct value for the stream's
    * lifetime; at 100 TB the same job shards the stream by line-hash
    * range so each shard's RocksDB state store holds its slice. Emits
    * surviving (id, pos, line) rows; per-doc rebuild (counts + md5
    * fingerprint) is a batch aggregation over the drained sink. */
  def lineDedupStream(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    requireIntegralId(docs, idCol, "lineDedupStream")
    docs
      .select(col(idCol).cast("long").as("id"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .select(col("id"), col("pos").cast("int").as("pos"), col("line"))
      .as[(Long, Int, String)]
      .groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (line: String, rows: Iterator[(Long, Int, String)],
            state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            val (id, pos, _) = rows.minBy(r => (r._1, r._2))
            state.update(true)
            Iterator((id, pos, line))
          }
      }
      .toDF("doc_id", "pos", "line")
  }

  /** Streaming duplicated-substring dedup: the incremental form of
    * `CorpusFilters.dropDuplicatedSubstrings` for a document feed.
    * Each arriving doc is tiled into the SAME non-overlapping n-word
    * spans as the batch operator (shared `CorpusFilters.wordTiles`);
    * the first (doc, tile) to present a span value claims it — within
    * a micro-batch by min (doc_id, tile), the batch operator's exact
    * first-occurrence rule — and the claim is STICKY across batches: a
    * later duplicate emits nothing and a smaller doc id arriving later
    * cannot retro-steal (append mode never retracts published tiles,
    * the same cross-batch contract as `lineDedupStream`).
    *
    * State per distinct span value is ONE boolean; at 100 TB the same
    * job shards the stream by span-hash range so each shard's RocksDB
    * store holds its slice (RocksDbStateSpec runs this operator under
    * the RocksDB provider). Emits surviving (doc_id, tile, gram) rows;
    * the per-doc rebuild (kept count + md5 of space-joined kept tiles)
    * is a batch aggregation over the drained sink, exactly like the
    * other streaming legs leave rollup to the consumer. Under
    * Trigger.AvailableNow the drain therefore rebuilds to the batch
    * operator's kept_fp md5 per doc — SubstringDedupStreamSpec pins
    * it. */
  def substringDedupStream(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 4): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    requireIntegralId(docs, idCol, "substringDedupStream")
    docs
      .select(col(idCol).cast("long").as("id"),
        split(col(textCol), "\\s+").as("_w"))
      .select(col("id"),
        posexplode(graft.ops.CorpusFilters.wordTilesOf(col("_w"), n))
          .as(Seq("tile", "gram")))
      .select(col("id"), col("tile").cast("int").as("tile"), col("gram"))
      .as[(Long, Int, String)]
      .groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (gram: String, rows: Iterator[(Long, Int, String)],
            state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            val (id, tile, _) = rows.minBy(r => (r._1, r._2))
            state.update(true)
            Iterator((id, tile, gram))
          }
      }
      .toDF("doc_id", "tile", "gram")
  }

  /** Streaming benchmark decontamination: the incremental form of
    * `CorpusFilters.decontaminate` for a document feed — each arriving
    * doc's distinct word n-grams are probed against the STATIC
    * benchmark gram set via a stream-static broadcast join (stateless,
    * append-mode clean: no aggregation state, no watermark needed), so
    * contaminated docs are flagged the micro-batch they arrive.
    *
    * Emits one (docId, gram) row per distinct contaminated gram per
    * doc — the hit stream; the per-doc rollup (n_hits/overlap_frac,
    * which needs the doc's total gram count) is a batch aggregation
    * over the drained sink, exactly like the other streaming legs
    * leave ordering/rollup to the consumer. The probe side is
    * metadata-scale by contract (benchmark suites), matching the batch
    * operator's broadcast. */
  def decontaminateStream(docs: DataFrame, probes: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      n: Int = 3): DataFrame = {
    // Stream-static joins re-plan the static subtree EVERY micro-batch:
    // without a persist, the explode+distinct over the probe corpus (and
    // the broadcast build) would re-execute per batch. Persisted once
    // here, each batch's broadcast rebuilds from cached blocks instead.
    // The cache is metadata-scale (distinct benchmark grams) and lives
    // for the stream's lifetime — the intended trade for a long-running
    // query; callers tearing the stream down can unpersist via the
    // returned plan's static side or just stop the session.
    val probeGrams = probes
      .select(split(col(textCol), "\\s+").as("_w"))
      .select(explode(graft.ops.CorpusFilters.wordNgramsOf(col("_w"), n))
        .as("gram"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs
      .select(col(idCol), split(col(textCol), "\\s+").as("_w"))
      .select(col(idCol),
        explode(array_distinct(
          graft.ops.CorpusFilters.wordNgramsOf(col("_w"), n))).as("gram"))
      .join(broadcast(probeGrams), Seq("gram"))
      .select(col(idCol), col("gram"))
  }

  /** Streaming incremental admission: the stream form of
    * `Dedup.lshPairsAgainst` — each arriving doc's MinHash bands are
    * probed against the STATIC corpus signature frame via a
    * stream-static equi-join on the (band, values) bucket key, so a
    * near-dup arrival is flagged the micro-batch it arrives (stateless,
    * append-mode clean: no aggregation state, no watermark).
    *
    * Emits one (incoming_id, corpus_id, band) row per band collision —
    * the hit stream; the per-pair n_bands rollup and the per-doc admit
    * verdict are batch aggregations over the drained sink, exactly like
    * the other streaming legs leave rollups to the consumer
    * (AdmissionStreamSpec pins drain ≡ batch). The banded corpus frame
    * is persisted once so the static subtree is not re-derived every
    * micro-batch; it is corpus-band-scale (4 rows of 3 longs per doc) —
    * a deployment refreshing against a 100 TB corpus persists it to a
    * table at ingest time instead (the write-once artifact
    * lshPairsAgainst's scaladoc calls out) and passes THAT in as
    * `corpusSig`. */
  /** Streaming EXACT-Jaccard admission — the lossless face of
    * [[admissionStream]] (which is probabilistic MinHash-LSH): arriving
    * docs shingle statelessly in their micro-batch (the per-row native
    * expression — no aggregation, so the stream stays append-mode with
    * zero state) and explode their FULL shingle set against the static
    * corpus PREFIX index. Completeness needs only the corpus side's
    * prefix: J(a,b) ≥ t forces |a∩b| ≥ ⌈t·|b|⌉, and b's tokens outside
    * its prefix number ⌈t·|b|⌉ − 1, so some shared shingle lies in b's
    * prefix — the incoming side needs no ordering at all (which is what
    * makes the leg stateless: no df lookup, no per-doc re-sort).
    * Verification is INLINE and exact: the joined row carries the
    * incoming set (from the generator) and the corpus set (second
    * stream-static join against the sets artifact), so each emitted row
    * is already a true J ≥ t pair. Rows repeat per matching prefix
    * shingle — the pair-level distinct is the drained sink's rollup
    * (the per-band-hits convention); PrefixAdmissionStreamSpec pins
    * drain+distinct ≡ [[graft.ops.Dedup.prefixJaccardAgainst]].
    * `corpusPrefix`/`corpusSets` are the write-once ingest artifacts
    * ([[graft.ops.Dedup.prefixIndexArtifacts]]), persisted here so the
    * static subtrees are not re-derived every micro-batch. */
  def prefixAdmissionStream(docs: DataFrame, corpusPrefix: DataFrame,
      corpusSets: DataFrame, threshold: Double = 0.5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val corpPref = corpusPrefix
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val corpSets = corpusSets
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val inc = docs.where(col(textCol).isNotNull)
      .select(col(idCol).as("incoming_id"),
        graft.ops.Dedup.shingles(col(textCol)).as("toks_a"))
      .withColumn("n_a", size(col("toks_a")))
      .select(col("incoming_id"), col("toks_a"), col("n_a"),
        explode(col("toks_a")).as("shingle"))
    inc.join(corpPref,
        inc("shingle") === corpPref("shingle") &&
          col("n_a") >= ceil(lit(threshold) * col("n_b")) &&
          col("n_b") >= ceil(lit(threshold) * col("n_a")))
      .join(corpSets, "corpus_id")
      .withColumn("n_inter",
        size(array_intersect(col("toks_a"), col("toks_b"))).cast("long"))
      .withColumn("jaccard", round(col("n_inter").cast("double") /
        (col("n_a") + col("n_b") - col("n_inter")), 6))
      .where(col("jaccard") >= threshold)
      .select(col("incoming_id"), col("corpus_id"), col("n_inter"),
        col("jaccard"))
  }

  def admissionStream(docs: DataFrame, corpusSig: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      numPerms: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val vcols = (0 until rowsPerBand).map(r => s"v$r")
    val corp = graft.ops.Dedup
      .bandedFrame(corpusSig, idCol, numPerms, rowsPerBand)
      .withColumnRenamed(idCol, "corpus_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val inc = graft.ops.Dedup.bandedFrame(
      graft.ops.Dedup.minhashSignature(docs, idCol, textCol, numPerms),
      idCol, numPerms, rowsPerBand)
      .withColumnRenamed(idCol, "incoming_id")
    inc.join(corp, ("band" +: vcols).toSeq)
      .select(col("incoming_id"), col("corpus_id"), col("band"))
  }

  /** Streaming perceptual-hash admission — the multimodal face of
    * [[admissionStream]]: arriving media rows (media_id, kind, payload)
    * are aHashed in their micro-batch (stateless mapPartitions through
    * the decode seam) and banded against the STATIC corpus signature
    * frame; emitted candidates are exact Hamming-verified pairs, so the
    * drained sink IS [[graft.ops.Multimodal.pHashPairsAgainst]] of the
    * drained batch (PHashStreamSpec pins it row-for-row). `corpusHashes`
    * is the write-once ingest artifact ([[graft.ops.Multimodal.pHash]]
    * of the corpus) — persisted here so the static subtree of the
    * stream-static join is not re-derived every micro-batch. Emits
    * per-BAND hits (a cross-batch distinct would need state); the
    * pair-level distinct is the drained sink's rollup. */
  def mediaAdmissionStream(media: Dataset[(Long, String, Array[Byte])],
      corpusHashes: DataFrame, maxHamming: Int = 10): DataFrame = {
    val corp = corpusHashes
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.ops.Multimodal.pHashBandHits(
      corp, graft.ops.Multimodal.pHash(media), maxHamming)
  }

  /** Streaming entity-resolution admission — the fuzzy-identity face of
    * [[admissionStream]]: arriving mentions (id, name) grow their
    * 1-deletion signature set statelessly in their micro-batch and
    * equi-join the STATIC dictionary signature frame (the write-once
    * ingest artifact — [[graft.ops.EntityResolution.signatureFrame]] of
    * the published entities, persisted here so the static subtree is
    * not re-derived per batch). Emits exact-verified distance-≤1 hits
    * (incoming_id, corpus_id, lev); the min-entity assignment rollup is
    * the drained sink's job (a cross-batch aggregate would need state).
    * ErAdmissionStreamSpec pins drain ≡ batch
    * [[graft.ops.EntityResolution.edOnePairsAgainst]]. */
  def erAdmissionStream(mentions: DataFrame, dictSig: DataFrame,
      idCol: String = "mention_id", strCol: String = "name"): DataFrame = {
    val corp = dictSig
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      .select(col("_h"), col("_id").as("corpus_id"),
        col("_name").as("corpus_name"))
    val inc = graft.ops.EntityResolution
      .signatureFrame(mentions, idCol, strCol)
      .select(col("_h"), col("_id").as("incoming_id"),
        col("_name").as("incoming_name"))
    inc.join(corp, "_h")
      .withColumn("lev",
        levenshtein(col("incoming_name"), col("corpus_name")).cast("long"))
      .where(col("lev") <= 1)
      .select(col("incoming_id"), col("corpus_id"), col("lev"))
  }

  /** Streaming classification: apply an exported NB model
    * ([[graft.ops.TextClassify.trainModel]]) to a document feed — the
    * train-offline / score-online deployment shape. The model rides a
    * closure broadcast into ONE stateless projection (no join, no
    * aggregation state, no watermark), so every arriving doc is labeled
    * in its own micro-batch and the output schema matches the batch
    * scorer: (idCol, label_pred, score, n_vocab_tokens). Scores are
    * bit-equal to [[graft.ops.TextClassify.naiveBayes]] on the same
    * training frame (ClassifyStreamSpec pins it) — the model carries
    * the exact decimal constants the batch plan inlines as literals. */
  def classifyStream(docs: DataFrame, model: graft.ops.TextClassify.NbModel,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val scoreU = udf((text: String) => model.score(Option(text).getOrElse("")))
    docs
      .select(col(idCol), scoreU(col(textCol)).as("_r"))
      .select(col(idCol), col("_r._1").as("label_pred"),
        col("_r._2").as("score"), col("_r._3").as("n_vocab_tokens"))
  }

  /** Per-type value stats for the anomaly stream — the train-offline
    * artifact: (n, Σcents, Σcents²) per event type, computed over the
    * reference corpus in one aggregate and collected (type-cardinality
    * rows — metadata-scale). Cents come from the cross-engine
    * DECIMAL(18,2) cast, the same conversion the batch q_events_anomaly
    * plan uses. */
  def anomalyStats(events: DataFrame): Map[String, (Long, Long, Long)] =
    events.select(col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"),
        sum(col("cents") * col("cents")).as("ss"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  /** Streaming 3σ anomaly flags — the score-online face of
    * q_events_anomaly (same deployment shape as [[classifyStream]]):
    * the per-type stats ride a closure broadcast into ONE stateless
    * projection, and each arriving event is flagged with the identical
    * cleared integer z-test — (n·c − S)² > 9·(n·SS − S²) in exact
    * BigInt — so the drained flags are bit-equal to the batch scan
    * under the same stats (AnomalyStreamSpec pins it). An event type
    * absent from the training stats flags NULL (unknown, not "normal"
    * — a silent false would hide a typo'd type forever). */
  def anomalyStream(events: DataFrame,
      stats: Map[String, (Long, Long, Long)]): DataFrame = {
    val flagU = udf((t: String, cents: java.lang.Long) =>
      if (cents == null) None
      else stats.get(t).map { case (n, s, ss) =>
        val d = BigInt(n) * cents.longValue - s
        d * d > BigInt(9) * (BigInt(n) * ss - BigInt(s) * s)
      })
    events.select(col("event_id"), col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .withColumn("is_anomaly", flagU(col("event_type"), col("cents")))
  }

  /** Streaming ANN probes against a persisted [[graft.ops.AnnIndex]]:
    * query vectors arrive as a stream, each row computes its own probe
    * cells and ADC lookup table from the broadcast quantizer constants
    * (stateless — no per-query driver collect), and the stream-static
    * equi-join on the cell key scans only the static codes frame.
    * Emits the candidate stream (query_id, neighbor_id, adist); the
    * top-k cut and the exact re-rank are rollups over the drained sink
    * (AnnProbeStreamSpec pins the rolled-up drain ≡ AnnIndex.topK).
    * The codes frame is persisted once — the static subtree of a
    * stream-static join is re-planned every micro-batch, and a serving
    * deployment keeps the encoded corpus resident anyway. */
  def annProbeStream(queries: DataFrame, ixDir: String,
      nProbe: Int = 4): DataFrame = {
    val spark = queries.sparkSession
    // pin ONE committed index build for the stream's lifetime — a
    // nightly rebuild committing mid-stream must not hand this stream
    // the new build's codes under the old build's quantizers
    val vdir = graft.ops.AnnIndex.resolveDir(spark, ixDir)
    val (centroids, cbs, subDims) =
      graft.ops.AnnIndex.loadQuantizers(spark, vdir)
    val codes = graft.ops.AnnIndex.loadCodes(spark, vdir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.ops.AnnIndex.probeCandidates(
      queries, codes, centroids, cbs, subDims, nProbe)
  }

  /** Streaming as-of join: the incremental form of `ops.AsofJoin`. Input
    * is one pre-tagged feed of (key, ts_us, side, id) rows — side 0 =
    * right/reference stream, side 1 = left/probe stream; each left row is
    * emitted with the latest right row for its key at or before its
    * event time. State per key is TWO longs (the best right (ts_us, id)),
    * regardless of history length — the streaming win over re-scanning
    * history each refresh.
    *
    * Semantics: within a micro-batch, rows are processed in
    * (ts_us, side, id) order, so the inclusive boundary (a right row AT
    * the left ts matches) and the greatest-id-on-equal-ts tie rule are
    * IDENTICAL to the batch operator; across micro-batches, matches
    * reflect arrival order (a late right row never retro-matches an
    * already-emitted left row — inherent to append-mode streaming).
    * Under Trigger.AvailableNow (one batch) the drain therefore equals
    * the batch `asofJoin` row-for-row; AsofStreamSpec pins both the
    * equality and the cross-batch arrival semantics. */
  /** Attribution candidate pairs: every click by the same user in the
    * `lookbackMin`-minute window ending at each purchase — the
    * STREAM-STREAM interval join (Spark's two-sided-state join operator:
    * each side buffers rows until the other side's watermark passes the
    * time-range bound, so state is bounded by watermark + lookback, not
    * by stream length). The SAME plan runs in batch — callers pass
    * batch frames for the oracle-checked face (q_events_attribution
    * picks last-click on top) and watermarked streams for the
    * streaming face (AttributionStreamSpec pins drain ≡ batch).
    *
    * Inputs need (event_id, user_id, ts); streaming callers must
    * `withWatermark("ts", …)` BOTH sides before calling (required by
    * the stream-stream join planner; a 1-hour watermark bounds the
    * click buffer at watermark + lookback).
    *
    * Scale shape: an equi-join on user_id with a range predicate —
    * shuffles both sides on the user key once; the range condition
    * prunes inside each key group. No window function, no collect. */
  def attributionPairs(purchases: DataFrame, clicks: DataFrame,
      lookbackMin: Int = 30): DataFrame = {
    val p = purchases.select(col("event_id").as("purchase_id"),
      col("user_id"), col("ts").as("p_ts"))
    val c = clicks.select(col("event_id").as("click_id"),
      col("user_id").as("c_user"), col("ts").as("c_ts"))
    p.join(c,
      col("user_id") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $lookbackMin MINUTES"),
      "inner")
      .select(col("purchase_id"), col("user_id"), col("click_id"),
        unix_micros(col("p_ts")).as("p_ts_us"),
        unix_micros(col("c_ts")).as("c_ts_us"))
  }

  /** LEFT-OUTER face of [[attributionPairs]]: purchases with NO
    * qualifying click emit with null click columns — in batch
    * immediately; in streaming ONLY once the click-side watermark
    * passes the purchase's lookback window (the engine must prove no
    * matching click can still arrive before it may emit the null row —
    * the state-eviction semantics that make outer stream-stream joins
    * the hard case). AttributionStreamSpec pins both: the null row is
    * withheld while the window is open and emitted after a later batch
    * advances the watermark past it. */
  def attributionPairsOuter(purchases: DataFrame, clicks: DataFrame,
      lookbackMin: Int = 30): DataFrame = {
    val p = purchases.select(col("event_id").as("purchase_id"),
      col("user_id"), col("ts").as("p_ts"))
    val c = clicks.select(col("event_id").as("click_id"),
      col("user_id").as("c_user"), col("ts").as("c_ts"))
    p.join(c,
      col("user_id") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $lookbackMin MINUTES"),
      "left_outer")
      .select(col("purchase_id"), col("user_id"), col("click_id"),
        unix_micros(col("p_ts")).as("p_ts_us"),
        unix_micros(col("c_ts")).as("c_ts_us"))
  }

  /** RIGHT-OUTER face of [[attributionPairs]]: clicks with NO qualifying
    * purchase in their FORWARD window [c_ts, c_ts + lookback] emit with
    * null purchase columns — the re-marketing feed (q_events_attribution_
    * unconverted filters to exactly those). The state bound is the
    * MIRROR of the left-outer face: there the engine buffered the CLICK
    * side until the purchase watermark passed the lookback; here it must
    * buffer the PURCHASE side and hold each click until the purchase
    * watermark proves no purchase inside the click's forward window can
    * still arrive — only then may the null row emit (AttributionStreamSpec
    * pins withheld-then-emitted on this side too). In batch the same
    * plan returns immediately with plain right-outer semantics.
    *
    * A click with several qualifying purchases emits one row per
    * purchase (candidate semantics, like the inner face); an unconverted
    * click emits exactly once, nulls on the purchase columns. */
  def attributionPairsOuterRight(purchases: DataFrame, clicks: DataFrame,
      lookbackMin: Int = 30): DataFrame = {
    val p = purchases.select(col("event_id").as("purchase_id"),
      col("user_id"), col("ts").as("p_ts"))
    val c = clicks.select(col("event_id").as("click_id"),
      col("user_id").as("c_user"), col("ts").as("c_ts"))
    p.join(c,
      col("user_id") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $lookbackMin MINUTES"),
      "right_outer")
      .select(col("click_id"), col("c_user").as("user_id"),
        unix_micros(col("c_ts")).as("c_ts_us"),
        col("purchase_id"), unix_micros(col("p_ts")).as("p_ts_us"))
  }

  /** FULL-OUTER face of [[attributionPairs]] — the complete join family
    * (inner / left / right / full over ONE candidate builder): matched
    * candidate pairs, purchases that saw no click (the left-outer rows),
    * AND clicks that never converted (the right-outer rows) in one
    * frame — the reconciliation feed an attribution warehouse loads
    * nightly. In streaming BOTH null faces obey watermark eviction:
    * each side's unmatched row emits only once the OTHER side's
    * watermark proves the window closed (state = both buffers, bounded
    * by watermark + lookback). `user_id` coalesces across sides, so it
    * is non-null on every row. */
  def attributionPairsFull(purchases: DataFrame, clicks: DataFrame,
      lookbackMin: Int = 30): DataFrame = {
    val p = purchases.select(col("event_id").as("purchase_id"),
      col("user_id").as("p_user"), col("ts").as("p_ts"))
    val c = clicks.select(col("event_id").as("click_id"),
      col("user_id").as("c_user"), col("ts").as("c_ts"))
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $lookbackMin MINUTES"),
      "full_outer")
      .select(col("purchase_id"), col("click_id"),
        coalesce(col("p_user"), col("c_user")).as("user_id"),
        unix_micros(col("p_ts")).as("p_ts_us"),
        unix_micros(col("c_ts")).as("c_ts_us"))
  }

  def asofStream(tagged: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = tagged.sparkSession
    import spark.implicits._
    tagged
      .select(col("key").cast("long"), col("ts_us").cast("long"),
        col("side").cast("int"), col("id").cast("long"))
      .as[(Long, Long, Int, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Long, Int, Long)],
            state: GroupState[(Long, Long)]) =>
          var cur = state.getOption
          val out = Vector.newBuilder[(Long, Long, Long, Option[Long], Option[Long])]
          rows.toSeq.sortBy(r => (r._2, r._3, r._4)).foreach {
            case (_, ts, 0, id) =>
              if (cur.forall(c => c._1 < ts || (c._1 == ts && c._2 < id)))
                cur = Some((ts, id))
            case (_, ts, _, id) =>
              out += ((id, key, ts, cur.map(_._2), cur.map(_._1)))
          }
          cur.foreach(state.update)
          out.result().iterator
      }
      .toDF("id", "key", "ts_us", "r_id", "r_ts_us")
  }

  /** Streaming funnel: the incremental form of EventsQueries.funnel.
    * State per user is THREE longs — the anchor timestamps (earliest
    * view t1, earliest click ≥ t1 t2, earliest purchase ≥ t2 t3) —
    * regardless of how many events the user ever produces. A row is
    * emitted each time a user newly reaches a stage: (user_id, stage
    * 1|2|3, ts_us), so the drained output aggregates to exactly the
    * batch funnel's stage counts.
    *
    * Semantics: within a micro-batch a user's rows fold in (ts, stage)
    * order — views before clicks before purchases at equal timestamps —
    * which reproduces the batch "earliest qualifying event" anchors
    * exactly (the inclusive ≥ boundaries included). Across micro-batches
    * the anchors follow arrival order, the same documented append-mode
    * contract as asofStream: an event arriving after a later-stage
    * anchor was already set never rewrites it. Under Trigger.AvailableNow
    * (one batch) the drain equals the batch funnel; FunnelStreamSpec pins
    * both that equality and the cross-batch behavior. */
  def funnelStream(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val unset = Long.MinValue
    events
      .select(col("user_id").cast("long"), unix_micros(col("ts")).as("ts_us"),
        when(col("event_type") === "view", 0)
          .when(col("event_type") === "click", 1)
          .when(col("event_type") === "purchase", 2).as("stage"))
      .filter(col("stage").isNotNull)
      .as[(Long, Long, Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long, Int)],
            state: GroupState[(Long, Long, Long)]) =>
          var (t1, t2, t3) = state.getOption.getOrElse((unset, unset, unset))
          val out = Vector.newBuilder[(Long, Int, Long)]
          rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, ts, stage) =>
            stage match {
              case 0 =>
                if (t1 == unset) { t1 = ts; out += ((user, 1, ts)) }
              case 1 =>
                if (t2 == unset && t1 != unset && ts >= t1) {
                  t2 = ts; out += ((user, 2, ts))
                }
              case _ =>
                if (t3 == unset && t2 != unset && ts >= t2) {
                  t3 = ts; out += ((user, 3, ts))
                }
            }
          }
          state.update((t1, t2, t3))
          out.result().iterator
      }
      .toDF("user_id", "stage", "ts_us")
  }

  /** Streaming weekly cohort retention: the incremental form of
    * EventsQueries.retention. State per user is the cohort week plus the
    * set of week offsets already credited — CALENDAR-bounded (one long
    * per distinct active week of the stream's lifetime), not
    * event-bounded. A row (user_id, cohort_wk_us, week_offset) is
    * emitted the first time a user is active in a week, so the drained
    * output aggregates to exactly the batch retention matrix's n_active
    * cells (cohort sizes are the offset-0 row, as in batch).
    *
    * Semantics: within a micro-batch a user's weeks fold ascending, so
    * the earliest week becomes the cohort — identical to the batch
    * min(wk). Across micro-batches the cohort follows arrival order
    * (the same documented append-mode contract as funnelStream): a week
    * EARLIER than the anchored cohort arriving late cannot re-anchor it
    * and is ignored (a negative offset would corrupt the matrix; the
    * batch job owns reprocessing). Under Trigger.AvailableNow (ONE
    * batch — a multi-file drain that splits a user's weeks across
    * micro-batches anchors by arrival order like any cross-batch run)
    * the drain equals batch; RetentionStreamSpec pins both. Week
    * arithmetic is
    * exact micros under the UTC-pinned session (date_trunc('week')
    * boundaries are 7-day-aligned in UTC — no DST). */
  def retentionStream(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val weekUs = 7L * 24 * 3600 * 1000000L
    val unset = Long.MinValue
    events
      .select(col("user_id").cast("long"),
        unix_micros(date_trunc("week", col("ts"))).as("wk_us"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long)],
            state: GroupState[(Long, Seq[Long])]) =>
          var (cohort, seen) = state.getOption.getOrElse((unset, Seq.empty[Long]))
          val out = Vector.newBuilder[(Long, Long, Long)]
          rows.map(_._2).toSeq.distinct.sorted.foreach { wk =>
            if (cohort == unset) cohort = wk
            if (wk >= cohort) {
              val off = (wk - cohort) / weekUs
              if (!seen.contains(off)) {
                seen = seen :+ off
                out += ((user, cohort, off))
              }
            }
          }
          if (cohort != unset) state.update((cohort, seen))
          out.result().iterator
      }
      .toDF("user_id", "cohort_wk_us", "week_offset")
  }

  /** Run a streaming DataFrame to completion with AvailableNow into an
    * in-memory table; returns after all available data is processed. */
  def runAvailableNowToMemory(df: DataFrame, queryName: String,
      checkpoint: String, outputMode: String = "append"): StreamingQuery = {
    val q = df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** CDC-style micro-batch upsert: each batch's rows replace same-key rows
    * in the parquet master (overwrite-by-key, the streaming analogue of
    * the reference's master-CSV merge). `AvailableNow` makes this the
    * incremental-refresh job: run, drain, stop.
    *
    * The merged master is written DISTRIBUTED to a sibling temp directory
    * (executing the read of the old master during the write — no
    * read-while-overwrite), then swapped in with two directory renames.
    * Nothing is collected to the driver, so the master can be
    * arbitrarily large. A missing master path is detected explicitly via
    * the FileSystem (first batch bootstrap); any other read failure
    * propagates — silently substituting an empty master would replace the
    * whole table with one batch's rows. */
  def upsertStream(updates: DataFrame, keyCol: String, masterPath: String,
      checkpoint: String): StreamingQuery = {
    val spark = updates.sparkSession
    val q = updates.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        swapParquetState(spark, masterPath, batchId) { prev =>
          val master = prev.getOrElse(spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            batch.schema))
          graft.ops.DbExport.replaceByKey(master, batch, keyCol)
        }
      }
      .start()
    q.awaitTermination()
    q
  }

  /** Atomically replace the parquet state at `path` with
    * `compute(previous)` — the shared publish discipline of the
    * stateful foreachBatch sinks (upsertStream, clusterRefreshStream).
    * The new state is written DISTRIBUTED to a sibling temp dir (the old
    * state's read executes during the write — no read-while-overwrite),
    * then swapped in with two renames. Crash recovery: a previous run
    * may have died between the renames (state moved aside, replacement
    * not yet published) — the moved-aside state is restored instead of
    * being treated as a first-batch bootstrap, which would silently
    * drop all history; stale tmp/old dirs from completed or failed
    * attempts are cleared so a retried batch id renames cleanly.
    * `compute` receives None only when no state has ever been
    * published. */
  private def swapParquetState(spark: SparkSession, path: String,
      batchId: Long)(compute: Option[DataFrame] => DataFrame): Unit = {
    import org.apache.hadoop.fs.Path
    val stateDir = new Path(path)
    val fs = stateDir.getFileSystem(spark.sessionState.newHadoopConf())
    val parent = stateDir.getParent
    val oldPrefix = s"${stateDir.getName}.old-"
    val stale =
      (if (fs.exists(parent)) fs.listStatus(parent).map(_.getPath)
       else Array.empty[Path])
        .filter(p => p.getName.startsWith(oldPrefix) ||
          p.getName.startsWith(s"${stateDir.getName}.tmp-"))
    stale.find(p => p.getName.startsWith(oldPrefix) &&
        !fs.exists(stateDir))
      .foreach { orphan =>
        if (!fs.rename(orphan, stateDir))
          throw new java.io.IOException(
            s"cannot restore orphaned state $orphan")
      }
    stale.filter(fs.exists(_)).foreach(fs.delete(_, true))

    val exists = fs.exists(stateDir)
    val next = compute(if (exists) Some(spark.read.parquet(path)) else None)
    val tmp = new Path(parent, s"${stateDir.getName}.tmp-$batchId")
    val old = new Path(parent, s"$oldPrefix$batchId")
    next.write.mode("overwrite").parquet(tmp.toString)
    if (exists && !fs.rename(stateDir, old))
      throw new java.io.IOException(s"cannot move aside $stateDir")
    if (!fs.rename(tmp, stateDir)) {
      // restore the previous state before failing
      if (exists) fs.rename(old, stateDir)
      throw new java.io.IOException(s"cannot publish $tmp to $stateDir")
    }
    if (exists) fs.delete(old, true)
  }

  /** Streaming cluster refresh — the dedup pipeline's daily loop run as
    * a stream: each micro-batch of NEW near-dup pairs (vec_a, vec_b —
    * e.g. the admission stream's verified output) folds into the
    * persisted label assignment via the label-contraction update
    * ([[graft.ops.Dedup.incrementalComponents]]), and the refreshed
    * assignment is atomically republished. Per batch the recompute
    * shuffles one label row per PAIRED vertex plus the batch's pairs —
    * never the historical edge list. The state tracks paired vertices
    * only (a never-paired document's cluster is itself by definition);
    * after any drain the labels equal full CC over every pair seen,
    * regardless of micro-batching (ClusterRefreshStreamSpec pins it,
    * including across a stop/restart). */
  def clusterRefreshStream(pairs: DataFrame, labelsPath: String,
      checkpoint: String): StreamingQuery = {
    val spark = pairs.sparkSession
    val q = pairs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        swapParquetState(spark, labelsPath, batchId) { prev =>
          val b = batch
            .select(col("vec_a").cast("long").as("_a"),
              col("vec_b").cast("long").as("_b"))
          val labels = prev.getOrElse(
            spark.range(0).select(col("id").as("vec_id"),
              col("id").as("cluster_id")))
          val vertices = labels.select(col("vec_id"))
            .union(b.select(col("_a")))
            .union(b.select(col("_b")))
            .distinct()
          graft.ops.Dedup.incrementalComponents(labels,
            "vec_id", "cluster_id", b, "_a", "_b",
            vertices.select(col("vec_id")))
            .select(col("vec_id"), col("cluster_id"))
        }
      }
      .start()
    q.awaitTermination()
    q
  }
}
