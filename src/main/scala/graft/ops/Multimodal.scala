package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video ride through the engine
  * as opaque `binary` columns with typed metadata structs, processed in
  * batched `mapPartitions` (the Scala analogue of `mapInPandas` — same
  * batch shape: an iterator of row batches, decode amortized per batch).
  *
  * The actual codecs are NOT in this container, so `decodeStub` derives a
  * deterministic fake (dimensions/duration from a byte hash) — clearly
  * marked; swap `MediaDecoder` for a real implementation (javacv/pdfbox)
  * in production. Everything around it — schema, partitioning, batch
  * iteration, feature shape — is the real engine path and is tested.
  *
  * Scale posture: binary payloads stay columnar-at-rest (`binaryFile`
  * source keeps data on executors; `spark.sql.files.maxPartitionBytes`
  * bounds partition memory); features project to compact arrays so
  * downstream joins never shuffle raw media bytes.
  */
object Multimodal {

  /** Decoded-media metadata carried alongside the opaque payload. */
  final case class MediaMeta(kind: String, width: Int, height: Int,
      durationMs: Long, valid: Boolean)

  /** Pluggable decode seam. */
  trait MediaDecoder extends Serializable {
    def decode(kind: String, bytes: Array[Byte]): MediaMeta
    def features(kind: String, bytes: Array[Byte], dims: Int): Array[Float]

    /** `n` grayscale thumbnail pixels (0-255) — production: decode +
      * resize + luma. The contract perceptual hashing needs is
      * LOCALITY: a small payload edit must change few pixels. */
    def thumbnail(kind: String, bytes: Array[Byte], n: Int): Array[Int]

    /** Up to `n` bytes of the frame at timestamp `ms` — production:
      * container seek + codec decode of the nearest keyframe. The
      * contract frame sampling needs: deterministic, and nearby
      * timestamps map to nearby media regions. */
    def frameAt(kind: String, bytes: Array[Byte], ms: Long,
        n: Int): Array[Byte]
  }

  /** STUB decoder: real codecs are unavailable in this environment.
    * Deterministic pure function of the bytes — stands in for
    * image-decode / resample / frame-sample so the pipeline shape is
    * testable end to end. Metadata derives from the first 32 bits of the
    * payload's md5 (the engine's portable-hash pattern), so any engine —
    * including the DuckDB oracle — rebuilds widths/heights/durations
    * bit-for-bit. */
  object StubDecoder extends MediaDecoder {
    private def h64(b: Array[Byte]): Long = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < b.length) { h ^= b(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
      h
    }
    /** First 8 md5 hex digits as a non-negative long (∈ [0, 2^32)). */
    private def h32(b: Array[Byte]): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(b)
      d.take(4).foldLeft(0L)((acc, x) => (acc << 8) | (x & 0xffL))
    }
    override def decode(kind: String, bytes: Array[Byte]): MediaMeta = {
      if (bytes == null || bytes.isEmpty) return MediaMeta(kind, 0, 0, 0L, valid = false)
      val h = h32(bytes)
      kind match {
        case "image" => MediaMeta(kind, (h % 1920 + 64).toInt,
          (h / 1920 % 1080 + 64).toInt, 0L, valid = true)
        case "audio" => MediaMeta(kind, 0, 0, h % 600000 + 1000, valid = true)
        case "video" => MediaMeta(kind, (h % 1920 + 64).toInt,
          (h / 1920 % 1080 + 64).toInt, h / 7 % 600000 + 1000,
          valid = true)
        case _ => MediaMeta(kind, 0, 0, 0L, valid = false)
      }
    }
    override def features(kind: String, bytes: Array[Byte], dims: Int): Array[Float] = {
      val base = h64(bytes)
      val v = Array.tabulate(dims) { d =>
        (((base * (d * 2 + 1) + 0x9e3779b97f4a7c15L) >>> 40).toInt / 8388608.0f) - 1.0f
      }
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      if (n == 0f) v else v.map(_ / n)
    }

    /** STRIDED stub thumbnail: pixel i = ⌊mean of payload bytes at
      * positions ≡ i mod n⌋ (0 when the payload is shorter than i).
      * Unlike the md5-chaotic metadata stubs, this fake is
      * LOCALITY-PRESERVING — editing k payload bytes changes at most k
      * pixels — which is the property the perceptual-hash path exists
      * to exploit; and the stride (vs a fixed-width crop) keeps every
      * pixel active for any payload ≥ n bytes.
      *
      * The MEAN (not a mod-256 fold) is load-bearing for the LSH
      * downstream: a fold makes pixel brightness a function of the
      * TERM COUNT ⌈(len−i)/n⌉ — for a corpus of uniform-length
      * payloads that count is a pure function of position, so the
      * mean-threshold bits collapse to a per-position constant and a
      * 16-bit band degenerates to one all-corpus bucket (measured by
      * the phash_pairs scale-ladder rung: 19.7k of 22k planted docs in
      * ONE bucket, growth exponent 1.88 ≈ quadratic). The mean's
      * expectation is the payload's byte mean regardless of how many
      * terms fold into the pixel, so bits are content-driven: random
      * payloads sit at Hamming ≈ 32 and band buckets carry only the
      * birthday term. Pure integer byte math (floor division on
      * non-negatives, same in both engines), so the DuckDB oracle
      * rebuilds every pixel exactly (over ASCII payloads, where code
      * point = byte — the oracle carries a loud ASCII guard). */
    override def thumbnail(kind: String, bytes: Array[Byte], n: Int): Array[Int] = {
      val px = new Array[Int](n)
      if (bytes != null && bytes.length > 0) {
        var j = 0
        while (j < bytes.length) { px(j % n) += bytes(j) & 0xff; j += 1 }
        var i = 0
        while (i < n) {
          val terms = if (i < bytes.length) (bytes.length - i - 1) / n + 1 else 0
          if (terms > 0) px(i) /= terms
          i += 1
        }
      }
      px
    }

    /** STUB frame: the byte slice starting at the timestamp's
      * proportional offset ⌊ms·len/duration⌋ — integer math on
      * non-negatives (identical in DuckDB), truncated at payload end.
      * Stands in for seek+decode; deterministic and monotone in `ms`. */
    override def frameAt(kind: String, bytes: Array[Byte], ms: Long,
        n: Int): Array[Byte] = {
      if (bytes == null || bytes.isEmpty) return Array.emptyByteArray
      val dur = decode(kind, bytes).durationMs
      if (dur <= 0) return Array.emptyByteArray
      // clamp into [0, len]: a timestamp at/past the duration (or a
      // negative one) yields an empty/edge slice, never a thrown
      // copyOfRange(from > to) — the seam contract is total in `ms`
      val start = math.min(math.max(ms * bytes.length / dur, 0L),
        bytes.length.toLong).toInt
      java.util.Arrays.copyOfRange(bytes, start,
        math.min(start + n, bytes.length))
    }
  }

  /** Decode + feature-extract a (id, kind, payload) dataset in partition
    * batches. Output: id, kind, meta struct fields, feature array. */
  def extract(media: Dataset[(Long, String, Array[Byte])],
      decoder: MediaDecoder = StubDecoder, dims: Int = 32,
      batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { case (id, kind, bytes) =>
          val m = decoder.decode(kind, bytes)
          val f = if (m.valid) decoder.features(kind, bytes, dims) else null
          (id, kind, m.width, m.height, m.durationMs, m.valid,
            Option(f), if (bytes == null) 0 else bytes.length)
        }
      }
    }.toDF("media_id", "kind", "width", "height", "duration_ms", "valid",
      "features", "n_bytes")
  }

  /** Deterministic frame sampling over video payloads: one row per
    * sampled frame at timestamps 0, everyMs, 2·everyMs, … < duration,
    * capped at `maxFrames` per item — the video face of the multimodal
    * plumbing (production: container seek + keyframe decode behind the
    * seam; here the stub's proportional byte slice). The output carries
    * the frame's md5 fingerprint, not the frame bytes — downstream
    * dedup/indexing consumes fingerprints, and at 100 TB shipping
    * decoded frames through a shuffle is the mistake this shape avoids
    * (frames decode where the payload partition lives; only
    * metadata-width rows leave the executor).
    *
    * Non-video and empty items yield no rows. `flatMap` keeps the plan
    * a single narrow stage over the media scan — no shuffle at all. */
  def frameSample(media: Dataset[(Long, String, Array[Byte])],
      decoder: MediaDecoder = StubDecoder, everyMs: Long = 1000L,
      maxFrames: Int = 8, frameBytes: Int = 64): DataFrame = {
    require(everyMs >= 1 && maxFrames >= 1 && frameBytes >= 1,
      s"bad sampling shape: every ${everyMs}ms, $maxFrames x $frameBytes B")
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { case (id, kind, bytes) =>
      val m = decoder.decode(kind, bytes)
      if (kind != "video" || !m.valid || m.durationMs <= 0)
        Iterator.empty
      else {
        val n = math.min((m.durationMs - 1) / everyMs + 1,
          maxFrames.toLong).toInt
        (0 until n).iterator.map { i =>
          val ms = i * everyMs
          (id, i, ms, decoder.frameAt(kind, bytes, ms, frameBytes), n)
        }
      }
    }.toDF("media_id", "frame_idx", "frame_ms", "__frame", "n_frames")
      .select(col("media_id"), col("frame_idx"), col("frame_ms"),
        md5(col("__frame")).as("frame_fp"), col("n_frames"))
  }

  /** 64-bit average-hash (aHash) per media item, carried as two
    * non-negative 32-bit halves (lo32 = pixels 0-31, hi32 = 32-63) so
    * every downstream band/XOR/popcount stays in sign-free integer
    * math on BOTH engines. Bit i is set iff 64·p_i > Σp (the classic
    * mean threshold, in exact integer form — no division rounding to
    * disagree on). Empty payloads hash to (0, 0) and are marked
    * invalid so the pair join can exclude them (an all-zero hash
    * would otherwise make every empty item a mutual duplicate). */
  def pHash(media: Dataset[(Long, String, Array[Byte])],
      decoder: MediaDecoder = StubDecoder,
      batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { case (id, kind, bytes) =>
          val px = decoder.thumbnail(kind, bytes, 64)
          val s = px.sum
          var lo = 0L; var hi = 0L
          var i = 0
          while (i < 64) {
            if (64L * px(i) > s) {
              if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
            }
            i += 1
          }
          (id, kind, hi, lo, bytes != null && bytes.nonEmpty)
        }
      }
    }.toDF("media_id", "kind", "hi32", "lo32", "valid")
  }

  /** Perceptual near-duplicate pairs from banded aHash signatures: the
    * 64 bits split into four 16-bit bands; items agreeing on ANY band
    * become candidates (one equi-join on (band index, band value) —
    * linear in corpus + bucket sizes, never all-pairs, the same LSH
    * shape as the text SimHash path), then the exact Hamming distance
    * filters to ≤ `maxHamming`. Recall contract (same as SimHash's
    * banding): pairs within 3 bits are GUARANTEED (pigeonhole over 4
    * bands); beyond that banding is a recall heuristic — reported
    * pairs are always exact. Invalid (empty) items never pair. */
  /** The four 16-bit band keys of a (hi32, lo32) signature frame. */
  private def bandedHashes(hashes: DataFrame): DataFrame =
    hashes.filter(col("valid"))
      .select(col("media_id"), col("hi32"), col("lo32"),
        explode(array(
          struct(lit(0).as("k"), col("lo32").bitwiseAND(lit(65535L)).as("band")),
          struct(lit(1).as("k"), shiftrightunsigned(col("lo32"), 16)
            .bitwiseAND(lit(65535L)).as("band")),
          struct(lit(2).as("k"), col("hi32").bitwiseAND(lit(65535L)).as("band")),
          struct(lit(3).as("k"), shiftrightunsigned(col("hi32"), 16)
            .bitwiseAND(lit(65535L)).as("band")))).as("b"))
      .select(col("media_id"), col("hi32"), col("lo32"),
        col("b.k").as("k"), col("b.band").as("band"))

  /** Incremental perceptual admission: near-dup pairs between an
    * INCOMING media batch and an EXISTING corpus — the daily-refresh
    * check (is this new image a re-encode of one we already have?).
    * Same banding as [[pHashPairs]] but incoming × corpus only: no
    * corpus-corpus recompute (the corpus was deduped at ingest), no
    * incoming-incoming pairs. At deployment scale the corpus's banded
    * signature frame is the ingest-time artifact worth persisting —
    * write once, join every batch against it (the [[Dedup
    * .lshPairsAgainst]] shape, over image signatures). */
  def pHashPairsAgainst(corpusHashes: DataFrame, incomingHashes: DataFrame,
      maxHamming: Int = 10): DataFrame =
    pHashBandHits(corpusHashes, incomingHashes, maxHamming)
      .select(col("incoming_id"), col("corpus_id"), col("hamming"))
      .distinct()

  /** Per-band admission hits, STATELESS end to end (no distinct — a
    * pair hit on several bands appears once per band): the streaming
    * leg emits this shape and leaves the pair rollup to the drained
    * sink, per the streaming-leg convention. Hamming is exact per hit,
    * so `hits.select(incoming_id, corpus_id, hamming).distinct()` IS
    * [[pHashPairsAgainst]] (the distance is a function of the pair). */
  private[graft] def pHashBandHits(corpusHashes: DataFrame,
      incomingHashes: DataFrame, maxHamming: Int): DataFrame = {
    val inc = bandedHashes(incomingHashes)
      .withColumnRenamed("media_id", "incoming_id")
      .withColumnRenamed("hi32", "hi_i").withColumnRenamed("lo32", "lo_i")
    val corp = bandedHashes(corpusHashes)
      .withColumnRenamed("media_id", "corpus_id")
      .withColumnRenamed("hi32", "hi_c").withColumnRenamed("lo32", "lo_c")
    inc.join(corp, Seq("k", "band"))
      .withColumn("hamming",
        (bit_count(col("hi_i").bitwiseXOR(col("hi_c"))) +
          bit_count(col("lo_i").bitwiseXOR(col("lo_c")))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("incoming_id"), col("corpus_id"), col("k"), col("hamming"))
  }

  /** Pipeline-order contract at corpus scale: run EXACT dedup (byte or
    * full-hash) before this operator. A cluster of B byte-identical
    * payloads is B identical signatures — semantically B·(B−1)/2
    * Hamming-0 pairs, so the quadratic is in the CONTRACT, not the
    * plan; collapsing exact duplicates first keeps band buckets at the
    * birthday term (the ladder's phash rung pins sub-quadratic growth
    * for corpora with linear true-pair structure). */
  def pHashPairs(hashes: DataFrame, maxHamming: Int = 10): DataFrame = {
    val banded = bandedHashes(hashes)
    val a = banded.select(col("media_id").as("id_a"), col("hi32").as("ha"),
      col("lo32").as("la"), col("k"), col("band"))
    val b = banded.select(col("media_id").as("id_b"), col("hi32").as("hb"),
      col("lo32").as("lb"), col("k"), col("band"))
    a.join(b, Seq("k", "band")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("ha"), col("la"),
        col("hb"), col("lb")).distinct()
      .withColumn("hamming",
        (bit_count(col("ha").bitwiseXOR(col("hb"))) +
          bit_count(col("la").bitwiseXOR(col("lb")))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
