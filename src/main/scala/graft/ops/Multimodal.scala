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
}
