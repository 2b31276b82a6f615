package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling (north star): media payloads ride through
  * the engine as opaque BINARY columns beside typed metadata — no UDT, no
  * format awareness in the engine core. Joins, filters, partitioned sinks
  * and shuffles treat the payload as bytes; only the decode boundary
  * interprets them.
  *
  * The decode step is a STUB: this environment ships no image/audio
  * codecs, so [[DeterministicFakeDecoder]] derives fixed-shape
  * pseudo-features from the raw bytes. Everything around it — the binary
  * schema, the typed `Dataset`, the one-decoder-per-partition
  * `mapPartitions` shape (what a `mapInPandas` batch decoder is in
  * PySpark), bounded frame sampling — is real engine plumbing and is
  * asserted in MultimodalSpec.
  *
  * 100 TB notes: payloads never pass through a driver collect; decode is a
  * narrow per-partition map (no shuffle); frame sampling bounds output
  * rows per input row, so the explode cannot amplify a partition beyond
  * `ceil(n_bytes / frameBytes / stride)` rows.
  */
object Multimodal {
  /** A media row: opaque payload + typed metadata. */
  final case class Blob(doc_id: Long, lang: String, payload: Array[Byte])

  /** Fixed-shape decoded features (what a real image decode would yield). */
  final case class MediaFeatures(doc_id: Long, lang: String, n_bytes: Int,
                                 width: Int, height: Int, mean_intensity: Double)

  /** STUB boundary — a real deployment decodes media bytes here (JPEG →
    * pixel array, WAV → samples). The fake is pure and deterministic in
    * the payload so tests and reruns agree. */
  object DeterministicFakeDecoder {
    /** Header-only decode: dims are O(1) in the payload (a real decoder
      * reads them from the container header without scanning the media). */
    def dims(payload: Array[Byte]): (Int, Int) = {
      val n = payload.length
      (16 + (n % 16), 16 + ((n / 16) % 16))
    }
    def decode(payload: Array[Byte]): (Int, Int, Double) = {
      val n = payload.length
      val (width, height) = dims(payload)
      val mean =
        if (n == 0) 0.0
        else payload.foldLeft(0L)((s, b) => s + (b & 0xff)).toDouble / n
      (width, height, mean)
    }
  }

  /** Per-partition decode + feature extraction. One decoder init per
    * partition, rows streamed through it — the scalable batch-decode shape
    * (narrow map, no shuffle, no driver involvement). */
  def decodeFeatures(blobs: Dataset[Blob]): Dataset[MediaFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { rows =>
      // A real decoder's per-partition init (codec/model handle) goes here.
      rows.map { b =>
        val (w, h, mean) = DeterministicFakeDecoder.decode(b.payload)
        MediaFeatures(b.doc_id, b.lang, b.payload.length, w, h, mean)
      }
    }
  }

  /** A resized media row: the transformed payload plus its new dims. */
  final case class ResizedBlob(doc_id: Long, lang: String,
                               width: Int, height: Int, payload: Array[Byte])

  /** Resize — the media TRANSFORM step (decode interprets, resize
    * rewrites): each payload, viewed through the decoder's (width, height)
    * grid, is nearest-neighbor-sampled to exactly `tw`×`th` bytes. The
    * pixel math is part of the STUB boundary (a real deployment calls its
    * codec's scaler); the engine plumbing is the production shape — typed
    * per-partition map, one transformer init per partition, payload never
    * leaves the executor, output size KNOWN (tw*th per row) so downstream
    * memory/shuffle planning can rely on it. Deterministic in the payload:
    * same bytes → same resized bytes, any partitioning (MultimodalSpec). */
  def resizeTo(blobs: Dataset[Blob], tw: Int, th: Int): Dataset[ResizedBlob] = {
    // Guard the product, not just the factors: tw*th overflows Int for
    // targets ≥ 2^31 bytes (65536×65536 wraps to 0), which would allocate
    // a wrong-sized buffer exactly where downstream memory planning
    // depends on the documented tw*th contract.
    require(tw > 0 && th > 0 && tw.toLong * th <= Int.MaxValue,
      s"target $tw x $th exceeds a single row's addressable payload")
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { rows =>
      rows.map { b =>
        // dims only — the full decode's O(payload) intensity fold would be
        // a wasted second byte scan per row at media sizes.
        val (w, h) = DeterministicFakeDecoder.dims(b.payload)
        val out = new Array[Byte](tw * th)
        var y = 0
        while (y < th) {
          val sy = (y.toLong * h / th).toInt
          var x = 0
          while (x < tw) {
            val sx = (x.toLong * w / tw).toInt
            // source "pixel" = payload byte at the grid position, wrapped —
            // the stub's stand-in for plane indexing; empty payloads stay 0.
            val idx = sy * w + sx
            out(y * tw + x) =
              if (b.payload.length == 0) 0 else b.payload(idx % b.payload.length)
            x += 1
          }
          y += 1
        }
        ResizedBlob(b.doc_id, b.lang, tw, th, out)
      }
    }
  }

  /** Bounded frame sampling: split `payload` into fixed-size frames and
    * keep every `stride`-th, as (doc_id, frame_idx, frame_bytes) rows —
    * all builtin expressions (sequence/transform/explode), codegen-able,
    * output bounded per input row. */
  def sampleFrames(df: DataFrame, payload: Column, frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0)
    val nFrames = ceil(length(payload).cast("double") / frameBytes).cast("int")
    val idxs = filter(sequence(lit(0), greatest(nFrames - 1, lit(0))),
      i => i % stride === 0)
    df.withColumn("frame_idx", explode(when(length(payload) > 0, idxs).otherwise(array())))
      .withColumn("frame",
        substring(payload, col("frame_idx") * frameBytes + 1, lit(frameBytes)))
  }
}
