package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling (north star): media payloads ride through
  * the engine as opaque BINARY columns beside typed metadata — no UDT, no
  * format awareness in the engine core. Joins, filters, partitioned sinks
  * and shuffles treat the payload as bytes; only the decode boundary
  * interprets them.
  *
  * The decode boundary is pluggable ([[Decoder]]): the gated queries run
  * [[DeterministicFakeDecoder]] (pure byte arithmetic — the corpus's
  * binary payloads are not images, and the DuckDB oracle pins its math),
  * while [[ImageIoDecoder]] is a REAL image codec on the JDK's
  * `javax.imageio` (r11: the `java.desktop` module IS in this image),
  * driven on real PNG/JPEG bytes through the SAME per-partition pipeline
  * in MultimodalSpec. Everything around the boundary — the binary schema,
  * the typed `Dataset`, the one-decoder-per-partition `mapPartitions`
  * shape (what a `mapInPandas` batch decoder is in PySpark), bounded
  * frame sampling — is engine plumbing shared by both codecs.
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

  /** The decode boundary: everything that interprets payload bytes sits
    * behind this interface, so the pipeline shape (typed per-partition
    * map, one decoder per partition, payload never leaves the executor)
    * is identical whichever codec is plugged in. Two implementations
    * ship: [[DeterministicFakeDecoder]] (pure byte arithmetic — works on
    * ANY bytes, and is what the DuckDB-oracled gated queries pin) and
    * [[ImageIoDecoder]] — a REAL image codec on the JDK's
    * `javax.imageio` (the r11 classpath sweep found `java.desktop` in
    * this image after all), exercised on real PNG/JPEG bytes in
    * MultimodalSpec through the same mapPartitions pipeline. */
  trait Decoder extends Serializable {
    /** Header-only (width, height) — no full pixel scan. */
    def dims(payload: Array[Byte]): (Int, Int)
    /** Full decode: (width, height, mean intensity over all samples). */
    def decode(payload: Array[Byte]): (Int, Int, Double)
    /** Nearest-neighbor resample to a `tw`×`th` single-band byte plane —
      * the model-input-tensor shape whose size (tw·th) downstream memory
      * planning relies on. */
    def resample(payload: Array[Byte], tw: Int, th: Int): Array[Byte]
  }

  /** STUB decoder — pure and deterministic in the payload so tests,
    * reruns, and the DuckDB oracle agree on arbitrary (non-image) bytes. */
  object DeterministicFakeDecoder extends Decoder {
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
    def resample(payload: Array[Byte], tw: Int, th: Int): Array[Byte] = {
      val (w, h) = dims(payload)
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
            if (payload.length == 0) 0 else payload(idx % payload.length)
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** REAL codec on the JDK's `javax.imageio` (PNG/JPEG/GIF/BMP — the
    * `java.desktop` module ships in this image): width/height read
    * header-only through an ImageReader, intensity averaged over every
    * raster sample, resample = nearest-neighbor over the decoded raster
    * with multi-band pixels averaged to one gray byte. Pure-Java, no
    * display needed, deterministic for lossless formats — MultimodalSpec
    * drives it on ImageIO-encoded PNGs with exact expectations. */
  object ImageIoDecoder extends Decoder {
    private def readImage(payload: Array[Byte]): java.awt.image.BufferedImage = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null, "payload is not a decodable image")
      img
    }
    def dims(payload: Array[Byte]): (Int, Int) = {
      // Header-only: ask the format reader for dimensions without
      // decoding pixel data — the O(1) read the interface promises.
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        require(readers.hasNext, "payload is not a decodable image")
        val r = readers.next()
        try { r.setInput(in); (r.getWidth(0), r.getHeight(0)) }
        finally r.dispose()
      } finally in.close()
    }
    /** COLOR bands only (alpha excluded — transparency is not intensity)
      * with each band's right-shift to an 8-bit range: a 16-bit
      * TYPE_USHORT_GRAY sample truncated with .toByte would wrap mod 256
      * into noise; >> (sampleSize-8) scales it. */
    private def colorBandShifts(img: java.awt.image.BufferedImage): Array[Int] = {
      val raster = img.getRaster
      val colorBands = img.getColorModel.getNumColorComponents
        .min(raster.getNumBands)
      Array.tabulate(colorBands) { b =>
        math.max(0, raster.getSampleModel.getSampleSize(b) - 8)
      }
    }
    def decode(payload: Array[Byte]): (Int, Int, Double) = {
      val img = readImage(payload)
      val raster = img.getRaster
      val shifts = colorBandShifts(img)
      val (w, h, bands) = (img.getWidth, img.getHeight, shifts.length)
      var s = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var b = 0
          while (b < bands) { s += (raster.getSample(x, y, b) >> shifts(b)); b += 1 }
          x += 1
        }
        y += 1
      }
      (w, h, if (w * h * bands == 0) 0.0 else s.toDouble / (w.toLong * h * bands))
    }
    def resample(payload: Array[Byte], tw: Int, th: Int): Array[Byte] = {
      val img = readImage(payload)
      val raster = img.getRaster
      val shifts = colorBandShifts(img)
      val (w, h, bands) = (img.getWidth, img.getHeight, shifts.length)
      val out = new Array[Byte](tw * th)
      var y = 0
      while (y < th) {
        val sy = (y.toLong * h / th).toInt
        var x = 0
        while (x < tw) {
          val sx = (x.toLong * w / tw).toInt
          var s = 0; var b = 0
          while (b < bands) { s += (raster.getSample(sx, sy, b) >> shifts(b)); b += 1 }
          out(y * tw + x) = (s / bands).toByte
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** Per-partition decode + feature extraction. One decoder init per
    * partition, rows streamed through it — the scalable batch-decode shape
    * (narrow map, no shuffle, no driver involvement). Default decoder is
    * the stub (arbitrary bytes, oracle-pinned); pass [[ImageIoDecoder]]
    * for real image payloads — SAME pipeline, different codec. */
  def decodeFeatures(blobs: Dataset[Blob],
      decoder: Decoder = DeterministicFakeDecoder): Dataset[MediaFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { rows =>
      // A real decoder's per-partition init (codec/model handle) goes here.
      rows.map { b =>
        val (w, h, mean) = decoder.decode(b.payload)
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
  def resizeTo(blobs: Dataset[Blob], tw: Int, th: Int,
      decoder: Decoder = DeterministicFakeDecoder): Dataset[ResizedBlob] = {
    // Guard the product, not just the factors: tw*th overflows Int for
    // targets ≥ 2^31 bytes (65536×65536 wraps to 0), which would allocate
    // a wrong-sized buffer exactly where downstream memory planning
    // depends on the documented tw*th contract.
    require(tw > 0 && th > 0 && tw.toLong * th <= Int.MaxValue,
      s"target $tw x $th exceeds a single row's addressable payload")
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { rows =>
      rows.map { b =>
        ResizedBlob(b.doc_id, b.lang, tw, th,
          decoder.resample(b.payload, tw, th))
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
