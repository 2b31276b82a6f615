package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.operators.Multimodal

/** The multimodal plumbing around the decode stub must be real: binary
  * payloads survive the engine byte-exact, the per-partition decoder is
  * deterministic and partition-count-independent, and frame sampling is
  * bounded and lossless at stride 1. */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def blobs = Tables.load(spark, sfDir, "documents")
    .select(col("doc_id"), col("lang"), col("text").cast("binary").as("payload"))
    .as[Multimodal.Blob]

  test("binary payloads roundtrip byte-exact through shuffle and parquet") {
    val out = tempDir("blob_roundtrip").toString
    blobs.toDF().repartition(7, col("lang")).write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    val joined = back.as("b").join(blobs.toDF().as("o"), "doc_id")
      .filter(!(col("b.payload") <=> col("o.payload")))
    assert(joined.count() == 0, "payload bytes must be unchanged")
  }

  test("decodeFeatures is deterministic and independent of partitioning") {
    val f1 = Multimodal.decodeFeatures(blobs).collect().sortBy(_.doc_id)
    val f2 = Multimodal.decodeFeatures(blobs.repartition(13)).collect().sortBy(_.doc_id)
    assert(f1.toSeq == f2.toSeq)
    // Spot-check against a driver-side decode of the same bytes.
    val sample = blobs.filter(col("doc_id") === f1.head.doc_id).head()
    val (w, h, m) = Multimodal.DeterministicFakeDecoder.decode(sample.payload)
    assert((f1.head.width, f1.head.height, f1.head.mean_intensity) == (w, h, m))
  }

  test("resizeTo yields exactly tw*th bytes, deterministic across partitionings") {
    val r1 = Multimodal.resizeTo(blobs, 8, 8).collect().sortBy(_.doc_id)
    val r2 = Multimodal.resizeTo(blobs.repartition(13), 8, 8).collect().sortBy(_.doc_id)
    assert(r1.length == blobs.count())
    assert(r1.forall(b => b.width == 8 && b.height == 8 && b.payload.length == 64),
      "every resized payload must be exactly the target grid")
    assert(r1.map(_.payload.toSeq).toSeq == r2.map(_.payload.toSeq).toSeq,
      "resize must not depend on partitioning")
    // Resizing an already-target-shaped grid keeps the byte count stable
    // (idempotence on SHAPE — the property a pipeline chaining resize
    // stages relies on; content equality is not claimed for the stub).
    val again = Multimodal.resizeTo(
      spark.createDataset(r1.map(b =>
        Multimodal.Blob(b.doc_id, b.lang, b.payload)).toSeq), 8, 8).collect()
    assert(again.forall(_.payload.length == 64))
  }

  test("ImageIoDecoder: a REAL codec decodes real PNG bytes through the same partition pipeline") {
    // r11 (the r10 verdict's task 8): the classpath sweep found the JDK's
    // java.desktop module IS present, so javax.imageio is a real
    // PNG/JPEG codec. Drive it through the SAME decodeFeatures/resizeTo
    // mapPartitions pipeline on ImageIO-ENCODED PNGs (lossless → exact
    // expectations), across partitionings.
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    // Deterministic gradient images: pixel(x,y) = (x*7 + y*13 + id) mod 256,
    // gray — mean intensity computable in closed form driver-side.
    def png(id: Int, w: Int, h: Int): (Array[Byte], Double) = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      var s = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val v = (x * 7 + y * 13 + id) % 256
        img.getRaster.setSample(x, y, 0, v)
        s += v
      }
      val bos = new ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos), "PNG encoder present")
      (bos.toByteArray, s.toDouble / (w.toLong * h))
    }
    val specs = Seq((1L, 33, 17), (2L, 64, 64), (3L, 5, 41))
    val made = specs.map { case (id, w, h) =>
      val (bytes, mean) = png(id.toInt, w, h)
      (Multimodal.Blob(id, "img", bytes), w, h, mean)
    }
    val ds = spark.createDataset(made.map(_._1))
    // Header-only dims (no pixel decode) read the true container dims.
    made.foreach { case (b, w, h, _) =>
      assert(Multimodal.ImageIoDecoder.dims(b.payload) == (w, h)) }
    // Full decode through the executor pipeline: exact dims + exact mean.
    val feats = Multimodal.decodeFeatures(ds.repartition(7),
      Multimodal.ImageIoDecoder).collect().sortBy(_.doc_id)
    made.zip(feats).foreach { case ((b, w, h, mean), f) =>
      assert(f.doc_id == b.doc_id && f.width == w && f.height == h,
        s"doc ${b.doc_id}: decoded dims (${f.width},${f.height}) != ($w,$h)")
      assert(math.abs(f.mean_intensity - mean) < 1e-9,
        s"doc ${b.doc_id}: decoded mean ${f.mean_intensity} != $mean")
    }
    // Real nearest-neighbor resample: expected plane computed driver-side
    // from the gradient closed form; partition-shape independent.
    val r1 = Multimodal.resizeTo(ds, 8, 8, Multimodal.ImageIoDecoder)
      .collect().sortBy(_.doc_id)
    val r2 = Multimodal.resizeTo(ds.repartition(5), 8, 8, Multimodal.ImageIoDecoder)
      .collect().sortBy(_.doc_id)
    assert(r1.map(_.payload.toSeq).toSeq == r2.map(_.payload.toSeq).toSeq)
    made.zip(r1).foreach { case ((b, w, h, _), r) =>
      val expected = (for (y <- 0 until 8; x <- 0 until 8) yield {
        val (sx, sy) = ((x.toLong * w / 8).toInt, (y.toLong * h / 8).toInt)
        ((sx * 7 + sy * 13 + b.doc_id.toInt) % 256).toByte
      }).toSeq
      assert(r.payload.toSeq == expected,
        s"doc ${b.doc_id}: resampled plane differs from source gradient")
    }
    // JPEG smoke: a lossy codec still decodes dims exactly through the
    // same interface (intensity is codec-dependent, not asserted).
    val jb = new ByteArrayOutputStream()
    val jimg = new BufferedImage(24, 18, BufferedImage.TYPE_3BYTE_BGR)
    assert(javax.imageio.ImageIO.write(jimg, "jpg", jb), "JPEG encoder present")
    assert(Multimodal.ImageIoDecoder.decode(jb.toByteArray)._1 == 24)
    assert(Multimodal.ImageIoDecoder.dims(jb.toByteArray) == (24, 18))
    // Non-image bytes fail actionably instead of decoding garbage.
    intercept[IllegalArgumentException] {
      Multimodal.ImageIoDecoder.decode("not an image".getBytes) }
    // Review r11: 16-bit grayscale must SCALE to the 8-bit range, not
    // wrap mod 256 — sample 0x8000 (32768) is mid-gray 128, not 0.
    val b16 = new ByteArrayOutputStream()
    val img16 = new BufferedImage(4, 4, BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until 4; x <- 0 until 4) img16.getRaster.setSample(x, y, 0, 0x8000)
    assert(javax.imageio.ImageIO.write(img16, "png", b16))
    val (w16, h16, m16) = Multimodal.ImageIoDecoder.decode(b16.toByteArray)
    assert((w16, h16) == (4, 4))
    assert(math.abs(m16 - 128.0) < 1.0,
      s"16-bit mid-gray must decode near 128, got $m16 (mod-256 wrap would give 0)")
    assert(Multimodal.ImageIoDecoder.resample(b16.toByteArray, 2, 2)
      .forall(b => (b & 0xff) >= 127 && (b & 0xff) <= 129),
      "16-bit resample plane must be scaled, not truncated")
    // Alpha is transparency, not intensity: a constant-gray ARGB image
    // with varying alpha must average to the gray value alone.
    val ba = new ByteArrayOutputStream()
    val imga = new BufferedImage(4, 4, BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until 4; x <- 0 until 4)
      imga.setRGB(x, y, ((x * 60 + 15) << 24) | (100 << 16) | (100 << 8) | 100)
    assert(javax.imageio.ImageIO.write(imga, "png", ba))
    val (_, _, ma) = Multimodal.ImageIoDecoder.decode(ba.toByteArray)
    assert(math.abs(ma - 100.0) < 1e-9,
      s"mean must exclude the alpha band, got $ma")
  }

  test("sampleFrames is bounded and lossless at stride 1") {
    val df = blobs.toDF().limit(50)
    val framed = Multimodal.sampleFrames(df, col("payload"), frameBytes = 32, stride = 1)
    // Bounded: ceil(n_bytes / 32) frames per row.
    val badCount = framed.groupBy(col("doc_id"), col("payload")).count()
      .filter(col("count") =!= ceil(length(col("payload")).cast("double") / 32).cast("long"))
      .count()
    assert(badCount == 0, "frame count must be ceil(n_bytes/frameBytes)")
    // Lossless: concatenating all frames in order rebuilds the payload.
    val rebuilt = framed.orderBy(col("doc_id"), col("frame_idx"))
      .groupBy(col("doc_id"), col("payload"))
      .agg(array_sort(collect_list(struct(col("frame_idx"), col("frame")))).as("fs"))
      .withColumn("joined",
        aggregate(col("fs"), lit(Array.emptyByteArray),
          (acc, f) => concat(acc, f.getField("frame"))))
      .filter(!(col("joined") <=> col("payload")))
    assert(rebuilt.count() == 0, "stride-1 frames must reassemble the payload")
  }

  test("stride sampling keeps every k-th frame only") {
    val df = blobs.toDF().limit(20)
    val framed = Multimodal.sampleFrames(df, col("payload"), frameBytes = 16, stride = 3)
    assert(framed.filter(col("frame_idx") % 3 =!= 0).count() == 0)
    assert(framed.count() > 0)
  }
}
