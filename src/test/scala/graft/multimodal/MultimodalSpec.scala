package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox"),
    (2L, "jumps over the lazy dog"),
    (3L, "pack my box with five dozen liquor jugs"),
    (4L, "the quick brown fox")) // duplicate text -> identical media
    .toDF("doc_id", "text")

  test("withMediaColumn attaches deterministic binary payload + type") {
    val m = Multimodal.withMediaColumn(docs, "text")
    assert(m.schema("media").dataType.typeName == "binary")
    val types = m.select("media_type").distinct().as[String].collect().toSet
    assert(types.subsetOf(Set("image/png", "audio/wav", "video/mp4")))
    // same text -> same payload and type
    val dup = m.filter(col("doc_id").isin(1L, 4L))
      .select("media_type", "media").distinct()
    assert(dup.count() == 1)
  }

  test("extractFeatures: partition-batched decode; real dims for PNG rows, " +
      "stable stub metadata for the rest") {
    val withMedia = Multimodal.withMediaColumn(docs, "text")
    val feats = Multimodal.extractFeatures(withMedia, "doc_id")
    assert(feats.count() == 4)
    assert(feats.columns.toSeq == Seq("doc_id", "media_type", "size_bytes",
      "width", "height", "duration_ms"))
    val payloads = withMedia.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])].collect().toMap
    feats.collect().foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val w = r.getAs[Int]("width"); val h = r.getAs[Int]("height")
      if (r.getAs[String]("media_type") == "image/png") {
        // size_bytes is the TRUE PNG container length, and the decoded
        // dimensions must agree with an independent ImageIO parse of the
        // same bytes — this is a real decode, not header arithmetic
        assert(r.getAs[Long]("size_bytes") == payloads(id).length.toLong)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payloads(id)))
        assert(img != null && img.getWidth == w && img.getHeight == h)
        assert(w >= 1 && w <= 64 && h >= 1 && h <= 64)
      } else {
        // opaque 16-byte stand-in payload + stub ranges
        assert(r.getAs[Long]("size_bytes") == 16L)
        assert(w >= 64 && w < 64 + 1920 && h >= 64 && h < 64 + 1080)
      }
    }
    // image payloads have zero duration; others >= 1000 ms
    assert(feats.filter(col("media_type") === "image/png" &&
      col("duration_ms") =!= 0L).count() == 0)
    assert(feats.filter(col("media_type") =!= "image/png" &&
      col("duration_ms") < 1000L).count() == 0)
    // decode is deterministic: re-run equals
    val again = Multimodal.extractFeatures(
      Multimodal.withMediaColumn(docs, "text"), "doc_id")
    assert(feats.exceptAll(again).count() == 0)
  }

  test("PNG round trip: decode recovers exactly the planted dimensions; " +
      "malformed image payloads fail loudly") {
    for ((w, h) <- Seq((1, 1), (7, 3), (64, 64), (13, 64))) {
      val png = Multimodal.makePng(w, h, seed = w * 1000 + h)
      val m = Multimodal.decode(png, "image/png")
      assert(m.width == w && m.height == h && m.durationMs == 0L &&
        m.sizeBytes == png.length.toLong)
    }
    // deterministic encode: same (w, h, seed) -> identical bytes
    assert(Multimodal.makePng(5, 4, 9).toSeq ==
      Multimodal.makePng(5, 4, 9).toSeq)
    // a 16-byte hash is not a PNG — the real decoder must refuse it
    // rather than fabricate metadata
    intercept[IllegalArgumentException] {
      Multimodal.decode(Array.fill[Byte](16)(0x2a), "image/png")
    }
  }

  test("sampleFrames explodes video payloads on the stub duration grid") {
    val feats = Multimodal.extractFeatures(
      Multimodal.withMediaColumn(docs, "text"), "doc_id")
    val frames = Multimodal.sampleFrames(feats, everyMs = 10000L)
    val videos = feats.filter(col("media_type") === "video/mp4").collect()
    val expected = videos.map(v =>
      v.getAs[Long]("duration_ms") / 10000L + 1).sum
    assert(frames.count() == expected)
    if (videos.nonEmpty)
      assert(frames.select("frame_id").distinct().count() == frames.count())
  }

  test("resizeMeta caps the longest edge and preserves aspect-ish bounds") {
    val feats = Multimodal.extractFeatures(
      Multimodal.withMediaColumn(docs, "text"), "doc_id")
    val resized = Multimodal.resizeMeta(feats, maxDim = 256)
    assert(resized.filter(col("resized_w") > 256 || col("resized_h") > 256)
      .count() == 0)
    // never upscale
    assert(resized.filter(col("resized_w") > col("width") ||
      col("resized_h") > col("height")).count() == 0)
  }
}
