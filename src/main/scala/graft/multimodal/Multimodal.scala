package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads travel as opaque `binary` columns with a typed metadata
  * struct; decode / feature-extract / resize / frame-sample run as
  * partition-batched typed transforms.
  *
  * The IMAGE path is real: `withMediaColumn` synthesizes genuine PNG
  * bytes (deterministic tiny images, dimensions planted from the payload
  * hash) and `extractFeatures` decodes them with the JDK's built-in
  * `javax.imageio` — true container parsing, true pixel dimensions, no
  * external libraries. Audio/video remain STUBBED (no codec libraries
  * exist in this container): `decodeStub` derives deterministic fake
  * duration/dimensions from the payload header bytes. Everything around
  * the codec — schema, batching, partition sizing, explode shape — is the
  * real Spark-side contract either kind of decoder drops into.
  */
object Multimodal {

  final case class MediaMeta(mediaType: String, sizeBytes: Long,
      width: Int, height: Int, durationMs: Long)

  private def hexToBytes(hex: String): Array[Byte] =
    hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // ImageIO defaults to spilling every stream through a disk-backed temp
  // file — per-row temp-file churn in a tight decode loop. In-memory
  // payloads want the memory cache; flip the JVM-wide flag once per
  // executor (idempotent).
  private lazy val imageIoNoDiskCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Deterministic tiny PNG: real container, real pixels, encoded with
    * the JDK PNG writer. Pixel values derive from `seed` so identical
    * inputs yield identical bytes.
    */
  def makePng(w: Int, h: Int, seed: Int): Array[Byte] = {
    require(w >= 1 && h >= 1, s"bad dimensions ${w}x$h")
    imageIoNoDiskCache
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (seed * 31 + y * w + x) & 0xffffff)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Planted PNG dimensions for a payload hash: the SAME signed-int32
    * reads the decode oracle recomputes in SQL (first/second 4 bytes of
    * the md5), floorMod'ed into 1..64 — small enough that synthesizing
    * and decoding tens of thousands of real PNGs per partition stays in
    * the per-task noise.
    */
  def plantedDims(hashBytes: Array[Byte]): (Int, Int) = {
    val bb = java.nio.ByteBuffer.wrap(hashBytes)
    (1 + math.floorMod(bb.getInt(0), 64), 1 + math.floorMod(bb.getInt(4), 64))
  }

  /** Attach a binary media column + metadata struct to a table. The demo
    * payload derives from existing columns (deterministic); a real
    * pipeline reads it from blob storage. Rows typed `image/png` carry a
    * REAL PNG whose dimensions are planted from the row hash (so the
    * decode stays DuckDB-oracle-checkable); audio/video rows carry the
    * raw 16-byte hash as an opaque stand-in payload.
    */
  def withMediaColumn(df: DataFrame, payloadFrom: String): DataFrame = {
    val mkPayload = udf { (hex: String) =>
      val raw = hexToBytes(hex)
      val t = Integer.parseInt(hex.substring(0, 2), 16) % 3
      if (t == 0) {
        val (w, h) = plantedDims(raw)
        makePng(w, h, java.nio.ByteBuffer.wrap(raw).getInt(8))
      } else raw
    }
    df.withColumn("media", mkPayload(md5(col(payloadFrom))))
      .withColumn("media_type",
        element_at(typedLit(Seq("image/png", "audio/wav", "video/mp4")),
          (conv(substring(md5(col(payloadFrom)), 1, 2), 16, 10).cast("int")
            % 3 + 1)))
  }

  /** STUB decode for the codec-less media types: deterministic
    * pseudo-metadata from payload bytes (big-endian ints off the header,
    * floorMod'ed into plausible ranges). Replace the body with a real
    * codec call (ffmpeg bindings etc.) in production — signature and
    * batch shape hold; the image path below shows the finished form.
    */
  def decodeStub(payload: Array[Byte], mediaType: String): MediaMeta = {
    val bb = java.nio.ByteBuffer.wrap(payload)
    val h = if (payload.length >= 4) bb.getInt(0) else 0
    val h2 = if (payload.length >= 8) bb.getInt(4) else 0
    val w = 64 + math.floorMod(h, 1920)
    val ht = 64 + math.floorMod(h2, 1080)
    val dur = if (mediaType.startsWith("image")) 0L
      else 1000L + math.floorMod(h, 60000).toLong
    MediaMeta(mediaType, payload.length.toLong, w, ht, dur)
  }

  /** Real decode dispatch: PNG payloads are parsed by `javax.imageio`
    * (container + IHDR + pixel data — a malformed payload fails loudly
    * rather than yielding fake metadata); other media types fall back to
    * the documented stub. `size_bytes` is the true container length.
    */
  def decode(payload: Array[Byte], mediaType: String): MediaMeta =
    if (mediaType == "image/png") {
      imageIoNoDiskCache
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      require(img != null, "image/png payload is not a decodable image")
      MediaMeta(mediaType, payload.length.toLong, img.getWidth,
        img.getHeight, 0L)
    } else decodeStub(payload, mediaType)

  /** Partition-batched decode (the Scala analogue of mapInPandas): one
    * task decodes its partition's payloads in a tight loop; output is the
    * typed metadata struct alongside the key columns.
    */
  def extractFeatures(df: DataFrame, keyCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows: Dataset[(Long, Array[Byte], String)] = df
      .select(col(keyCol).cast("long"), col("media"), col("media_type"))
      .as[(Long, Array[Byte], String)]
    rows.mapPartitions { it =>
      it.map { case (k, payload, mt) =>
        val m = decode(payload, mt)
        (k, m.mediaType, m.sizeBytes, m.width, m.height, m.durationMs)
      }
    }.toDF(keyCol, "media_type", "size_bytes", "width", "height",
      "duration_ms")
  }

  /** Frame sampling for video payloads: every `everyMs` milliseconds up to
    * the stub duration — an explode over a deterministic frame index range
    * (the decode of each frame is again the stub boundary).
    */
  def sampleFrames(features: DataFrame, everyMs: Long = 10000L,
      keyCol: String = "doc_id"): DataFrame =
    features.filter(col("media_type") === "video/mp4")
      .withColumn("frame_ms", explode(sequence(lit(0L), col("duration_ms"),
        lit(everyMs))))
      .withColumn("frame_id",
        concat(col(keyCol), lit("#"), col("frame_ms")))

  /** Resize contract: pure metadata transform here (stub); the binary
    * payload transform would ride the same partition batching as
    * `extractFeatures`.
    */
  def resizeMeta(features: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(1.0), lit(maxDim) /
      greatest(col("width"), col("height")).cast("double"))
    features
      .withColumn("resized_w", ceil(col("width") * scale).cast("int"))
      .withColumn("resized_h", ceil(col("height") * scale).cast("int"))
  }
}
