package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct; decode / feature-extract
  * run as partition-local batch functions (the Scala analogue of
  * mapInPandas — one JVM call per batch, amortized setup, no driver round
  * trip). Extension surface per the builder brief. IMAGE decode is REAL:
  * payloads with a PNG/JPEG/GIF/BMP signature go through the JDK's
  * `javax.imageio` (true dimensions, mean-luminance grid features).
  * Audio/video payloads — no codec ships with the JDK — fall back to the
  * DETERMINISTIC STUB, preserving the stage's schema/batching contract.
  *
  * Scale notes: binary payloads dominate row size, so (1) metadata-only
  * predicates are applied BEFORE the decode stage so parquet column
  * pruning keeps payload bytes unread for filtered rows; (2) decode is
  * mapPartitions, not a per-row UDF, so a real codec would amortize its
  * init per partition; (3) output features are fixed-width arrays —
  * shuffle-friendly regardless of input payload size.
  */
object Multimodal {

  /** Typed record entering the decode stage. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte], media_type: String)

  /** Typed record leaving the decode stage. */
  final case class MediaFeatures(doc_id: Long, media_type: String,
                                 n_bytes: Long, width: Int, height: Int,
                                 feature: Array[Float])

  val FeatureDim = 8

  /** Decode a payload: real `javax.imageio` decode when the bytes carry an
    * image signature ImageIO can read, deterministic stub otherwise. The
    * single seam a production build extends with audio/video codecs. */
  def decode(payload: Array[Byte]): (Int, Int, Array[Float]) =
    decodeImage(payload).getOrElse(decodeStub(payload))

  /** True when the payload starts with a PNG/JPEG/GIF/BMP signature —
    * checked before handing bytes to ImageIO so arbitrary text/audio
    * payloads skip the codec probe entirely. */
  def looksLikeImage(payload: Array[Byte]): Boolean =
    payload.length >= 4 && {
      val b = payload
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte && b(2) == 0xFF.toByte) ||
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||
      (b(0) == 'B' && b(1) == 'M')
    }

  /** Decoded images larger than this (width*height) degrade to the stub:
    * a single adversarial payload (a tiny PNG/JPEG declaring enormous
    * dimensions — a "decompression bomb") must not allocate executor
    * memory proportional to the CLAIMED size and kill the stage. 64 MPx
    * covers every realistic training image. */
  val MaxDecodedPixels: Long = 64L * 1024 * 1024

  /** REAL image decode via the JDK's ImageIO: true width/height plus an
    * 8-dim feature = mean luminance over a 4x2 grid. DETERMINISM: pixel
    * data in, same floats out — which for LOSSLESS formats (PNG, GIF,
    * BMP) makes features replayable across platforms, but JPEG decoders
    * may produce slightly different pixels across JDK/ImageIO versions,
    * so JPEG features are deterministic only per-environment (tests pin
    * PNG fixtures for this reason). None when the bytes aren't a
    * decodable image; NonFatal throwables from truncated/corrupt files
    * degrade to None and oversized declared dimensions are rejected
    * before pixels are read, so a bad payload can never kill a 100 TB
    * decode stage. */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Float])] =
    if (!looksLikeImage(payload)) None
    else try {
      // Read declared dimensions from the header FIRST; only then decode
      // pixels. ImageIO.read on a decompression bomb would allocate the
      // full claimed raster before any size check could run.
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) { iis.close(); return None }
      val reader = readers.next()
      try {
        reader.setInput(iis)
        val dw = reader.getWidth(0).toLong
        val dh = reader.getHeight(0).toLong
        if (dw <= 0 || dh <= 0 || dw * dh > MaxDecodedPixels) return None
        val img = reader.read(0)
        if (img == null) return None
        val w = img.getWidth
        val h = img.getHeight
        val sums = new Array[Double](FeatureDim)
        val counts = new Array[Long](FeatureDim)
        var y = 0
        while (y < h) {
          val row = y * 2 / h // 2 grid rows
          var x = 0
          while (x < w) {
            val cell = row * 4 + x * 4 / w // 4 grid cols
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / (3.0 * 255.0)
            sums(cell) += lum
            counts(cell) += 1
            x += 1
          }
          y += 1
        }
        val feat = Array.tabulate(FeatureDim)(i =>
          if (counts(i) == 0) 0f else (sums(i) / counts(i)).toFloat)
        Some((w, h, feat))
      } finally {
        reader.dispose()
        iis.close()
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** STUB decoder — stands in for the audio/video codecs the JDK lacks.
    * Deterministic: dimensions and features derive from the payload bytes
    * alone, so tests and oracles can replay it. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val n = payload.length
    val md = java.security.MessageDigest.getInstance("MD5").digest(payload)
    val width = 16 + (java.lang.Byte.toUnsignedInt(md(0)) % 16)
    val height = 16 + (java.lang.Byte.toUnsignedInt(md(1)) % 16)
    val feat = Array.tabulate(FeatureDim) { i =>
      (java.lang.Byte.toUnsignedInt(md(i * 2)) * 256
        + java.lang.Byte.toUnsignedInt(md(i * 2 + 1))).toFloat / 65535f * (if (n == 0) 0f else 1f)
    }
    (width, height, feat)
  }

  /** Wrap the documents table as a media table: payload = utf-8 bytes of
    * `text` (stand-in for real image bytes), media_type round-robin. */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"))

  /** Partition-local batch decode: the mapInPandas-shaped stage. */
  def extractFeatures(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "payload", "media_type").as[MediaRow]
      .mapPartitions { batch =>
        // per-partition init happens here (real codec handle, model, ...)
        batch.map { r =>
          val (w, h, f) = decode(r.payload)
          MediaFeatures(r.doc_id, r.media_type, r.payload.length.toLong, w, h, f)
        }
      }
  }

  /** Relational projection of the media pipeline that an external SQL
    * oracle can verify: byte length + md5 fingerprint of the payload
    * (the codegen'd part of the stage; the stub features are covered by
    * unit tests instead). */
  def mediaStats(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      col("media_type"),
      length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("payload_md5"))

  /** Video-style frame sampling plumbing: slice each payload into
    * `nFrames` equal byte chunks ("frames") and keep every `stride`-th —
    * one output row per sampled frame, fingerprinted. All codegen'd
    * byte/substring arithmetic (the real frame DECODE would slot in where
    * the md5 fingerprint sits); the explode multiplies rows BEFORE any
    * shuffle, so downstream stages see fixed-size frame records, never
    * whole payloads. Deterministic → oracle-checkable. */
  def frameSample(media: DataFrame, nFrames: Int = 8, stride: Int = 2): DataFrame = {
    val flen = ceil(length(col("payload")).cast("double") / nFrames).cast("int")
    media
      .withColumn("__flen", flen)
      .select(col("doc_id"), col("media_type"), posexplode(
        transform(sequence(lit(0), lit(nFrames - 1), lit(stride)),
          k => col("payload").substr(k * col("__flen") + 1, col("__flen"))))
        .as(Seq("__i", "__frame")))
      .filter(length(col("__frame")) > 0)
      .select(col("doc_id"), col("media_type"),
        (col("__i") * stride).cast("long").as("frame_idx"),
        length(col("__frame")).cast("long").as("frame_bytes"),
        md5(col("__frame")).as("frame_md5"))
  }

  /** Fit (width, height) inside a `box`×`box` square preserving aspect
    * ratio, never upscaling — the resize-metadata step that runs BEFORE
    * the (stubbed) pixel resize so oversized payloads can be routed to a
    * heavier executor pool by metadata alone. Pure per-row arithmetic. */
  def fitWithin(width: Column, height: Column, box: Int): (Column, Column) = {
    val scale = least(lit(box.toDouble) / width, lit(box.toDouble) / height, lit(1.0))
    (floor(width * scale).cast("int"), floor(height * scale).cast("int"))
  }
}
