package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct; decode / feature-extract
  * run as partition-local batch functions (the Scala analogue of
  * mapInPandas — one JVM call per batch, amortized setup, no driver round
  * trip). Extension surface per the builder brief; the decode itself is a
  * DETERMINISTIC STUB (this container has no image/audio codecs) — the
  * Spark-side contract (schema, batching, partition locality, column
  * pruning before the heavy stage) is the real, tested part.
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

  /** STUB decoder — stands in for an image/audio codec. Deterministic:
    * dimensions and features derive from the payload bytes alone, so tests
    * and oracles can replay it. A production build swaps ONLY this
    * function (same signature) for a real codec. */
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
          val (w, h, f) = decodeStub(r.payload)
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
