package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "an image payload"), (1L, "an audio payload"), (2L, "a video payload"),
    (3L, "another image")
  ).toDF("doc_id", "text")

  test("asMediaTable assigns round-robin media types and utf-8 payloads") {
    val got = Multimodal.asMediaTable(docs)
      .select("doc_id", "media_type").as[(Long, String)].collect().toMap
    assert(got(0L) == "image" && got(1L) == "audio" && got(2L) == "video" && got(3L) == "image")
  }

  test("extractFeatures runs the partition-local decode with stable output") {
    implicit val s = spark
    val feats = Multimodal.extractFeatures(Multimodal.asMediaTable(docs))
      .collect().sortBy(_.doc_id)
    assert(feats.length == 4)
    val f0 = feats(0)
    assert(f0.n_bytes == "an image payload".getBytes("UTF-8").length)
    assert(f0.feature.length == Multimodal.FeatureDim)
    assert(f0.width >= 16 && f0.width < 32 && f0.height >= 16 && f0.height < 32)
    // decode is deterministic: same payload -> same features
    val again = Multimodal.extractFeatures(Multimodal.asMediaTable(docs))
      .collect().sortBy(_.doc_id)
    assert(again(0).feature.sameElements(f0.feature))
  }

  test("frameSample slices payloads into strided fingerprinted chunks") {
    val frames = Multimodal.frameSample(Multimodal.asMediaTable(docs))
      .filter($"doc_id" === 0)
      .select("frame_idx", "frame_bytes", "frame_md5")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    // payload "an image payload" = 16 bytes, flen = 2, frames 0/2/4/6
    assert(frames.map(_._1).sameElements(Array(0L, 2L, 4L, 6L)))
    assert(frames.forall(_._2 == 2L))
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("an".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(frames(0)._3 == expected) // frame 0 = bytes [0,2) = "an"
  }

  test("fitWithin shrinks preserving aspect, never upscales") {
    val df = Seq((640, 480), (100, 400), (20, 10)).toDF("w", "h")
    val (nw, nh) = Multimodal.fitWithin($"w", $"h", box = 224)
    val got = df.select($"w", nw.as("nw"), nh.as("nh"))
      .as[(Int, Int, Int)].collect().sortBy(_._1)
    assert(got.contains((640, 224, 168)))  // scale 0.35
    assert(got.contains((100, 56, 224)))   // scale 0.56
    assert(got.contains((20, 20, 10)))     // no upscale
  }

  test("mediaStats exposes byte length and md5 of the payload") {
    val r = Multimodal.mediaStats(Multimodal.asMediaTable(docs))
      .filter($"doc_id" === 0)
      .select("n_bytes", "payload_md5").as[(Long, String)].head()
    assert(r._1 == 16L)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("an image payload".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(r._2 == md)
  }
}
