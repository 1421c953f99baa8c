package graft

import org.apache.spark.sql.functions._
import graft.ops.MediaCodec

/** Real JDK-codec round-trips: the decoded pixel/sample values must equal
  * the closed-form content the encoders were fed — locally (pure codec
  * identity) and through the distributed decode seam.
  */
class MediaCodecSpec extends SparkSpec {
  import spark.implicits._

  test("PNG round-trip: ImageIO decode returns the exact synthesized channels") {
    for (id <- Seq(0L, 3L, 99L, 498L)) {
      val png = MediaCodec.encodePng(MediaCodec.ImgW, MediaCodec.ImgH,
        i => MediaCodec.imageChannel(id, i))
      // PNG magic: proves a real container, not a passthrough of the pixels
      assert((png(0) & 0xFF) === 0x89 && png(1) === 'P'.toByte)
      val (w, h, sum) = MediaCodec.decodeImage(png)
      assert(w === 16 && h === 16)
      val expected = (0 until 768).map(i => MediaCodec.imageChannel(id, i).toLong).sum
      assert(sum === expected, s"doc $id channel-sum mismatch")
    }
  }

  test("WAV round-trip: javax.sound decode returns the exact PCM samples") {
    for (id <- Seq(1L, 4L, 100L, 499L)) {
      val wav = MediaCodec.encodeWav(id)
      assert(new String(wav, 0, 4, "US-ASCII") === "RIFF")
      val samples = MediaCodec.decodeWav(wav)
      assert(samples.length === MediaCodec.AudioSamples)
      (0 until MediaCodec.AudioSamples).foreach { i =>
        assert(samples(i) === MediaCodec.audioSample(id, i),
          s"doc $id sample $i mismatch")
      }
    }
  }

  test("video container: demux yields nf frames; decoded pixels match seeds") {
    for (id <- Seq(2L, 5L, 101L)) {
      val v = MediaCodec.encodeVideo(id)
      val frames = MediaCodec.decodeVideo(v).toVector
      assert(frames.size === MediaCodec.videoFrameCount(id))
      frames.foreach { case (f, img) =>
        val px = MediaCodec.pixelBytes(img)
        val seed = MediaCodec.frameSeed(id, f)
        // canonical r,g,b (y,x) order vs synthesized BGR bank order: the
        // SUM is order-independent; the first pixel's channel SET matches
        val expSum = (0 until 192).map(i => MediaCodec.framePixel(seed, i).toLong).sum
        assert(px.map(_ & 0xFFL).sum === expSum, s"doc $id frame $f")
        val firstPx = Set(px(0) & 0xFF, px(1) & 0xFF, px(2) & 0xFF)
        val expFirst = Set(MediaCodec.framePixel(seed, 0),
          MediaCodec.framePixel(seed, 1), MediaCodec.framePixel(seed, 2))
        assert(firstPx === expFirst)
      }
    }
  }

  test("distinct seeds give distinct canonical pixel hashes (dedup classes == seed classes)") {
    val hashes = (0 until 32).map { s =>
      val png = MediaCodec.encodePng(MediaCodec.FrameW, MediaCodec.FrameH,
        i => MediaCodec.framePixel(s.toLong, i))
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      java.security.MessageDigest.getInstance("MD5")
        .digest(MediaCodec.pixelBytes(img)).toSeq
    }
    assert(hashes.distinct.size === 32)
  }

  test("distributed seam: decodeFeatures over a mixed-modality table matches closed form") {
    val docs = (0L until 30L).toDF("doc_id")
    val media = MediaCodec.mediaTable(spark, docs)
    val feats = MediaCodec.decodeFeatures(spark, media).collect()
    assert(feats.length === 30)
    feats.foreach { r =>
      (r.doc_id % 3) match {
        case 0 =>
          assert(r.kind === "image" && r.n_units === 256L)
          assert(r.feat === (0 until 768).map(i => MediaCodec.imageChannel(r.doc_id, i).toLong).sum)
        case 1 =>
          assert(r.kind === "audio" && r.n_units === 2048L)
          assert(r.feat === (0 until 2048).map(i => math.abs(MediaCodec.audioSample(r.doc_id, i)).toLong).sum)
        case _ =>
          val nf = MediaCodec.videoFrameCount(r.doc_id)
          assert(r.kind === "video" && r.n_units === nf.toLong)
          val exp = (0 until nf).map { f =>
            val s = MediaCodec.frameSeed(r.doc_id, f)
            (0 until 192).map(i => MediaCodec.framePixel(s, i).toLong).sum
          }.sum
          assert(r.feat === exp)
      }
    }
  }

  test("vadChunks: real-PCM energies, 8 chunks of 256 samples per clip") {
    val docs = Seq(1L, 7L).toDF("doc_id")
    val chunks = MediaCodec.vadChunks(spark, MediaCodec.mediaTable(spark, docs))
      .collect().groupBy(_.doc_id)
    for ((id, cs) <- chunks) {
      assert(cs.length === 8)
      cs.sortBy(_.chunk_idx).zipWithIndex.foreach { case (c, ci) =>
        assert(c.chunk_idx === ci && c.n_samples === 256L)
        val exp = (ci * 256 until (ci + 1) * 256)
          .map(i => math.abs(MediaCodec.audioSample(id, i)).toLong).sum
        assert(c.energy === exp)
      }
    }
  }
}
