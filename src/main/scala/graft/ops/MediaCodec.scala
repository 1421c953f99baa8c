package graft.ops

import java.awt.image.{BufferedImage, DataBufferByte}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** REAL multimodal codecs on JDK-only libraries — the production upgrade of
  * [[Multimodal]]'s documented decode stub.
  *
  * Payload synthesis is deterministic: every pixel/sample is a closed-form
  * integer function of `doc_id`, so the DuckDB oracle can recompute the
  * decoded features from the formula alone — the hash match then proves the
  * codec ROUND-TRIP (synthesize -> encode PNG/WAV -> shuffle as opaque
  * binary -> `ImageIO.read` / `AudioSystem.getAudioInputStream` decode ->
  * feature) is bit-exact, not that two stubs agree.
  *
  * Codecs used (all in every JDK 17, no new libraryDependencies):
  *  - image: PNG via `javax.imageio` (lossless RGB, so channel values
  *    round-trip exactly);
  *  - audio: WAV/PCM s16le mono via `javax.sound.sampled` (uncompressed,
  *    exact);
  *  - video: a length-prefixed container of PNG keyframes (the usual
  *    demux -> per-frame decode shape; a real demuxer slots into
  *    [[decodedFrames]]' seam unchanged).
  *
  * Distribution shape: synthesis and decode both run inside `mapPartitions`
  * over typed Datasets — one codec context per partition, streaming
  * iterator in/out, payload bytes never interpreted by Catalyst and never
  * collected to the driver. At 100 TB the media column stays opaque binary
  * in parquet; only the decode stage (embarrassingly parallel, no shuffle)
  * touches pixels.
  *
  * Reference anchor: the reference pipeline ships events as opaque payloads
  * and parses at the consumer edge (qradar/qradarconnector.py:139-151);
  * this is the same contract for media bytes.
  */
object MediaCodec {

  // ImageIO defaults to DISK-backed stream caching: every ImageIO.read /
  // ImageIO.write without this flag creates (and deletes) a temp cache
  // FILE in java.io.tmpdir — one file-system round-trip per 16x16 image,
  // paid per row in every decode family query (guide §1.2 "per-task
  // work"). Memory caching changes only the stream buffering, never the
  // encoded/decoded bytes (PNG output is byte-identical; MediaCodecSpec
  // pins the features). Executor-side: the object initializes on first
  // use inside each task's classloader, so the flag applies wherever the
  // codec runs.
  javax.imageio.ImageIO.setUseCache(false)

  // ---- closed-form content (mirrored verbatim by the DuckDB oracle) ----

  /** Image: 16x16 RGB, flattened channel i of 768 gets (docId*31+i*i*13)%256. */
  val ImgW = 16
  val ImgH = 16
  def imageChannel(docId: Long, i: Int): Int =
    ((docId * 31 + i.toLong * i * 13) % 256).toInt

  /** Audio: 2048 PCM samples, s(i) = ((docId*17+i*i*5) % 4097) - 2048. */
  val AudioSamples = 2048
  def audioSample(docId: Long, i: Int): Int =
    (((docId * 17 + i.toLong * i * 5) % 4097) - 2048).toInt

  /** Video: 6+(docId%4) PNG keyframes of 8x8; frame f draws from one of 32
    * content seeds, so repeated stills exist across the corpus (the thing
    * frame-dedup exists to strip) while adjacent-frame energy still jumps
    * (the thing scene-cut exists to find).
    */
  val FrameW = 8
  val FrameH = 8
  def videoFrameCount(docId: Long): Int = (6 + docId % 4).toInt
  def frameSeed(docId: Long, f: Int): Long = (docId * 3 + f.toLong * 7) % 32
  def framePixel(seed: Long, i: Int): Int =
    ((seed * 29 + i.toLong * i * 11) % 256).toInt

  // ---- encoders (executor-side; deterministic bytes) ----

  /** Encode a w x h image whose flattened BGR channel i is chan(i), as PNG. */
  def encodePng(w: Int, h: Int, chan: Int => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    val data = img.getRaster.getDataBuffer.asInstanceOf[DataBufferByte].getData
    var i = 0
    while (i < data.length) { data(i) = chan(i).toByte; i += 1 }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Encode docId's audio clip as a real WAV (PCM s16le mono 8 kHz). */
  def encodeWav(docId: Long): Array[Byte] = {
    val raw = new Array[Byte](AudioSamples * 2)
    val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < AudioSamples) { bb.putShort(audioSample(docId, i).toShort); i += 1 }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(raw), fmt, AudioSamples.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Encode docId's clip: [int32 nFrames] then per frame [int32 len][png]. */
  def encodeVideo(docId: Long): Array[Byte] = {
    val nf = videoFrameCount(docId)
    val bos = new ByteArrayOutputStream()
    val dos = new DataOutputStream(bos)
    dos.writeInt(nf)
    var f = 0
    while (f < nf) {
      val seed = frameSeed(docId, f)
      val png = encodePng(FrameW, FrameH, i => framePixel(seed, i))
      dos.writeInt(png.length)
      dos.write(png)
      f += 1
    }
    dos.flush()
    bos.toByteArray
  }

  // ---- decoders (executor-side; REAL codec reads) ----

  /** Canonical decoded pixel bytes: r,g,b per pixel in (y,x) order — a
    * representation-independent content key (two frames hash equal iff
    * their decoded pixels are equal, whatever the reader's raster layout).
    */
  def pixelBytes(img: BufferedImage): Array[Byte] = {
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Byte](w * h * 3)
    var p = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        out(p) = ((rgb >> 16) & 0xFF).toByte
        out(p + 1) = ((rgb >> 8) & 0xFF).toByte
        out(p + 2) = (rgb & 0xFF).toByte
        p += 3
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode a PNG payload; returns (width, height, sum of all channel values). */
  def decodeImage(bytes: Array[Byte]): (Int, Int, Long) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    val px = pixelBytes(img)
    var s = 0L
    var i = 0
    while (i < px.length) { s += px(i) & 0xFFL; i += 1 }
    (img.getWidth, img.getHeight, s)
  }

  /** Decode a WAV payload to signed 16-bit samples via javax.sound. */
  def decodeWav(bytes: Array[Byte]): Array[Int] = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
      s"expected PCM s16 mono, got $fmt")
    val raw = ais.readAllBytes()
    val bb = ByteBuffer.wrap(raw)
      .order(if (fmt.isBigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Int](raw.length / 2)
    var i = 0
    while (i < out.length) { out(i) = bb.getShort(i * 2).toInt; i += 1 }
    out
  }

  /** Demux a video payload into (frameIdx, decodedImage) pairs. */
  def decodeVideo(bytes: Array[Byte]): Iterator[(Int, BufferedImage)] = {
    val dis = new DataInputStream(new ByteArrayInputStream(bytes))
    val nf = dis.readInt()
    (0 until nf).iterator.map { f =>
      val len = dis.readInt()
      val png = new Array[Byte](len)
      dis.readFully(png)
      (f, ImageIO.read(new ByteArrayInputStream(png)))
    }
  }

  // ---- Spark surface ----

  /** Real-payload media table: doc_id -> (kind, encoded bytes). Encoding is
    * per-partition streaming work (no shuffle, no driver bytes); doc_id%3
    * picks the modality, matching the oracle's WHERE partition exactly.
    *
    * `only` restricts the table to one modality BEFORE the encode stage:
    * a single-modality consumer (frame dedup, VAD) must not pay PNG/WAV
    * encoding for the ~2/3 of docs it then discards — the doc_id%3 filter
    * is a cheap scan predicate, the encode is the expensive stage.
    */
  def mediaTable(spark: SparkSession, documents: DataFrame,
                 only: Option[String] = None): Dataset[Multimodal.MediaRecord] = {
    import spark.implicits._
    val ids = documents.select(col("doc_id")).where(col("doc_id").isNotNull)
    val picked = only match {
      case Some("image") => ids.where(col("doc_id") % 3 === 0)
      case Some("audio") => ids.where(col("doc_id") % 3 === 1)
      case Some("video") => ids.where(col("doc_id") % 3 === 2)
      case Some(k) => throw new IllegalArgumentException(s"unknown media kind $k")
      case None => ids
    }
    picked.as[Long]
      .mapPartitions { it =>
        it.map { id =>
          (id % 3) match {
            case 0 => Multimodal.MediaRecord(id, "image", encodePng(ImgW, ImgH, i => imageChannel(id, i)))
            case 1 => Multimodal.MediaRecord(id, "audio", encodeWav(id))
            case _ => Multimodal.MediaRecord(id, "video", encodeVideo(id))
          }
        }
      }
  }

  /** Per-doc decoded features: n_units = pixels / samples / frames, feat =
    * the decoded content census (channel sum / abs-sample sum / sum of
    * per-frame pixel sums). One real codec decode per row.
    */
  case class DecodedFeatures(doc_id: Long, kind: String, n_units: Long, feat: Long)

  def decodeFeatures(spark: SparkSession, media: Dataset[Multimodal.MediaRecord]): Dataset[DecodedFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        r.kind match {
          case "image" =>
            val (w, h, s) = decodeImage(r.media)
            DecodedFeatures(r.doc_id, r.kind, w.toLong * h, s)
          case "audio" =>
            val samples = decodeWav(r.media)
            var s = 0L
            var i = 0
            while (i < samples.length) { s += math.abs(samples(i)).toLong; i += 1 }
            DecodedFeatures(r.doc_id, r.kind, samples.length.toLong, s)
          case _ =>
            var nf = 0L
            var s = 0L
            decodeVideo(r.media).foreach { case (_, img) =>
              val px = pixelBytes(img)
              var i = 0
              while (i < px.length) { s += px(i) & 0xFFL; i += 1 }
              nf += 1
            }
            DecodedFeatures(r.doc_id, r.kind, nf, s)
        }
      }
    }
  }

  /** One demuxed+decoded video frame: content hash over canonical pixel
    * bytes (so equality == decoded-pixel equality) and integer energy
    * (= pixel-value sum, the histogram stand-in scene-cut thresholds).
    */
  case class DecodedFrame(doc_id: Long, frame_idx: Int, px_md5: String, energy: Long)

  def decodedFrames(spark: SparkSession, media: Dataset[Multimodal.MediaRecord]): Dataset[DecodedFrame] = {
    import spark.implicits._
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.filter(_.kind == "video").flatMap { r =>
        decodeVideo(r.media).map { case (f, img) =>
          val px = pixelBytes(img)
          var s = 0L
          var i = 0
          while (i < px.length) { s += px(i) & 0xFFL; i += 1 }
          md.reset()
          val h = md.digest(px).map(b => f"${b & 0xFF}%02x").mkString
          DecodedFrame(r.doc_id, f, h, s)
        }
      }
    }
  }

  /** Real-PCM VAD chunks: decode WAV, window into `chunkSamples`-sample
    * chunks, energy = sum |sample| (integer-exact RMS stand-in).
    */
  case class PcmChunk(doc_id: Long, chunk_idx: Int, n_samples: Long, energy: Long)

  def vadChunks(spark: SparkSession, media: Dataset[Multimodal.MediaRecord],
                chunkSamples: Int = 256): Dataset[PcmChunk] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.filter(_.kind == "audio").flatMap { r =>
        val samples = decodeWav(r.media)
        samples.grouped(chunkSamples).zipWithIndex.map { case (chunk, ci) =>
          var e = 0L
          var i = 0
          while (i < chunk.length) { e += math.abs(chunk(i)).toLong; i += 1 }
          PcmChunk(r.doc_id, ci, chunk.length.toLong, e)
        }
      }
    }
  }
}
