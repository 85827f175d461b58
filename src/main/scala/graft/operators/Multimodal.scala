package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.9): media as opaque binary
  * columns with typed metadata, processed by per-partition batch UDFs.
  *
  * DECODE is real for the header+arithmetic formats a few dozen lines
  * can implement from their public specs — PPM (P6) and BMP (24-bit
  * uncompressed) pixels, WAV 16-bit PCM samples — with matching
  * encoders for fixtures and sinks; [[decodeStats]] dispatches on the
  * magic bytes. Codec-bound formats (JPEG/PNG/MP3 — no codecs in this
  * container) still fall to the clearly-marked deterministic STUB
  * histogram, and every Spark-side piece around either path is real and
  * tested: the (blob, struct metadata) schema, partition-parallel
  * execution via typed mapPartitions (the Scala analogue of
  * mapInPandas' batched shape), the feature-vector output schema, and
  * the downstream aggregation over features.
  */
object Multimodal {

  /** Decoded per-media statistics, format-generic:
    * images — `units` = pixels, `sum1` = Σ(r+g+b), `max1` = max(r+g+b);
    * audio  — `units` = samples, `sum1` = Σ s², `max1` = max |s|.
    * Pure integers so an independent engine can replay them exactly.
    */
  final case class DecodedStats(
      kind: String, units: Long, sum1: Long, max1: Long)

  // ---- PPM (P6): "P6" <ws> width <ws> height <ws> maxval '\n' raw RGB.
  // Whitespace may include '#...' comment lines per the netpbm spec.

  def encodePpm(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"need ${w * h * 3} bytes")
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    header ++ rgb
  }

  /** (width, height, packed RGB) of a P6 PPM. Maxval must be 255. */
  private[graft] def decodePpm(blob: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(blob.length >= 2 && blob(0) == 'P' && blob(1) == '6', "not P6")
    var i = 2
    def skipWs(): Unit = {
      var go = true
      while (go && i < blob.length) {
        val c = blob(i)
        if (c == '#') { while (i < blob.length && blob(i) != '\n') i += 1 }
        else if (c == ' ' || c == '\n' || c == '\r' || c == '\t') i += 1
        else go = false
      }
    }
    def int(): Int = {
      skipWs()
      var v = 0
      while (i < blob.length && blob(i) >= '0' && blob(i) <= '9') {
        v = v * 10 + (blob(i) - '0'); i += 1
      }
      v
    }
    val w = int(); val h = int(); val maxv = int()
    require(maxv == 255, s"only maxval 255 supported, got $maxv")
    i += 1 // the single whitespace byte after maxval
    require(blob.length - i >= w * h * 3, "truncated pixel data")
    (w, h, java.util.Arrays.copyOfRange(blob, i, i + w * h * 3))
  }

  // ---- BMP: 14-byte file header + 40-byte BITMAPINFOHEADER, 24 bpp,
  // uncompressed, rows BOTTOM-UP and padded to 4-byte multiples, BGR.

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def rdLe32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def rdLe16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  def encodeBmp(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"need ${w * h * 3} bytes")
    val rowPad = (4 - (w * 3) % 4) % 4
    val dataSize = (w * 3 + rowPad) * h
    val out = new java.io.ByteArrayOutputStream(54 + dataSize)
    out.write('B'); out.write('M')
    out.write(le32(54 + dataSize)); out.write(le32(0)); out.write(le32(54))
    out.write(le32(40)); out.write(le32(w)); out.write(le32(h))
    out.write(le16(1)); out.write(le16(24))
    out.write(le32(0)); out.write(le32(dataSize))
    out.write(le32(2835)); out.write(le32(2835))
    out.write(le32(0)); out.write(le32(0))
    val pad = new Array[Byte](rowPad)
    var y = h - 1 // bottom-up
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val p = (y * w + x) * 3
        out.write(rgb(p + 2)); out.write(rgb(p + 1)); out.write(rgb(p))
        x += 1
      }
      out.write(pad)
      y -= 1
    }
    out.toByteArray
  }

  /** (width, height, packed RGB top-down) of a 24-bpp uncompressed BMP. */
  private[graft] def decodeBmp(blob: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(blob.length >= 54 && blob(0) == 'B' && blob(1) == 'M', "not BMP")
    val off = rdLe32(blob, 10)
    val w = rdLe32(blob, 18)
    val h = rdLe32(blob, 22)
    require(rdLe16(blob, 28) == 24, "only 24 bpp supported")
    require(rdLe32(blob, 30) == 0, "only uncompressed supported")
    require(w > 0 && h > 0 && w <= (1 << 20) && h <= (1 << 20),
      s"bad dimensions ${w}x$h (top-down/negative-height unsupported)")
    val rowPad = (4 - (w * 3) % 4) % 4
    require(off >= 54 &&
      off.toLong + (w.toLong * 3 + rowPad) * h <= blob.length,
      "truncated pixel data")
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val src = off + (h - 1 - y) * (w * 3 + rowPad) // stored bottom-up
      var x = 0
      while (x < w) {
        rgb((y * w + x) * 3) = blob(src + x * 3 + 2)
        rgb((y * w + x) * 3 + 1) = blob(src + x * 3 + 1)
        rgb((y * w + x) * 3 + 2) = blob(src + x * 3)
        x += 1
      }
      y += 1
    }
    (w, h, rgb)
  }

  // ---- WAV: RIFF/WAVE container, PCM (format 1) 16-bit mono/stereo;
  // chunks walked by id+size so extra chunks (LIST, fact) skip cleanly.

  def encodeWavPcm16(samples: Array[Short], sampleRate: Int = 16000)
      : Array[Byte] = {
    val dataSize = samples.length * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataSize)
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32(36 + dataSize))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); out.write(le32(16))
    out.write(le16(1)); out.write(le16(1)) // PCM, mono
    out.write(le32(sampleRate)); out.write(le32(sampleRate * 2))
    out.write(le16(2)); out.write(le16(16))
    out.write("data".getBytes("US-ASCII")); out.write(le32(dataSize))
    samples.foreach(s => out.write(le16(s & 0xffff)))
    out.toByteArray
  }

  /** 16-bit PCM samples (channel-interleaved as stored) of a WAV blob. */
  private[graft] def decodeWavPcm16(blob: Array[Byte]): Array[Short] = {
    require(blob.length >= 44 &&
      new String(blob, 0, 4, "US-ASCII") == "RIFF" &&
      new String(blob, 8, 4, "US-ASCII") == "WAVE", "not RIFF/WAVE")
    var i = 12
    var bits = -1
    var data: Array[Short] = null
    while (i + 8 <= blob.length) {
      val id = new String(blob, i, 4, "US-ASCII")
      val size = rdLe32(blob, i + 4)
      // a corrupt negative/oversized chunk size would otherwise loop
      // forever or read out of bounds — refuse LOUDLY; the extraction
      // wrappers catch and count the blob as corrupt
      require(size >= 0 && i + 8 + size.toLong <= blob.length,
        s"corrupt RIFF chunk '$id' size $size at offset $i")
      if (id == "fmt ") {
        require(rdLe16(blob, i + 8) == 1, "only PCM supported")
        bits = rdLe16(blob, i + 22)
        require(bits == 16, s"only 16-bit PCM supported, got $bits")
      } else if (id == "data") {
        require(bits == 16, "data chunk before fmt")
        data = new Array[Short](size / 2)
        var j = 0
        while (j < data.length) {
          data(j) = rdLe16(blob, i + 8 + j * 2).toShort; j += 1
        }
      }
      i += 8 + size + (size & 1) // chunks are word-aligned
    }
    require(data != null, "no data chunk")
    data
  }

  /** Magic-byte dispatch to the real decoders; None for codec-bound
    * formats (those take the labeled stub-histogram path).
    */
  def decodeStats(blob: Array[Byte]): Option[DecodedStats] = {
    def imageStats(kind: String, rgb: Array[Byte]): DecodedStats = {
      var sum = 0L; var mx = 0L; var i = 0
      while (i < rgb.length) {
        val lum3 = (rgb(i) & 0xff) + (rgb(i + 1) & 0xff) + (rgb(i + 2) & 0xff)
        sum += lum3; if (lum3 > mx) mx = lum3
        i += 3
      }
      DecodedStats(kind, rgb.length / 3, sum, mx)
    }
    if (blob.length >= 2 && blob(0) == 'P' && blob(1) == '6')
      Some(imageStats("ppm", decodePpm(blob)._3))
    else if (blob.length >= 2 && blob(0) == 'B' && blob(1) == 'M')
      Some(imageStats("bmp", decodeBmp(blob)._3))
    else if (blob.length >= 12 &&
        new String(blob, 0, 4, "US-ASCII") == "RIFF" &&
        new String(blob, 8, 4, "US-ASCII") == "WAVE") {
      val s = decodeWavPcm16(blob)
      var ss = 0L; var mx = 0L
      s.foreach { v =>
        ss += v.toLong * v; val a = math.abs(v.toLong); if (a > mx) mx = a
      }
      Some(DecodedStats("wav", s.length, ss, mx))
    } else None
  }

  /** One media row: payload + typed metadata, as a case class so the
    * Dataset encoder gives a stable schema.
    */
  final case class MediaRow(
      media_id: Long,
      mime: String,
      width: Int,
      height: Int,
      blob: Array[Byte])

  final case class MediaFeatures(
      media_id: Long,
      mime: String,
      n_bytes: Int,
      features: Array[Double])

  /** Deterministic synthetic media table derived from documents: the
    * UTF-8 text bytes stand in for an undecodable payload; metadata is a
    * pure function of doc_id.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id").as("media_id"),
        concat(lit("image/fake-"), (col("doc_id") % 3).cast("string")).as("mime"),
        (pmod(col("doc_id"), lit(640)) + 1).cast("int").as("width"),
        (pmod(col("doc_id"), lit(480)) + 1).cast("int").as("height"),
        col("text").cast("binary").as("blob"))

  /** STUB decoder for CODEC-BOUND formats only (JPEG/PNG/MP3 — no
    * codecs in this container): a real implementation would decode and
    * extract model features; here it computes a 16-bin byte histogram,
    * normalized — deterministic, schema-identical to a real extractor.
    * PPM/BMP/WAV take the REAL decoders above via [[decodeStats]].
    */
  private[graft] def decodeFeaturesStub(blob: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](16)
    var i = 0
    while (i < blob.length) { hist((blob(i) & 0xff) / 16) += 1.0; i += 1 }
    val n = math.max(1, blob.length).toDouble
    hist.map(_ / n)
  }

  /** Partition-parallel feature extraction: one decoder invocation per
    * row, batched per partition (no driver materialization, scales with
    * executor count × partitions).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("media_id", "mime", "width", "height", "blob").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { m =>
          MediaFeatures(m.media_id, m.mime, m.blob.length,
            decodeFeaturesStub(m.blob))
        }
      }
  }

  /** Deterministic REAL-FORMAT media fixture derived from documents:
    * one blob per doc_id, encoded as genuine PPM (doc_id%3=0), BMP
    * (doc_id%3=1) or 16-bit PCM WAV (doc_id%3=2) bytes whose pixels/
    * samples are pure doc_id arithmetic — an independent engine can
    * replay the expected luminance/energy statistics exactly, so the
    * decode path is VALUE-gated, not just spec-gated. Pixel i of image
    * d: (r,g,b) = ((7d+3i)%256, (11d+5i)%256, (13d+7i)%256) over
    * w=4+d%5 × h=3+d%4; sample i of clip d: (31d+17i)%2001 − 1000 over
    * n=8+d%9 samples.
    */
  /** The fixture pixel field of doc `d` — shared by the codec table
    * and the cross-format twin builder so both encode the SAME image.
    */
  private[graft] def synthPixels(d: Long): (Int, Int, Array[Byte]) = {
    val w = (4 + d % 5).toInt
    val h = (3 + d % 4).toInt
    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      rgb(i * 3) = ((7 * d + 3 * i) % 256).toByte
      rgb(i * 3 + 1) = ((11 * d + 5 * i) % 256).toByte
      rgb(i * 3 + 2) = ((13 * d + 7 * i) % 256).toByte
      i += 1
    }
    (w, h, rgb)
  }

  def syntheticCodecTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { d =>
          val blob: Array[Byte] =
            if (d % 3 == 2) {
              val n = (8 + d % 9).toInt
              encodeWavPcm16(Array.tabulate(n)(i =>
                (((31 * d + 17 * i) % 2001) - 1000).toShort))
            } else {
              val (w, h, rgb) = synthPixels(d)
              if (d % 3 == 0) encodePpm(w, h, rgb) else encodeBmp(w, h, rgb)
            }
          (d, blob)
        }
      }.toDF("media_id", "blob")
  }

  /** Partition-parallel REAL decode: one [[decodeStats]] per blob,
    * batched per partition; rows whose format has no offline decoder
    * surface with kind='undecodable', and blobs whose known-magic bytes
    * fail to decode (truncation, corrupt headers) surface with
    * kind='corrupt' — counted either way, never dropped silently and
    * never allowed to kill the whole job.
    */
  def extractDecodedStats(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, blob) =>
          try decodeStats(blob) match {
            case Some(s) => (id, s.kind, s.units, s.sum1, s.max1)
            case None => (id, "undecodable", 0L, 0L, 0L)
          } catch { case scala.util.control.NonFatal(_) =>
            (id, "corrupt", 0L, 0L, 0L)
          }
        }
      }.toDF("media_id", "kind", "units", "sum1", "max1")
  }

  /** Nearest-neighbor resize of packed RGB — the standard pre-embedding
    * normalization, in pure integer arithmetic (source pixel of output
    * (x, y) is ((x·w) / ow, (y·h) / oh), floor division) so an
    * independent engine replays it exactly.
    */
  def resizeNearest(
      rgb: Array[Byte], w: Int, h: Int, ow: Int, oh: Int): Array[Byte] = {
    val out = new Array[Byte](ow * oh * 3)
    var y = 0
    while (y < oh) {
      val sy = y * h / oh
      var x = 0
      while (x < ow) {
        val sx = x * w / ow
        val s = (sy * w + sx) * 3
        val d = (y * ow + x) * 3
        out(d) = rgb(s); out(d + 1) = rgb(s + 1); out(d + 2) = rgb(s + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Partition-parallel image RESIZE over decoded pixels: every PPM/BMP
    * blob decodes, resizes to `ow`×`oh`, and surfaces per-image resized
    * luminance stats (exact integers). Non-image blobs pass through
    * with kind='skipped' (counted, never silently dropped).
    */
  def resizedImageStats(
      spark: SparkSession, media: DataFrame, ow: Int, oh: Int): DataFrame = {
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, blob) =>
          def decoded: Option[(String, Int, Int, Array[Byte])] =
            if (blob.length >= 2 && blob(0) == 'P' && blob(1) == '6') {
              val (w, h, rgb) = decodePpm(blob); Some(("ppm", w, h, rgb))
            } else if (blob.length >= 2 && blob(0) == 'B' && blob(1) == 'M') {
              val (w, h, rgb) = decodeBmp(blob); Some(("bmp", w, h, rgb))
            } else None
          try decoded match {
            case Some((kind, w, h, rgb)) =>
              val r = resizeNearest(rgb, w, h, ow, oh)
              var sum = 0L; var mx = 0L; var i = 0
              while (i < r.length) {
                val l3 = (r(i) & 0xff) + (r(i + 1) & 0xff) + (r(i + 2) & 0xff)
                sum += l3; if (l3 > mx) mx = l3
                i += 3
              }
              (id, kind, (ow * oh).toLong, sum, mx)
            case None => (id, "skipped", 0L, 0L, 0L)
          } catch { case scala.util.control.NonFatal(_) =>
            (id, "corrupt", 0L, 0L, 0L)
          }
        }
      }.toDF("media_id", "kind", "px", "lum3_sum", "lum3_max")
  }

  /** Difference-hash (dHash) perceptual fingerprint of decoded pixels:
    * nearest-neighbor resize to (hw+1)×hh, then one bit per horizontal
    * neighbor pair — '1' iff luminance STRICTLY increases left-to-right
    * (lum = r+g+b, exact integers). Returned as the hw·hh-char '0'/'1'
    * string (engine-portable: no 64-bit sign games), row-major.
    * The standard near-dup fingerprint for images: byte-level changes
    * that preserve the luminance GRADIENT field (re-encoding, format
    * conversion, uniform shifts) keep the hash; content changes flip
    * bits proportionally to how much they alter structure.
    */
  def dHash(rgb: Array[Byte], w: Int, h: Int,
      hw: Int = 8, hh: Int = 8): String = {
    val r = resizeNearest(rgb, w, h, hw + 1, hh)
    def lum3(x: Int, y: Int): Int = {
      val p = (y * (hw + 1) + x) * 3
      (r(p) & 0xff) + (r(p + 1) & 0xff) + (r(p + 2) & 0xff)
    }
    val sb = new java.lang.StringBuilder(hw * hh)
    var y = 0
    while (y < hh) {
      var x = 0
      while (x < hw) {
        sb.append(if (lum3(x + 1, y) > lum3(x, y)) '1' else '0')
        x += 1
      }
      y += 1
    }
    sb.toString
  }

  /** Partition-parallel perceptual fingerprints: every decodable image
    * blob surfaces (media_id, phash); non-images and corrupt blobs are
    * dropped HERE (the caller's frame is images-only by contract — use
    * [[extractDecodedStats]] to audit the corpus first).
    */
  def imagePhash(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, blob) =>
        try {
          val decoded =
            if (blob.length >= 2 && blob(0) == 'P' && blob(1) == '6')
              Some(decodePpm(blob))
            else if (blob.length >= 2 && blob(0) == 'B' && blob(1) == 'M')
              Some(decodeBmp(blob))
            else None
          decoded.map { case (w, h, rgb) => (id, dHash(rgb, w, h)) }
        } catch {
          case scala.util.control.NonFatal(_) => None
        }
      }.toDF("media_id", "phash")
  }

  /** Windowed audio frame energy: decoded PCM samples split into
    * `frameLen`-sample frames (final short frame kept), one row per
    * frame with its exact integer energy Σs² — the VAD/segmentation
    * primitive. Non-audio blobs are skipped with a counted marker
    * frame_idx = -1.
    */
  def audioFrameEnergy(
      spark: SparkSession, media: DataFrame, frameLen: Int): DataFrame = {
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, blob) =>
        val isWav = blob.length >= 12 &&
          new String(blob, 0, 4, "US-ASCII") == "RIFF" &&
          new String(blob, 8, 4, "US-ASCII") == "WAVE"
        if (!isWav) Iterator((id, -1, 0L, 0L))
        else try {
          val s = decodeWavPcm16(blob)
          s.grouped(frameLen).zipWithIndex.map { case (fr, i) =>
            (id, i, fr.length.toLong,
              fr.foldLeft(0L)((a, v) => a + v.toLong * v))
          }.toVector.iterator
        } catch { case scala.util.control.NonFatal(_) =>
          Iterator((id, -1, 0L, 0L)) // corrupt clip: counted, not fatal
        }
      }.toDF("media_id", "frame_idx", "n_samples", "energy")
  }

  /** Per-clip waveform statistics over decoded PCM — zero-crossing
    * count (adjacent samples with strictly opposite signs: s·prev < 0,
    * the classic voiced/unvoiced + noisiness feature) and near-silence
    * count (|s| ≤ `silenceAbs`), both exact integers an independent
    * engine replays from the samples. Non-audio and corrupt blobs
    * surface with n_samples = -1 (counted, never dropped or fatal).
    */
  def audioWaveformStats(
      spark: SparkSession, media: DataFrame,
      silenceAbs: Int = 100): DataFrame = {
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .map { case (id, blob) =>
        val isWav = blob.length >= 12 &&
          new String(blob, 0, 4, "US-ASCII") == "RIFF" &&
          new String(blob, 8, 4, "US-ASCII") == "WAVE"
        if (!isWav) (id, -1L, 0L, 0L)
        else try {
          val s = decodeWavPcm16(blob)
          var zc = 0L; var silent = 0L; var i = 0
          while (i < s.length) {
            if (i > 0 && s(i - 1).toLong * s(i) < 0) zc += 1
            if (math.abs(s(i).toInt) <= silenceAbs) silent += 1
            i += 1
          }
          (id, s.length.toLong, zc, silent)
        } catch { case scala.util.control.NonFatal(_) =>
          (id, -1L, 0L, 0L) // corrupt clip: counted, not fatal
        }
      }.toDF("media_id", "n_samples", "zero_crossings", "near_silent")
  }

  /** Frame sampling stub: split the payload into `n` equal byte slices —
    * the plumbing shape of video frame extraction (one row per frame).
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, n: Int): DataFrame = {
    import spark.implicits._
    media.select("media_id", "mime", "width", "height", "blob").as[MediaRow]
      .flatMap { m =>
        val step = math.max(1, m.blob.length / n)
        (0 until n).iterator.map { i =>
          val from = i * step
          val until = math.min(m.blob.length, from + step)
          (m.media_id, i, m.blob.slice(from, until))
        }
      }
      .toDF("media_id", "frame_idx", "frame_blob")
  }
}
