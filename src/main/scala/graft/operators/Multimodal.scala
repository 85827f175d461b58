package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.9): media as opaque binary
  * columns with typed metadata, processed by per-partition batch UDFs.
  *
  * DECODE is real for the formats implementable from their public specs
  * with zero codec dependencies — PPM (P6) and BMP (24-bit uncompressed)
  * pixels, non-interlaced 8-bit RGB/RGBA/palette PNG (zlib via the JDK's
  * Inflater + the 5 per-row filters), WAV 16-bit PCM samples — with
  * matching encoders for fixtures and sinks; [[decodeStats]] dispatches
  * on the magic bytes. Genuinely codec-bound formats (JPEG/MP3 — no
  * codecs in this container) still fall to the clearly-marked
  * deterministic STUB histogram, and every Spark-side piece around
  * either path is real and
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

  // ---- PNG (non-interlaced, 8-bit, RGB/RGBA/palette): the one compressed
  // image format decodable with ZERO codec dependencies — zlib lives in
  // the JDK (java.util.zip.Inflater), and the rest is the public spec's
  // chunk walk (CRC32-validated) plus the 5 per-row filters. RGBA's
  // alpha is dropped on decode (stats/phash work on RGB).

  private def beInt(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
  private def wrBe32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
    out.write((v >>> 8) & 0xff); out.write(v & 0xff)
  }
  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** PNG Paeth predictor (spec §9.4), on unsigned byte values. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode 8-bit RGB (or RGBA when `alpha` is given) as a valid
    * non-interlaced PNG. `rowFilter` picks the filter type (0–4) per
    * row — the spec round-trips all five against the decoder's
    * unfiltering; production callers keep the default 0.
    */
  def encodePng(w: Int, h: Int, rgb: Array[Byte],
      alpha: Option[Array[Byte]] = None,
      rowFilter: Int => Int = _ => 0): Array[Byte] = {
    require(rgb.length == w * h * 3, s"need ${w * h * 3} bytes")
    alpha.foreach(a => require(a.length == w * h, s"need ${w * h} alpha"))
    val bpp = if (alpha.isDefined) 4 else 3
    val stride = w * bpp
    val px = alpha match {
      case None => rgb
      case Some(al) =>
        val out = new Array[Byte](w * h * 4)
        var i = 0
        while (i < w * h) {
          out(i * 4) = rgb(i * 3); out(i * 4 + 1) = rgb(i * 3 + 1)
          out(i * 4 + 2) = rgb(i * 3 + 2); out(i * 4 + 3) = al(i)
          i += 1
        }
        out
    }
    val raw = filterRows(w, h, bpp, px, rowFilter)
    pngContainer(w, h, if (alpha.isDefined) 6 else 2, raw, None)
  }

  /** Encode an 8-bit indexed (color type 3) PNG: `palette` is packed RGB
    * (3 bytes per entry, ≤256 entries), `idx` one palette index per
    * pixel. The spec round-trips this against the palette decode path.
    */
  def encodePngPalette(w: Int, h: Int, palette: Array[Byte],
      idx: Array[Byte], rowFilter: Int => Int = _ => 0): Array[Byte] = {
    require(palette.length % 3 == 0 && palette.length <= 256 * 3,
      s"palette must be ≤256 packed RGB entries, got ${palette.length} bytes")
    require(idx.length == w * h, s"need ${w * h} index bytes")
    idx.foreach(b => require((b & 0xff) < palette.length / 3,
      s"index ${b & 0xff} outside ${palette.length / 3}-entry palette"))
    val raw = filterRows(w, h, bpp = 1, idx, rowFilter)
    pngContainer(w, h, colorType = 3, raw, Some(palette))
  }

  /** Forward PNG row filtering (the inverse of the decoder's unfilter). */
  private def filterRows(w: Int, h: Int, bpp: Int, px: Array[Byte],
      rowFilter: Int => Int): Array[Byte] = {
    val stride = w * bpp
    val raw = new Array[Byte](h * (1 + stride))
    var y = 0
    while (y < h) {
      val ft = rowFilter(y)
      require(ft >= 0 && ft <= 4, s"filter type $ft")
      raw(y * (1 + stride)) = ft.toByte
      var k = 0
      while (k < stride) {
        val x = px(y * stride + k) & 0xff
        val a = if (k >= bpp) px(y * stride + k - bpp) & 0xff else 0
        val b = if (y > 0) px((y - 1) * stride + k) & 0xff else 0
        val c = if (y > 0 && k >= bpp) px((y - 1) * stride + k - bpp) & 0xff
          else 0
        val f = ft match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - (a + b) / 2
          case 4 => x - paeth(a, b, c)
        }
        raw(y * (1 + stride) + 1 + k) = (f & 0xff).toByte
        k += 1
      }
      y += 1
    }
    raw
  }

  /** Deflate filtered scanlines and wrap them in the PNG chunk container
    * (IHDR [PLTE] IDAT IEND, each CRC-stamped).
    */
  private def pngContainer(w: Int, h: Int, colorType: Int,
      raw: Array[Byte], plte: Option[Array[Byte]]): Array[Byte] = {
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val zBuf = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) {
      val n = deflater.deflate(tmp)
      zBuf.write(tmp, 0, n)
    }
    deflater.end()
    val out = new java.io.ByteArrayOutputStream(64 + zBuf.size())
    out.write(PngSig, 0, PngSig.length)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      wrBe32(out, data.length)
      val t = typ.getBytes("US-ASCII")
      out.write(t, 0, 4)
      out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(t, 0, 4); crc.update(data, 0, data.length)
      wrBe32(out, crc.getValue.toInt)
    }
    val ihdr = new java.io.ByteArrayOutputStream(13)
    wrBe32(ihdr, w); wrBe32(ihdr, h)
    ihdr.write(8); ihdr.write(colorType)
    ihdr.write(0); ihdr.write(0); ihdr.write(0)
    chunk("IHDR", ihdr.toByteArray)
    plte.foreach(chunk("PLTE", _))
    chunk("IDAT", zBuf.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** (width, height, packed RGB top-down) of a non-interlaced 8-bit
    * RGB/RGBA/palette PNG. Chunk CRCs are validated; RGBA's alpha is
    * dropped; palette (color type 3) indices resolve through PLTE.
    * Corrupt streams (bad CRC, truncated zlib, wrong lengths, a hostile
    * IHDR whose w×h would overflow the scanline allocation) refuse
    * loudly — the extraction wrappers count them as kind='corrupt'.
    * Palette transparency (tRNS) refuses loudly too: silently treating
    * transparent indices as opaque would corrupt perceptual hashes.
    */
  private[graft] def decodePng(blob: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(blob.length >= 8 && java.util.Arrays.equals(
      java.util.Arrays.copyOf(blob, 8), PngSig), "not PNG")
    var i = 8
    var w = 0; var h = 0; var colorType = -1
    var plte: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var seenEnd = false
    while (!seenEnd) {
      require(i + 12 <= blob.length, "truncated chunk header")
      val len = beInt(blob, i)
      require(len >= 0 && i + 12L + len <= blob.length,
        s"corrupt chunk size $len at offset $i")
      val typ = new String(blob, i + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(blob, i + 4, 4 + len)
      require(crc.getValue.toInt == beInt(blob, i + 8 + len),
        s"bad CRC for chunk $typ")
      typ match {
        case "IHDR" =>
          require(len == 13, "bad IHDR length")
          w = beInt(blob, i + 8); h = beInt(blob, i + 12)
          val bitDepth = blob(i + 16) & 0xff
          colorType = blob(i + 17) & 0xff
          require(bitDepth == 8, s"only 8-bit supported, got $bitDepth")
          require(colorType == 2 || colorType == 3 || colorType == 6,
            s"only RGB/palette/RGBA supported, got color type $colorType")
          require((blob(i + 18) & 0xff) == 0 && (blob(i + 19) & 0xff) == 0,
            "unknown compression/filter method")
          require((blob(i + 20) & 0xff) == 0, "interlaced PNG unsupported")
          // per-axis caps AND a total-pixel cap: a CRC-valid hostile
          // IHDR (2^20 × 2^20) would otherwise overflow h*(1+stride)
          // into a negative allocation before the zlib length check
          require(w > 0 && h > 0 && w <= (1 << 20) && h <= (1 << 20) &&
            w.toLong * h <= (1L << 26),
            s"bad dimensions ${w}x$h")
        case "PLTE" =>
          require(len % 3 == 0 && len > 0 && len <= 256 * 3,
            s"bad PLTE length $len")
          plte = java.util.Arrays.copyOfRange(blob, i + 8, i + 8 + len)
        case "tRNS" =>
          require(colorType != 3,
            "palette transparency (tRNS) unsupported — refusing rather " +
              "than decoding transparent indices as opaque")
        case "IDAT" => idat.write(blob, i + 8, len)
        case "IEND" => seenEnd = true
        case _      => () // ancillary chunks skip cleanly
      }
      i += 12 + len
    }
    require(colorType >= 0, "no IHDR chunk")
    require(colorType != 3 || plte != null, "palette PNG without PLTE")
    val bpp = colorType match {
      case 6 => 4
      case 3 => 1
      case _ => 3
    }
    val stride = w * bpp
    val raw = new Array[Byte](h * (1 + stride))
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var off = 0
    try {
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        require(n > 0 || !inf.needsInput(), "truncated zlib stream")
        off += n
      }
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(s"corrupt zlib stream: ${e.getMessage}")
    } finally inf.end()
    require(off == raw.length, s"short pixel data: $off of ${raw.length}")
    // unfilter (spec §9): each row's filter byte then recon in place
    val px = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val ft = raw(y * (1 + stride)) & 0xff
      require(ft <= 4, s"unknown filter type $ft")
      var k = 0
      while (k < stride) {
        val f = raw(y * (1 + stride) + 1 + k) & 0xff
        val a = if (k >= bpp) px(y * stride + k - bpp) & 0xff else 0
        val b = if (y > 0) px((y - 1) * stride + k) & 0xff else 0
        val c = if (y > 0 && k >= bpp) px((y - 1) * stride + k - bpp) & 0xff
          else 0
        val recon = ft match {
          case 0 => f
          case 1 => f + a
          case 2 => f + b
          case 3 => f + (a + b) / 2
          case 4 => f + paeth(a, b, c)
        }
        px(y * stride + k) = (recon & 0xff).toByte
        k += 1
      }
      y += 1
    }
    colorType match {
      case 2 => (w, h, px)
      case 3 =>
        // palette lookup: one PLTE entry per index byte
        val entries = plte.length / 3
        val rgb = new Array[Byte](w * h * 3)
        var p = 0
        while (p < w * h) {
          val ix = px(p) & 0xff
          require(ix < entries, s"palette index $ix outside $entries entries")
          rgb(p * 3) = plte(ix * 3); rgb(p * 3 + 1) = plte(ix * 3 + 1)
          rgb(p * 3 + 2) = plte(ix * 3 + 2)
          p += 1
        }
        (w, h, rgb)
      case _ =>
        val rgb = new Array[Byte](w * h * 3)
        var p = 0
        while (p < w * h) {
          rgb(p * 3) = px(p * 4); rgb(p * 3 + 1) = px(p * 4 + 1)
          rgb(p * 3 + 2) = px(p * 4 + 2)
          p += 1
        }
        (w, h, rgb)
    }
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

  /** Magic-byte dispatch to the real IMAGE decoders (PPM/BMP/PNG);
    * None for non-images and codec-bound formats.
    */
  private[graft] def decodeImage(blob: Array[Byte])
      : Option[(String, Int, Int, Array[Byte])] =
    if (blob.length >= 2 && blob(0) == 'P' && blob(1) == '6') {
      val (w, h, rgb) = decodePpm(blob); Some(("ppm", w, h, rgb))
    } else if (blob.length >= 2 && blob(0) == 'B' && blob(1) == 'M') {
      val (w, h, rgb) = decodeBmp(blob); Some(("bmp", w, h, rgb))
    } else if (blob.length >= 8 && java.util.Arrays.equals(
        java.util.Arrays.copyOf(blob, 8), PngSig)) {
      val (w, h, rgb) = decodePng(blob); Some(("png", w, h, rgb))
    } else None

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
    val img = decodeImage(blob)
    if (img.isDefined) {
      val (kind, _, _, rgb) = img.get
      Some(imageStats(kind, rgb))
    }
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

  /** STUB decoder for CODEC-BOUND formats only (JPEG/MP3 — no codecs
    * in this container): a real implementation would decode and
    * extract model features; here it computes a 16-bin byte histogram,
    * normalized — deterministic, schema-identical to a real extractor.
    * PPM/BMP/PNG/WAV take the REAL decoders above via [[decodeStats]].
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

  /** Deterministic PNG fixture over the SAME pixel field as
    * [[syntheticCodecTable]]'s images ([[synthPixels]]): every doc_id
    * encodes as a genuine zlib-compressed PNG — RGB for even ids, RGBA
    * for odd ids (alpha = (17d+11i)%256, which decode must DROP — a
    * decoder that leaks alpha into the pixel stream shifts the stats) —
    * with the row filter varying (d+y)%5, so all five unfilter rules sit
    * on the value-gated path, not just the spec.
    */
  def syntheticPngTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { d =>
          val (w, h, rgb) = synthPixels(d)
          val alpha =
            if (d % 2 == 0) None
            else Some(Array.tabulate(w * h)(i =>
              ((17 * d + 11 * i) % 256).toByte))
          (d, encodePng(w, h, rgb, alpha = alpha,
            rowFilter = y => ((d + y) % 5).toInt))
        }
      }.toDF("media_id", "blob")
  }

  /** Palette (color-type 3) PNG fixture over the SAME pixel field as
    * [[syntheticPngTable]]: each image's palette is its distinct colors
    * in first-occurrence order (synthPixels images hold ≤ 48 ≤ 256
    * distinct colors, so the encoding is EXACT), indices per pixel,
    * filter varying (d+y)%5 — so PLTE lookup + index unfiltering sit on
    * the value-gated path (q377). A decoder bug that permutes the
    * palette, mis-sizes PLTE, or leaks index bytes as pixels shifts the
    * replayed stats and reddens the hash.
    */
  def syntheticPalettePngTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { d =>
          val (w, h, rgb) = synthPixels(d)
          val seen = scala.collection.mutable.LinkedHashMap
            .empty[(Byte, Byte, Byte), Int]
          val idx = new Array[Byte](w * h)
          var i = 0
          while (i < w * h) {
            val c = (rgb(3 * i), rgb(3 * i + 1), rgb(3 * i + 2))
            idx(i) = seen.getOrElseUpdate(c, seen.size).toByte
            i += 1
          }
          val plte = new Array[Byte](seen.size * 3)
          seen.foreach { case ((r, g, b), j) =>
            plte(3 * j) = r; plte(3 * j + 1) = g; plte(3 * j + 2) = b
          }
          (d, encodePngPalette(w, h, plte, idx,
            rowFilter = y => ((d + y) % 5).toInt))
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
          try decodeImage(blob) match {
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
        try decodeImage(blob).map { case (_, w, h, rgb) =>
          (id, dHash(rgb, w, h))
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
