package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("feature extraction is deterministic and normalized") {
    val feats = Multimodal.extractFeatures(spark, Multimodal.mediaTable(spark, sf))
    val rows = feats.collect()
    assert(rows.length == 500)
    rows.take(20).foreach { f =>
      assert(f.features.length == 16)
      assert(math.abs(f.features.sum - 1.0) < 1e-9, "histogram must be normalized")
      assert(f.n_bytes > 0)
    }
    // determinism: second run bit-identical
    val again = Multimodal.extractFeatures(spark, Multimodal.mediaTable(spark, sf))
      .collect()
    assert(rows.sortBy(_.media_id).zip(again.sortBy(_.media_id))
      .forall { case (a, b) => a.features.sameElements(b.features) })
  }

  test("frame sampling covers the payload without driver materialization") {
    val media = Multimodal.mediaTable(spark, sf)
    val frames = Multimodal.sampleFrames(spark, media, n = 4)
    val byMedia = frames.groupBy("media_id")
      .agg(count(lit(1)).as("n"), sum(length(col("frame_blob"))).as("bytes"))
    assert(byMedia.filter(col("n") =!= 4).count() == 0)
    // every sampled byte count ≤ original blob size
    val joined = byMedia.join(
      media.select(col("media_id"), length(col("blob")).as("blob_len")), "media_id")
    assert(joined.filter(col("bytes") > col("blob_len")).count() == 0)
  }

  test("PPM round-trips, including header comments and multi-digit dims") {
    val w = 13; val h = 7 // w*3 not a multiple of 4 — irrelevant for PPM
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 37 + 11) % 256).toByte)
    val enc = Multimodal.encodePpm(w, h, rgb)
    val (dw, dh, drgb) = Multimodal.decodePpm(enc)
    assert((dw, dh) == (w, h) && drgb.sameElements(rgb))
    // a foreign-written header with a comment line must parse too
    val foreign = ("P6\n# written elsewhere\n13 7\n255\n").getBytes("US-ASCII") ++ rgb
    val (fw, fh, frgb) = Multimodal.decodePpm(foreign)
    assert((fw, fh) == (w, h) && frgb.sameElements(rgb))
  }

  test("BMP round-trips across row paddings 0..3") {
    for (w <- 4 to 7; h <- Seq(3, 5)) { // w*3 % 4 covers 0,1,2,3
      val rgb = Array.tabulate(w * h * 3)(i => ((i * 53 + w) % 256).toByte)
      val enc = Multimodal.encodeBmp(w, h, rgb)
      val (dw, dh, drgb) = Multimodal.decodeBmp(enc)
      assert((dw, dh) == (w, h), s"dims for w=$w h=$h")
      assert(drgb.sameElements(rgb),
        s"pixels must survive bottom-up + padding for w=$w h=$h")
    }
  }

  test("WAV PCM16 round-trips, negative samples and odd chunk walk") {
    val samples = Array.tabulate(31)(i => ((i * 997) % 2001 - 1000).toShort)
    val enc = Multimodal.encodeWavPcm16(samples)
    assert(Multimodal.decodeWavPcm16(enc).sameElements(samples))
    // decodeStats dispatch: energy and peak are exact integers
    val st = Multimodal.decodeStats(enc).get
    assert(st.kind == "wav" && st.units == 31)
    assert(st.sum1 == samples.map(s => s.toLong * s).sum)
    assert(st.max1 == samples.map(s => math.abs(s.toLong)).max)
  }

  test("decodeStats dispatches by magic bytes; unknown formats stay " +
      "on the labeled stub path") {
    val rgb = Array.tabulate(4 * 3 * 3)(i => (i % 256).toByte)
    assert(Multimodal.decodeStats(Multimodal.encodePpm(4, 3, rgb))
      .exists(_.kind == "ppm"))
    assert(Multimodal.decodeStats(Multimodal.encodeBmp(4, 3, rgb))
      .exists(_.kind == "bmp"))
    assert(Multimodal.decodeStats("ÿØjpegish".getBytes("ISO-8859-1"))
      .isEmpty, "codec-bound bytes must fall through to the stub")
    // image stats match a direct pixel fold
    val st = Multimodal.decodeStats(Multimodal.encodeBmp(4, 3, rgb)).get
    val lum3 = rgb.grouped(3).map(p =>
      (p(0) & 0xff) + (p(1) & 0xff) + (p(2) & 0xff)).toSeq
    assert(st.units == 12 && st.sum1 == lum3.map(_.toLong).sum &&
      st.max1 == lum3.max.toLong)
  }

  test("dHash: invariant across re-encoding and uniform brightness, " +
      "sensitive to structural change") {
    val w = 7; val h = 5
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 41 + 3) % 200).toByte)
    val hBmp = Multimodal.dHash(
      Multimodal.decodeBmp(Multimodal.encodeBmp(w, h, rgb))._3, w, h)
    val hPpm = Multimodal.dHash(
      Multimodal.decodePpm(Multimodal.encodePpm(w, h, rgb))._3, w, h)
    assert(hBmp == hPpm, "cross-format twins must fingerprint identically")
    assert(hBmp.length == 64 && hBmp.forall(c => c == '0' || c == '1'))
    // uniform brightness shift preserves every gradient
    val brighter = rgb.map(b => ((b & 0xff) + 30).min(255).toByte)
    assert(Multimodal.dHash(brighter, w, h) == hBmp)
    // flipping the image horizontally reverses gradients: bits change
    val flipped = new Array[Byte](rgb.length)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      flipped((y * w + x) * 3 + c) = rgb((y * w + (w - 1 - x)) * 3 + c)
    assert(Multimodal.dHash(flipped, w, h) != hBmp,
      "a structural change must move the fingerprint")
  }

  test("waveform stats: zero crossings and near-silence from decoded PCM") {
    // hand-computed: sign flips at (5,-3), (-3,100), (100,-101) — zero
    // samples never cross (0·x is not < 0); |s| ≤ 100 admits the
    // boundary value 100 but not -101
    val samples = Array[Short](0, 5, -3, 100, -101, 0, 7)
    val blob = Multimodal.encodeWavPcm16(samples)
    import spark.implicits._
    val df = Seq((1L, blob)).toDF("media_id", "blob")
    val r = Multimodal.audioWaveformStats(spark, df).collect().head
    assert(r.getLong(1) == 7L, "n_samples")
    assert(r.getLong(2) == 3L, "zero_crossings")
    assert(r.getLong(3) == 6L, "near_silent")
    // non-audio blobs surface counted (n_samples = -1), never fatal
    val junk = Seq((2L, Array[Byte](1, 2, 3))).toDF("media_id", "blob")
    assert(Multimodal.audioWaveformStats(spark, junk)
      .collect().head.getLong(1) == -1L)
  }

  test("PNG round-trips: all 5 filter types, RGB and RGBA, and the " +
      "cross-format dHash twin") {
    val (w, h) = (7, 6)
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 37 + 11) % 256).toByte)
    // every filter type exercised in one image (row y uses filter y%5),
    // both color types (RGBA's alpha must decode away losslessly)
    val filters = (y: Int) => y % 5
    val png = Multimodal.encodePng(w, h, rgb, rowFilter = filters)
    val (dw0, dh0, drgb0) = Multimodal.decodePng(png)
    assert(dw0 == w && dh0 == h && drgb0.sameElements(rgb))
    val alpha = Array.tabulate(w * h)(i => ((i * 13 + 5) % 256).toByte)
    val rgba = Multimodal.encodePng(w, h, rgb, alpha = Some(alpha),
      rowFilter = filters)
    assert(Multimodal.decodePng(rgba)._3.sameElements(rgb))
    // single-filter round-trips too (isolates each unfilter rule)
    (0 to 4).foreach { ft =>
      val p = Multimodal.encodePng(w, h, rgb, rowFilter = _ => ft)
      assert(Multimodal.decodePng(p)._3.sameElements(rgb), s"filter $ft")
    }
    // decodeStats dispatches PNG by signature
    assert(Multimodal.decodeStats(png).exists(_.kind == "png"))
    // the perceptual hash sees THROUGH the format: the same pixels as
    // PPM, BMP and PNG give one identical dHash
    val ppm = Multimodal.encodePpm(w, h, rgb)
    val bmp = Multimodal.encodeBmp(w, h, rgb)
    val dh = Multimodal.dHash(rgb, w, h)
    Seq(png, rgba, ppm, bmp).foreach { blob =>
      val (_, dw, dhh, drgb) = Multimodal.decodeImage(blob).get
      assert(Multimodal.dHash(drgb, dw, dhh) == dh)
    }
    // corrupt streams refuse loudly: CRC flip and truncated zlib
    val crcFlip = png.clone(); crcFlip(png.length - 1) =
      (crcFlip(png.length - 1) ^ 0x01).toByte
    intercept[IllegalArgumentException](Multimodal.decodePng(crcFlip))
    intercept[IllegalArgumentException](
      Multimodal.decodePng(png.take(png.length / 2) ++
        png.takeRight(12))) // keep a valid IEND so the walk terminates
  }

  test("palette PNG (color type 3): round-trip, cross-format dHash twin, " +
      "tRNS and hostile-IHDR refusal") {
    val (w, h) = (8, 6)
    // 5-entry palette, every filter type exercised across rows
    val palette = Array.tabulate(5 * 3)(i => ((i * 53 + 7) % 256).toByte)
    val idx = Array.tabulate(w * h)(i => ((i * 3 + 1) % 5).toByte)
    val png = Multimodal.encodePngPalette(w, h, palette, idx,
      rowFilter = y => y % 5)
    val (dw, dh2, drgb) = Multimodal.decodePng(png)
    assert(dw == w && dh2 == h)
    // decoded pixels are exactly the palette lookup of each index
    val expect = idx.flatMap { b =>
      val e = (b & 0xff) * 3
      Seq(palette(e), palette(e + 1), palette(e + 2))
    }
    assert(drgb.sameElements(expect))
    // same pixels as truecolor: a palette re-encode of an image must
    // dHash-match its RGB twin (the cross-format dedup contract)
    val truePng = Multimodal.encodePng(w, h, expect)
    val (_, tw, th, trgb) = Multimodal.decodeImage(truePng).get
    assert(Multimodal.dHash(drgb, dw, dh2) == Multimodal.dHash(trgb, tw, th))
    assert(Multimodal.decodeStats(png).exists(_.kind == "png"))
    // palette index outside PLTE refuses at encode time
    intercept[IllegalArgumentException](
      Multimodal.encodePngPalette(2, 1, palette, Array(0.toByte, 9.toByte)))
    // tRNS (palette transparency) refuses loudly rather than decoding
    // transparent indices as opaque
    val withTrns = insertChunkBefore(png, "IDAT", "tRNS", Array(0.toByte))
    val eTrns = intercept[IllegalArgumentException](
      Multimodal.decodePng(withTrns))
    assert(eTrns.getMessage.contains("tRNS"))
    // a CRC-VALID hostile IHDR (2^20 × 2^20) must refuse as a normal
    // IllegalArgumentException, not overflow into a negative allocation
    val hostile = patchIhdrDims(png, 1 << 20, 1 << 20)
    val eDim = intercept[IllegalArgumentException](
      Multimodal.decodePng(hostile))
    assert(eDim.getMessage.contains("bad dimensions"))
  }

  /** Insert a chunk (with a correct CRC) immediately before the first
    * chunk of type `before` — builds hostile-but-well-formed streams.
    */
  private def insertChunkBefore(png: Array[Byte], before: String,
      typ: String, data: Array[Byte]): Array[Byte] = {
    def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    val tBytes = typ.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32()
    crc.update(tBytes); crc.update(data)
    val chunk = be32(data.length) ++ tBytes ++ data ++ be32(crc.getValue.toInt)
    var i = 8
    while (new String(png, i + 4, 4, "US-ASCII") != before)
      i += 12 + (((png(i) & 0xff) << 24) | ((png(i + 1) & 0xff) << 16) |
        ((png(i + 2) & 0xff) << 8) | (png(i + 3) & 0xff))
    png.take(i) ++ chunk ++ png.drop(i)
  }

  /** Overwrite IHDR's width/height and restamp its CRC. */
  private def patchIhdrDims(png: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = png.clone()
    def wr32(o: Int, v: Int): Unit = {
      out(o) = (v >>> 24).toByte; out(o + 1) = (v >>> 16).toByte
      out(o + 2) = (v >>> 8).toByte; out(o + 3) = v.toByte
    }
    wr32(16, w); wr32(20, h) // IHDR data starts at offset 16
    val crc = new java.util.zip.CRC32()
    crc.update(out, 12, 4 + 13) // type + data
    wr32(16 + 13, crc.getValue.toInt)
    out
  }

  test("stub decoder histogram matches a local recomputation") {
    val one = Multimodal.mediaTable(spark, sf)
      .filter(col("media_id") === 0).select("blob").collect()(0)
      .getAs[Array[Byte]](0)
    val viaSpark = Multimodal.extractFeatures(spark,
      Multimodal.mediaTable(spark, sf).filter(col("media_id") === 0))
      .collect()(0).features
    assert(viaSpark.sameElements(Multimodal.decodeFeaturesStub(one)))
  }
}
