package graft.queries

import graft.QueryDef
import graft.operators.{Multimodal => MM}
import org.apache.spark.sql.functions._

/** Multimodal-column queries (SURVEY.md §2.9). q70 is SQL-backed: byte
  * length of the synthesized blob is engine-portable (UTF-8 octet
  * length). The feature/frame paths are Spark-only (the stub decoder has
  * no SQL analogue) and are asserted in MultimodalSpec.
  */
object Multimodal {

  def defs: Seq[QueryDef] = Seq(
    QueryDef.sqlBacked(
      "q70_blob_stats",
      """SELECT CAST(doc_id % 3 AS BIGINT) AS mime_class,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        |  CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes
        |FROM documents
        |GROUP BY 1
        |ORDER BY mime_class""".stripMargin) { (s, dir) =>
      MM.mediaTable(s, dir)
        .groupBy((col("media_id") % 3).as("mime_class"))
        .agg(count(lit(1)).as("n"),
          sum(length(col("blob"))).cast("long").as("total_bytes"),
          max(length(col("blob"))).cast("long").as("max_bytes"))
        .orderBy(col("mime_class"))
    },

    // Feature extraction through the typed mapPartitions path, aggregated
    // per mime class. The stub decoder is a DETERMINISTIC byte-histogram
    // (operators/Multimodal.decodeFeaturesStub), so its arithmetic is
    // DuckDB-recomputable: un-normalizing bin 6 (features[7] · n_bytes,
    // exactly the count of bytes 0x60-0x6F) turns the feature vector
    // into an integer the oracle derives with a byte-class regex — the
    // whole decode→feature→aggregate plumbing is driver-hash-gated.
    QueryDef.sqlBacked(
      "q71_media_features",
      """SELECT 'image/fake-' || CAST(doc_id % 3 AS VARCHAR) AS mime,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        |  CAST(SUM(octet_length(encode(text)) - octet_length(encode(
        |    regexp_replace(text, '[\x60-\x6F]', '', 'g')))) AS BIGINT)
        |    AS bin6_bytes
        |FROM documents
        |GROUP BY 1 ORDER BY mime""".stripMargin) { (s, dir) =>
      val feats = MM.extractFeatures(s, MM.mediaTable(s, dir))
      feats.toDF()
        .groupBy(col("mime"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_bytes")).cast("long").as("total_bytes"),
          // un-normalize bin 6: features are hist/n_bytes, so
          // round(f[6]·n_bytes) recovers the exact byte count
          sum(round(element_at(col("features"), 7) * col("n_bytes"))
            .cast("long")).as("bin6_bytes"))
        .orderBy(col("mime"))
    },

    // Frame sampling: one row per (media, frame) slice. The stub slices
    // the payload into n equal `len/n`-byte windows (tail truncated),
    // integer arithmetic the oracle replays per doc against range(4).
    QueryDef.sqlBacked(
      "q72_frame_sample",
      """WITH d AS (SELECT doc_id, octet_length(encode(text)) AS L
        |           FROM documents),
        |f AS (SELECT doc_id, L, greatest(1, L // 4) AS step FROM d),
        |fr AS (SELECT CAST(i.range AS INTEGER) AS frame_idx,
        |         greatest(0, least(L, (i.range + 1) * step)
        |           - i.range * step) AS b
        |       FROM f CROSS JOIN range(4) i)
        |SELECT frame_idx, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(b) AS BIGINT) AS total_bytes
        |FROM fr GROUP BY 1 ORDER BY frame_idx""".stripMargin) { (s, dir) =>
      MM.sampleFrames(s, MM.mediaTable(s, dir), n = 4)
        .groupBy(col("frame_idx"))
        .agg(count(lit(1)).as("n"),
          sum(length(col("frame_blob"))).cast("long").as("total_bytes"))
        .orderBy(col("frame_idx"))
    },

    // Exact media dedup: md5 over the opaque BINARY blob (never the
    // decoded content), over a corpus with planted byte-exact copies of
    // every 10th blob — the image-dedup pass of a multimodal pipeline.
    QueryDef.sqlBacked(
      "q75_media_dedup",
      """WITH media AS (
        |  SELECT doc_id AS media_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000 AS media_id, text
        |  FROM documents WHERE doc_id % 10 = 0)
        |SELECT md5(text) AS fp, CAST(COUNT(*) AS BIGINT) AS n_copies,
        |  MIN(media_id) AS keeper
        |FROM media
        |GROUP BY 1
        |HAVING COUNT(*) > 1
        |ORDER BY keeper""".stripMargin) { (s, dir) =>
      val m = MM.mediaTable(s, dir).select(col("media_id"), col("blob"))
      val corpus = m.unionAll(
        m.filter(col("media_id") % 10 === 0)
          .select((col("media_id") + 100000).as("media_id"), col("blob")))
      corpus
        .groupBy(md5(col("blob")).as("fp"))
        .agg(count(lit(1)).as("n_copies"), min(col("media_id")).as("keeper"))
        .filter(col("n_copies") > 1)
        .orderBy(col("keeper"))
    },

    // REAL codec-free decode, value-gated: genuine PPM/BMP/WAV blobs
    // (headers, BMP bottom-up row padding, RIFF chunk walk — the full
    // formats) are built per document from pure doc_id arithmetic,
    // decoded by operators/Multimodal's real decoders, and the per-kind
    // luminance/energy statistics must match DuckDB's independent
    // replay of the same pixel/sample formulas — a decoder bug (wrong
    // channel order, padding slip, off-by-one header) shifts the sums
    // and reddens the hash. The stub now covers only codec-bound
    // formats (JPEG/MP3), which stay labeled.
    QueryDef.sqlBacked(
      "q344_multimodal_decode",
      """WITH d AS (SELECT doc_id AS d FROM documents),
        |img AS (SELECT d, CASE WHEN d % 3 = 0 THEN 'ppm' ELSE 'bmp' END
        |    AS kind, 4 + d % 5 AS w, 3 + d % 4 AS h
        |  FROM d WHERE d % 3 < 2),
        |px AS (SELECT d, kind, w * h AS units, i.range AS i
        |  FROM img CROSS JOIN range(48) i WHERE i.range < w * h),
        |lum AS (SELECT d, kind, units,
        |    (7 * d + 3 * i) % 256 + (11 * d + 5 * i) % 256
        |      + (13 * d + 7 * i) % 256 AS lum3
        |  FROM px),
        |imgagg AS (SELECT kind, d, units, SUM(lum3) AS s1, MAX(lum3) AS m1
        |  FROM lum GROUP BY 1, 2, 3),
        |wav AS (SELECT d, 8 + d % 9 AS n FROM d WHERE d % 3 = 2),
        |smp AS (SELECT d, n, (31 * d + 17 * i.range) % 2001 - 1000 AS s
        |  FROM wav CROSS JOIN range(17) i WHERE i.range < n),
        |wavagg AS (SELECT 'wav' AS kind, d, n AS units,
        |    SUM(s * s) AS s1, MAX(ABS(s)) AS m1
        |  FROM smp GROUP BY 1, 2, 3),
        |u AS (SELECT * FROM imgagg UNION ALL SELECT * FROM wavagg)
        |SELECT kind, CAST(COUNT(*) AS BIGINT) AS n_media,
        |  CAST(SUM(units) AS BIGINT) AS units,
        |  CAST(SUM(s1) AS BIGINT) AS sum1,
        |  CAST(MAX(m1) AS BIGINT) AS max1
        |FROM u GROUP BY 1 ORDER BY kind""".stripMargin) { (s, dir) =>
      MM.extractDecodedStats(s, MM.syntheticCodecTable(s, dir))
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n_media"),
          sum(col("units")).cast("long").as("units"),
          sum(col("sum1")).cast("long").as("sum1"),
          max(col("max1")).cast("long").as("max1"))
        .orderBy(col("kind"))
    },

    // REAL nearest-neighbor resize over DECODED pixels (the standard
    // pre-embedding normalization): every synthetic PPM/BMP decodes,
    // resizes to 4x3 (source pixel of output (x,y) is ((x·w)/4,(y·h)/3),
    // floor division), and the per-kind resized-luminance sums must
    // match DuckDB's replay of the same index arithmetic — a sampling
    // or stride bug shifts which source pixels survive and reddens the
    // hash. WAV rows pass through counted as 'skipped'.
    QueryDef.sqlBacked(
      "q345_image_resize",
      """WITH d AS (SELECT doc_id AS d FROM documents),
        |img AS (SELECT d, 4 + d % 5 AS w, 3 + d % 4 AS h
        |  FROM d WHERE d % 3 < 2),
        |opx AS (SELECT d, CASE WHEN d % 3 = 0 THEN 'ppm' ELSE 'bmp' END
        |    AS kind, w, h, i.range % 4 AS x, i.range // 4 AS y
        |  FROM img CROSS JOIN range(12) i),
        |src AS (SELECT d, kind,
        |    ((y * h) // 3) * w + ((x * w) // 4) AS i FROM opx),
        |lum AS (SELECT d, kind,
        |    (7 * d + 3 * i) % 256 + (11 * d + 5 * i) % 256
        |      + (13 * d + 7 * i) % 256 AS lum3
        |  FROM src),
        |per AS (SELECT kind, d, SUM(lum3) AS s, MAX(lum3) AS m
        |  FROM lum GROUP BY 1, 2),
        |sk AS (SELECT 'skipped' AS kind, CAST(COUNT(*) AS BIGINT)
        |    AS n_media, CAST(0 AS BIGINT) AS px,
        |    CAST(0 AS BIGINT) AS lum3_sum, CAST(0 AS BIGINT) AS lum3_max
        |  FROM d WHERE d % 3 = 2)
        |SELECT kind, CAST(COUNT(*) AS BIGINT) AS n_media,
        |  CAST(12 * COUNT(*) AS BIGINT) AS px,
        |  CAST(SUM(s) AS BIGINT) AS lum3_sum,
        |  CAST(MAX(m) AS BIGINT) AS lum3_max
        |FROM per GROUP BY 1
        |UNION ALL SELECT * FROM sk
        |ORDER BY kind""".stripMargin) { (s, dir) =>
      MM.resizedImageStats(s, MM.syntheticCodecTable(s, dir), ow = 4, oh = 3)
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n_media"),
          sum(col("px")).cast("long").as("px"),
          sum(col("lum3_sum")).cast("long").as("lum3_sum"),
          max(col("lum3_max")).cast("long").as("lum3_max"))
        .orderBy(col("kind"))
    },

    // Windowed audio FRAME ENERGY over decoded PCM (the VAD /
    // segmentation primitive): each synthetic WAV's samples split into
    // 4-sample frames (final short frame kept), per-frame exact Σs²;
    // the ledger reports per-frame-index clip counts and total energy —
    // DuckDB replays the same sample formula and framing arithmetic.
    QueryDef.sqlBacked(
      "q346_audio_frames",
      """WITH d AS (SELECT doc_id AS d FROM documents WHERE doc_id % 3 = 2),
        |wav AS (SELECT d, 8 + d % 9 AS n FROM d),
        |smp AS (SELECT d, i.range // 4 AS frame_idx,
        |    (31 * d + 17 * i.range) % 2001 - 1000 AS s
        |  FROM wav CROSS JOIN range(17) i WHERE i.range < n),
        |fr AS (SELECT d, frame_idx, CAST(COUNT(*) AS BIGINT) AS n_samples,
        |    SUM(s * s) AS energy
        |  FROM smp GROUP BY 1, 2)
        |SELECT CAST(frame_idx AS INTEGER) AS frame_idx,
        |  CAST(COUNT(*) AS BIGINT) AS n_clips,
        |  CAST(SUM(n_samples) AS BIGINT) AS n_samples,
        |  CAST(SUM(energy) AS BIGINT) AS energy
        |FROM fr GROUP BY 1 ORDER BY frame_idx""".stripMargin) { (s, dir) =>
      MM.audioFrameEnergy(s,
          MM.syntheticCodecTable(s, dir)
            .filter(col("media_id") % 3 === 2), frameLen = 4)
        .groupBy(col("frame_idx"))
        .agg(count(lit(1)).as("n_clips"),
          sum(col("n_samples")).cast("long").as("n_samples"),
          sum(col("energy")).cast("long").as("energy"))
        .orderBy(col("frame_idx"))
    },

    // PERCEPTUAL image dedup (dHash over DECODED pixels): every BMP in
    // the fixture corpus gains a cross-format twin — the SAME pixels
    // re-encoded as PPM — which byte-exact dedup (md5) can never pair
    // but the gradient fingerprint must: resize to 9x8, one bit per
    // horizontal luminance step, fingerprints as portable 64-char bit
    // strings. DuckDB re-derives every fingerprint from the pixel +
    // nearest-neighbor index arithmetic, so a resize stride, channel
    // order, or comparison-direction bug changes group counts and
    // reddens the hash. The md5 control rides the same row — COMPUTED,
    // not hardcoded: blob bytes are a bijection of (format, d mod 1280)
    // (pixel byte 0 = 7d mod 256 recovers d mod 256; width recovers
    // d mod 5; lcm(20, 256) = 1280), so DuckDB replays byte-exact
    // groups from that identity. At sf0.1 the formulas genuinely
    // collide (period 1280 < corpus size) and both engines must agree
    // on the real collision count — the hardcoded-zero version of this
    // control went red there.
    QueryDef.sqlBacked(
      "q351_image_phash",
      """WITH d AS (SELECT doc_id AS d FROM documents WHERE doc_id % 3 < 2),
        |img AS (SELECT d, 4 + d % 5 AS w, 3 + d % 4 AS h FROM d),
        |px AS (SELECT d, i.range AS o,
        |    ((i.range // 8) * h // 8) * w + ((i.range % 8) * w // 9)
        |      AS ia,
        |    ((i.range // 8) * h // 8) * w + (((i.range % 8) + 1) * w // 9)
        |      AS ib
        |  FROM img CROSS JOIN range(64) i),
        |bits AS (SELECT d, o, CASE WHEN
        |    (7*d + 3*ib) % 256 + (11*d + 5*ib) % 256 + (13*d + 7*ib) % 256
        |    > (7*d + 3*ia) % 256 + (11*d + 5*ia) % 256
        |      + (13*d + 7*ia) % 256
        |  THEN '1' ELSE '0' END AS b FROM px),
        |ph AS (SELECT d, string_agg(b, '' ORDER BY o) AS phash
        |  FROM bits GROUP BY d),
        |corpus AS (SELECT d AS media_id, phash FROM ph
        |  UNION ALL SELECT d + 1000000, phash FROM ph WHERE d % 3 = 1),
        |g AS (SELECT phash, CAST(COUNT(*) AS BIGINT) AS n FROM corpus
        |  GROUP BY 1),
        |mfmt AS (SELECT d, CASE WHEN d % 3 = 0 THEN 'ppm' ELSE 'bmp' END
        |    AS fmt FROM d
        |  UNION ALL SELECT d, 'ppm' FROM d WHERE d % 3 = 1),
        |mg AS (SELECT fmt, d % 1280 AS sig, COUNT(*) AS n FROM mfmt
        |  GROUP BY 1, 2)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM corpus) AS n_images,
        |  CAST(COUNT(*) FILTER (n > 1) AS BIGINT) AS dup_groups,
        |  CAST(COALESCE(SUM(n) FILTER (n > 1), 0) AS BIGINT)
        |    AS dup_members,
        |  (SELECT CAST(COUNT(*) FILTER (n > 1) AS BIGINT) FROM mg)
        |    AS md5_dup_groups
        |FROM g""".stripMargin) { (s, dir) =>
      import s.implicits._
      val base = MM.syntheticCodecTable(s, dir)
        .filter(col("media_id") % 3 < 2)
      // cross-format twins: the SAME pixel field, PPM instead of BMP
      val twins = graft.Tables.load(s, dir, "documents")
        .select(col("doc_id")).filter(col("doc_id") % 3 === 1)
        .as[Long].mapPartitions { ids =>
          ids.map { d =>
            val (w, h, rgb) = MM.synthPixels(d)
            (d + 1000000L, MM.encodePpm(w, h, rgb))
          }
        }.toDF("media_id", "blob")
      val corpus = base.unionByName(twins)
      val groups = MM.imagePhash(s, corpus)
        .groupBy(col("phash")).agg(count(lit(1)).as("n"))
      val md5Groups = corpus
        .groupBy(md5(col("blob"))).agg(count(lit(1)).as("n"))
        .filter(col("n") > 1).count()
      groups.agg(
          sum(col("n")).cast("long").as("n_images"),
          count(when(col("n") > 1, 1)).as("dup_groups"),
          coalesce(sum(when(col("n") > 1, col("n"))), lit(0L))
            .cast("long").as("dup_members"))
        .withColumn("md5_dup_groups", lit(md5Groups))
    },

    // Zero-crossing rate + near-silence over decoded PCM — the two
    // cheapest audio-quality screens a speech-corpus pipeline runs
    // before anything expensive (noisiness proxy; dead-air detector):
    // per clip, adjacent-sample sign flips (s·prev < 0) and |s| ≤ 100
    // samples, rolled up to the zero-crossing histogram (≤ 16 distinct
    // values here — a bounded ledger however many clips). DuckDB
    // replays the PCM generation formula and the same LAG arithmetic,
    // so a sign-handling or off-by-one-sample decoder bug shifts the
    // histogram and reddens the hash. Map-only decode + one
    // histogram-sized aggregate.
    QueryDef.sqlBacked(
      "q353_audio_zcr",
      """WITH d AS (SELECT doc_id AS d FROM documents WHERE doc_id % 3 = 2),
        |wav AS (SELECT d, 8 + d % 9 AS n FROM d),
        |smp AS (SELECT d, i.range AS i,
        |    (31 * d + 17 * i.range) % 2001 - 1000 AS s
        |  FROM wav CROSS JOIN range(17) i WHERE i.range < n),
        |lg AS (SELECT d, s,
        |    LAG(s) OVER (PARTITION BY d ORDER BY i) AS p FROM smp),
        |per AS (SELECT d,
        |    CAST(COUNT(*) AS BIGINT) AS n_samples,
        |    CAST(COUNT(*) FILTER (p IS NOT NULL AND p * s < 0) AS BIGINT)
        |      AS zc,
        |    CAST(COUNT(*) FILTER (ABS(s) <= 100) AS BIGINT) AS silent
        |  FROM lg GROUP BY d)
        |SELECT CAST(zc AS INTEGER) AS zero_crossings,
        |  CAST(COUNT(*) AS BIGINT) AS n_clips,
        |  CAST(SUM(n_samples) AS BIGINT) AS n_samples,
        |  CAST(SUM(silent) AS BIGINT) AS silent_samples
        |FROM per GROUP BY 1 ORDER BY zero_crossings""".stripMargin) {
      (s, dir) =>
      MM.audioWaveformStats(s,
          MM.syntheticCodecTable(s, dir)
            .filter(col("media_id") % 3 === 2), silenceAbs = 100)
        .groupBy(col("zero_crossings").cast("int").as("zero_crossings"))
        .agg(count(lit(1)).as("n_clips"),
          sum(col("n_samples")).cast("long").as("n_samples"),
          sum(col("near_silent")).cast("long").as("silent_samples"))
        .orderBy(col("zero_crossings"))
    },

    // REAL PNG decode (zlib via the JDK Inflater + the 5 per-row
    // filters), value-gated: every document's pixel field encodes as a
    // genuine compressed PNG — RGB for even ids, RGBA for odd (whose
    // alpha plane the decoder must DROP; leaking it into the pixel
    // stream shifts sum1) — with the filter type varying per row, so
    // Sub/Up/Average/Paeth unfiltering all sit under the driver hash.
    // DuckDB replays the pure pixel formula; any inflate, unfilter or
    // channel bug reddens the row. Map-only decode, histogram-sized
    // aggregate.
    QueryDef.sqlBacked(
      "q366_png_decode",
      """WITH d AS (SELECT doc_id AS d FROM documents),
        |img AS (SELECT d, 4 + d % 5 AS w, 3 + d % 4 AS h FROM d),
        |px AS (SELECT d, w * h AS units, i.range AS i
        |  FROM img CROSS JOIN range(48) i WHERE i.range < w * h),
        |lum AS (SELECT d, units,
        |    (7 * d + 3 * i) % 256 + (11 * d + 5 * i) % 256
        |      + (13 * d + 7 * i) % 256 AS lum3
        |  FROM px),
        |agg AS (SELECT d, units, SUM(lum3) AS s1, MAX(lum3) AS m1
        |  FROM lum GROUP BY 1, 2)
        |SELECT CAST(d % 2 AS BIGINT) AS parity,
        |  CAST(COUNT(*) AS BIGINT) AS n_media,
        |  CAST(SUM(units) AS BIGINT) AS units,
        |  CAST(SUM(s1) AS BIGINT) AS sum1,
        |  CAST(MAX(m1) AS BIGINT) AS max1
        |FROM agg GROUP BY 1 ORDER BY parity""".stripMargin) { (s, dir) =>
      MM.extractDecodedStats(s, MM.syntheticPngTable(s, dir))
        .groupBy((col("media_id") % 2).cast("long").as("parity"))
        .agg(count(lit(1)).as("n_media"),
          sum(col("units")).cast("long").as("units"),
          sum(col("sum1")).cast("long").as("sum1"),
          max(col("max1")).cast("long").as("max1"))
        .orderBy(col("parity"))
    },

    // PALETTE (color-type 3) PNG decode, value-gated: the SAME pixel
    // field as q366 re-encoded as indexed PNG — each image's palette is
    // its distinct colors in first-occurrence order, so the encoding is
    // exact and DuckDB replays the pure pixel formula with no knowledge
    // of the palette at all. The per-image distinct-color count rides
    // the hash too: a decoder that permutes PLTE entries or leaks index
    // bytes as pixels can keep sum1 by luck but not the color set.
    // Map-only decode, 3-row output.
    QueryDef.sqlBacked(
      "q377_png_palette",
      """WITH d AS (SELECT doc_id AS d FROM documents),
        |img AS (SELECT d, 4 + d % 5 AS w, 3 + d % 4 AS h FROM d),
        |px AS (SELECT d, w * h AS units, i.range AS i
        |  FROM img CROSS JOIN range(48) i WHERE i.range < w * h),
        |lum AS (SELECT d, units,
        |    (7 * d + 3 * i) % 256 + (11 * d + 5 * i) % 256
        |      + (13 * d + 7 * i) % 256 AS lum3,
        |    ((7 * d + 3 * i) % 256) * 65536 + ((11 * d + 5 * i) % 256) * 256
        |      + (13 * d + 7 * i) % 256 AS packed
        |  FROM px),
        |agg AS (SELECT d, units, SUM(lum3) AS s1, MAX(lum3) AS m1,
        |    COUNT(DISTINCT packed) AS nc
        |  FROM lum GROUP BY 1, 2)
        |SELECT CAST(d % 3 AS BIGINT) AS grp,
        |  CAST(COUNT(*) AS BIGINT) AS n_media,
        |  CAST(SUM(units) AS BIGINT) AS units,
        |  CAST(SUM(s1) AS BIGINT) AS sum1,
        |  CAST(MAX(m1) AS BIGINT) AS max1,
        |  CAST(SUM(nc) AS BIGINT) AS n_colors
        |FROM agg GROUP BY 1 ORDER BY grp""".stripMargin) { (s, dir) =>
      import s.implicits._
      MM.syntheticPalettePngTable(s, dir)
        .select(col("media_id").cast("long"), col("blob"))
        .as[(Long, Array[Byte])]
        .mapPartitions { rows =>
          rows.map { case (id, blob) =>
            val (_, w, h, rgb) = MM.decodeImage(blob).get
            var s1 = 0L; var m1 = 0L
            val colors = scala.collection.mutable.HashSet.empty[Int]
            var i = 0
            while (i < w * h) {
              val l3 = (rgb(3 * i) & 0xff) + (rgb(3 * i + 1) & 0xff) +
                (rgb(3 * i + 2) & 0xff)
              s1 += l3; if (l3 > m1) m1 = l3
              colors += (((rgb(3 * i) & 0xff) << 16) |
                ((rgb(3 * i + 1) & 0xff) << 8) | (rgb(3 * i + 2) & 0xff))
              i += 1
            }
            (id, w.toLong * h, s1, m1, colors.size.toLong)
          }
        }.toDF("media_id", "units", "sum1", "max1", "n_colors")
        .groupBy((col("media_id") % 3).cast("long").as("grp"))
        .agg(count(lit(1)).as("n_media"),
          sum(col("units")).cast("long").as("units"),
          sum(col("sum1")).cast("long").as("sum1"),
          max(col("max1")).cast("long").as("max1"),
          sum(col("n_colors")).cast("long").as("n_colors"))
        .orderBy(col("grp"))
    }
  )
}
