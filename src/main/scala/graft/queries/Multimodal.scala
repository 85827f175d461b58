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
    }
  )
}
