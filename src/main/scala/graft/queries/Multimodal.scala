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
    // per mime class (Spark-only: stub decoder).
    QueryDef.sparkOnly("q71_media_features") { (s, dir) =>
      val feats = MM.extractFeatures(s, MM.mediaTable(s, dir))
      feats.toDF()
        .groupBy(col("mime"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_bytes")).as("total_bytes"),
          // mean of the first histogram bin across docs — exercises the
          // feature vectors end-to-end
          avg(element_at(col("features"), 1)).as("mean_bin0"))
        .orderBy(col("mime"))
    },

    // Frame sampling: one row per (media, frame) slice (Spark-only).
    QueryDef.sparkOnly("q72_frame_sample") { (s, dir) =>
      MM.sampleFrames(s, MM.mediaTable(s, dir), n = 4)
        .groupBy(col("frame_idx"))
        .agg(count(lit(1)).as("n"),
          sum(length(col("frame_blob"))).as("total_bytes"))
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
