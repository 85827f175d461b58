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
    }
  )
}
