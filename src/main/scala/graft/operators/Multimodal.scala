package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.9): media as opaque binary
  * columns with typed metadata, processed by per-partition batch UDFs.
  *
  * The container has no image/audio codecs, so `decodeFeatures` is a
  * clearly-marked deterministic STUB — but every Spark-side piece is real
  * and tested: the (blob, struct metadata) schema, partition-parallel
  * execution via typed mapPartitions (the Scala analogue of
  * mapInPandas' batched shape), the feature-vector output schema, and the
  * downstream aggregation over features. Swapping the stub for a real
  * decoder changes no plumbing.
  */
object Multimodal {

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

  /** STUB decoder: a real implementation would decode the image/audio and
    * extract model features; here it computes a 16-bin byte histogram,
    * normalized — deterministic, schema-identical to a real extractor.
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
