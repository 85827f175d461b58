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
