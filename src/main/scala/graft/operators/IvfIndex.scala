package graft.operators

import graft.Tables
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF coarse-quantizer lifecycle (SURVEY.md §2.9 similarity search,
  * scale path). Three properties make this 100-TB-shaped where an inline
  * `KMeans.fit` per query is not:
  *
  *  1. centroids are fit on a BOUNDED sample (≤ [[MaxFitSample]] rows),
  *     never the full corpus;
  *  2. the fitted centroids are PERSISTED (parquet under GRAFT_INDEX_DIR
  *     — the data dirs are read-only here) and every later query LOADS
  *     them: a query is never a training job;
  *  3. k scales ~√n with the corpus, probes ~k/4, so the scanned
  *     fraction stays ~25% as the corpus grows.
  */
object IvfIndex {

  val MaxFitSample = 100000

  /** k ~ √n, clamped to [16, 4096]. */
  def kFor(n: Long): Int =
    math.min(4096, math.max(16, math.round(math.sqrt(n.toDouble)).toInt))

  /** Cells probed per query (~25% of the corpus scanned in expectation). */
  def probesFor(k: Int): Int = math.max(1, k / 4)

  private def indexRoot: String =
    sys.env.getOrElse("GRAFT_INDEX_DIR",
      sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft_index")

  /** Keyed by (table dir, k, row count): a rewrite or growth of the
    * embeddings table changes n and so invalidates the cached index —
    * without this, kFor(n)'s clamping could silently reuse stale
    * centroids (degraded recall, no signal).
    */
  private def centroidDir(dir: String, k: Int, n: Long): String = {
    val key = java.lang.Long.toHexString(
      graft.functions.SketchExprs.hash64(
        org.apache.spark.unsafe.types.UTF8String.fromString(dir)))
    s"$indexRoot/ivf_${key}_k${k}_n$n"
  }

  /** Persisted centroids for the embeddings table at `dir`:
    * (cell: int, cv: array<double>, cnorm2: double). Loads if present,
    * else sample-fits once and persists (atomic rename; a lost race just
    * means the other builder's identical seed-42 index wins).
    */
  def centroids(spark: SparkSession, dir: String, n: Long): DataFrame = {
    val k = kFor(n)
    val path = new Path(centroidDir(dir, k, n))
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(path)) buildAndPersist(spark, dir, n, k, path)
    spark.read.parquet(path.toString)
  }

  private def buildAndPersist(
      spark: SparkSession, dir: String, n: Long, k: Int, path: Path): Unit = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val e = Tables.load(spark, dir, "embeddings")
      .select(EmbeddingOps.toDouble(col("embedding")).as("v"))
    val frac = math.min(1.0, MaxFitSample.toDouble / math.max(1L, n))
    val sample = (if (frac < 1.0) e.sample(withReplacement = false, frac, seed = 42) else e)
      .limit(MaxFitSample)
      .withColumn("features", array_to_vector(col("v")))
    val model = new KMeans().setK(k).setSeed(42)
      .setFeaturesCol("features").setPredictionCol("cell")
      .fit(sample)
    val rows = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      val arr = c.toArray
      (i, arr.toSeq, arr.map(x => x * x).sum)
    }.toSeq
    val tmp = new Path(path.getParent, s".${path.getName}.tmp")
    fs.delete(tmp, true)
    import spark.implicits._
    rows.toDF("cell", "cv", "cnorm2")
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    fs.mkdirs(path.getParent)
    if (!fs.rename(tmp, path)) fs.delete(tmp, true)
  }
}
