package graft.operators

import graft.Tables
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product-quantization codebooks (the PQ/ADC path of similarity
  * search): the D-dim space splits into [[M]] subspaces; each gets a
  * [[K]]-centroid codebook fit on a bounded sample; a vector encodes as
  * M small codes (log₂K bits each — 64 doubles become 8 nibbles here,
  * a ~128× compression) and query scoring is ADC: one lookup table of
  * query-to-centroid dots per subspace, approximate dot = Σₘ lut[m][code].
  *
  * Same lifecycle discipline as [[IvfIndex]]: codebooks fit ONCE on a
  * ≤100k sample, persist under GRAFT_INDEX_DIR keyed by (table, M, K,
  * n), and queries only LOAD them — scoring never trains. Exact
  * per-vector norms are kept alongside the codes (8 bytes against the
  * ~4-byte code payload), so the cosine denominator is exact and the
  * ONLY approximation is the subspace-centroid substitution in the
  * numerator.
  */
object PqIndex {

  val M = 8 // subspaces
  val K = 16 // codes per subspace
  val MaxFitSample = 100000

  private def indexRoot: String =
    sys.env.getOrElse("GRAFT_INDEX_DIR",
      sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft_index")

  private def bookDir(dir: String, n: Long): String = {
    val key = java.lang.Long.toHexString(
      graft.functions.SketchExprs.hash64(
        org.apache.spark.unsafe.types.UTF8String.fromString(dir)))
    s"$indexRoot/pq_${key}_m${M}_k${K}_n$n"
  }

  /** Persisted codebooks: (m: int, code: int, cv: array<double>,
    * cnorm2: double). Loads if present, else sample-fits and persists.
    */
  def codebooks(spark: SparkSession, dir: String, n: Long): DataFrame = {
    val path = new Path(bookDir(dir, n))
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(path)) buildAndPersist(spark, dir, n, path)
    spark.read.parquet(path.toString)
  }

  private def buildAndPersist(
      spark: SparkSession, dir: String, n: Long, path: Path): Unit = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val e = Tables.load(spark, dir, "embeddings")
      .select(EmbeddingOps.toDouble(col("embedding")).as("v"))
    val frac = math.min(1.0, MaxFitSample.toDouble / math.max(1L, n))
    val sample = (if (frac < 1.0)
        e.sample(withReplacement = false, frac, seed = 42)
      else e).limit(MaxFitSample).cache()
    val dim = sample.select(size(col("v"))).first().getInt(0)
    require(dim % M == 0, s"dim $dim must split into $M subspaces")
    val sub = dim / M
    // M independent small fits over the SAME cached sample — training
    // touches sample × M subvector projections, never the corpus
    val rows = (0 until M).flatMap { m =>
      val sm = sample.select(
        array_to_vector(slice(col("v"), m * sub + 1, sub)).as("features"))
      val model = new KMeans().setK(K).setSeed(42 + m)
        .setFeaturesCol("features").setPredictionCol("code").fit(sm)
      model.clusterCenters.zipWithIndex.map { case (c, j) =>
        val arr = c.toArray
        (m, j, arr.toSeq, arr.map(x => x * x).sum)
      }
    }
    sample.unpersist()
    import spark.implicits._
    val tmp = new Path(path.getParent, s".${path.getName}.tmp")
    fs.delete(tmp, true)
    rows.toDF("m", "code", "cv", "cnorm2")
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    fs.mkdirs(path.getParent)
    if (!fs.rename(tmp, path) && !fs.exists(path))
      throw new IllegalStateException(s"could not persist PQ codebooks at $path")
  }

  /** Encode the corpus: (vec_id, nrm, m, code) — one row per subspace
    * per vector (the shuffle-friendly long form of the M-nibble code).
    */
  def encode(spark: SparkSession, dir: String, n: Long): DataFrame = {
    val booksDf = codebooks(spark, dir, n)
    val sub = booksDf.select(size(col("cv"))).first().getInt(0)
    val books = broadcast(booksDf)
    val e = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), EmbeddingOps.toDouble(col("embedding")).as("v"))
      .withColumn("nrm", EmbeddingOps.norm(col("v")))
    val exploded = e.select(col("vec_id"), col("nrm"),
      posexplode(expr(
        s"transform(sequence(0, ${M - 1}), m -> slice(v, m * $sub + 1, $sub))"))
        .as(Seq("m", "vm")))
    val byFit = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"), col("m"))
      .orderBy(col("adist"), col("code"))
    exploded.join(books, Seq("m"))
      .withColumn("adist",
        col("cnorm2") - lit(2.0) * EmbeddingOps.dot(col("vm"), col("cv")))
      .withColumn("arnk", row_number().over(byFit))
      .filter(col("arnk") === 1)
      .select(col("vec_id"), col("nrm"), col("m"), col("code"))
  }
}
