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
    // touches sample × M subvector projections, never the corpus;
    // submitted concurrently (fitSubspaces)
    val rows = fitSubspaces(sample, sub)
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

  // ------ incremental lifecycle (the IvfIndex build/refresh discipline
  // applied to PQ): the encoded CODES are corpus-sized state worth
  // persisting — at 100 TB, re-encoding the whole corpus per ingest
  // batch is a full corpus scan. refresh() encodes ONLY the batch with
  // the EXISTING codebooks and appends; a retrain happens only when the
  // batch's mean quantization error drifts past DriftFactor × the
  // build-time baseline. Unlike the IVF cell table, codes deliberately
  // do NOT hold the vectors (compression is the point), so the retrain
  // corpus comes from the caller (by-name — evaluated only on drift).

  val DriftFactor = 1.5

  final case class RefreshResult(
      retrained: Boolean, assigned: Long, driftRatio: Double)

  private def booksPath(root: String) = s"$root/codebooks"
  private def codesPath(root: String) = s"$root/codes"
  private def codeBatchesPath(root: String) = s"$root/codes_batches"
  private def metaPath(root: String) = s"$root/meta"

  def booksDF(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(booksPath(root))

  /** Persisted codes: (vec_id, nrm, m, code) — M rows per vector; the
    * build-time base under `codes` plus one subdirectory per keyed
    * refresh batch (the IvfIndex idempotence layout).
    */
  def codesDF(spark: SparkSession, root: String): DataFrame = {
    val base = spark.read.parquet(codesPath(root))
    val bp = new org.apache.hadoop.fs.Path(codeBatchesPath(root))
    val fs = bp.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(bp))
      base.unionByName(spark.read
        .option("recursiveFileLookup", "true")
        .parquet(codeBatchesPath(root)))
    else base
  }

  /** Fit M per-subspace codebooks on a bounded sample of `corpus`
    * (vec_id, v) — same shape as [[buildAndPersist]]'s fit, corpus
    * passed in rather than loaded from a table dir.
    */
  private def fitBooks(
      spark: SparkSession, corpus: DataFrame, n: Long): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val frac = math.min(1.0, MaxFitSample.toDouble / math.max(1L, n))
    val sample = (if (frac < 1.0)
        corpus.sample(withReplacement = false, frac, seed = 42)
      else corpus).limit(MaxFitSample).cache()
    val dim = sample.select(size(col("v"))).first().getInt(0)
    require(dim % M == 0, s"dim $dim must split into $M subspaces")
    val sub = dim / M
    val rows = fitSubspaces(sample, sub)
    sample.unpersist()
    import spark.implicits._
    rows.toDF("m", "code", "cv", "cnorm2")
  }

  /** The M independent per-subspace KMeans fits, run CONCURRENTLY:
    * each fit is a small Spark job over the same cached sample, so
    * serializing them leaves the cluster idle M−1/M of the time —
    * concurrent submission is the standard multi-job Spark pattern and
    * each fit stays deterministic (own seed, same sample).
    */
  private def fitSubspaces(
      sample: DataFrame, sub: Int): Seq[(Int, Int, Seq[Double], Double)] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    Await.result(Future.sequence((0 until M).map { m =>
      Future {
        val sm = sample.select(
          array_to_vector(slice(col("v"), m * sub + 1, sub)).as("features"))
        val model = new KMeans().setK(K).setSeed(42 + m)
          .setFeaturesCol("features").setPredictionCol("code").fit(sm)
        model.clusterCenters.zipWithIndex.map { case (c, j) =>
          val arr = c.toArray
          (m, j, arr.toSeq, arr.map(x => x * x).sum)
        }.toSeq
      }
    }), Duration.Inf).flatten
  }

  /** Encode (vec_id, v) rows against the given codebooks: broadcast
    * join + per-(vector, subspace) argmin. Output (vec_id, nrm, m,
    * code, qerr) with qerr the subspace's true squared quantization
    * error — drift is measured in its per-vector sum.
    */
  private def encodeWith(books: DataFrame, vecs: DataFrame): DataFrame = {
    val sub = books.select(size(col("cv"))).first().getInt(0)
    val exploded = vecs
      .withColumn("nrm", EmbeddingOps.norm(col("v")))
      .select(col("vec_id"), col("nrm"),
        posexplode(expr(
          s"transform(sequence(0, ${M - 1}), m -> slice(v, m * $sub + 1, $sub))"))
          .as(Seq("m", "vm")))
    val byFit = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"), col("m"))
      .orderBy(col("adist"), col("code"))
    exploded.join(broadcast(books), Seq("m"))
      .withColumn("adist",
        col("cnorm2") - lit(2.0) * EmbeddingOps.dot(col("vm"), col("cv")))
      .withColumn("arnk", row_number().over(byFit))
      .filter(col("arnk") === 1)
      .select(col("vec_id"), col("nrm"), col("m"), col("code"),
        (col("adist") + EmbeddingOps.dot(col("vm"), col("vm"))).as("qerr"))
  }

  /** Build the incremental PQ index at `root` from `corpus` (vec_id,
    * v: array<double>): fit codebooks, encode the whole corpus ONCE,
    * persist codes + the quantization-error baseline.
    */
  def build(spark: SparkSession, root: String, corpus: DataFrame): Unit = {
    val n = corpus.count()
    fitBooks(spark, corpus, n)
      .coalesce(1).write.mode("overwrite").parquet(booksPath(root))
    val coded = encodeWith(booksDF(spark, root), corpus).cache()
    try {
      coded.select("vec_id", "nrm", "m", "code")
        .write.mode("overwrite").parquet(codesPath(root))
      val base = coded.groupBy(col("vec_id"))
        .agg(sum(col("qerr")).as("e"))
        .agg(avg(col("e"))).head.getDouble(0)
      import spark.implicits._
      Seq((n, base)).toDF("n", "base_err")
        .coalesce(1).write.mode("overwrite").parquet(metaPath(root))
    } finally { coded.unpersist(); () }
  }

  /** Ingest a batch (vec_id, v): encode against the EXISTING codebooks
    * and append (batch-sized work), or — when the batch's mean
    * quantization error exceeds DriftFactor × the baseline — retrain
    * from `corpus` (by-name; evaluated only on drift, because codes
    * deliberately don't hold vectors).
    *
    * `batchId` gives the same at-least-once idempotence as
    * [[IvfIndex.refresh]]: a keyed batch overwrites its own codes
    * subdirectory on replay, bookkeeping n bumps on first delivery
    * only, and a completed retrain leaves consumed-markers so keyed
    * replays after it are no-ops.
    */
  def refresh(spark: SparkSession, root: String, batch: DataFrame,
      corpus: => DataFrame, batchId: Option[Long] = None): RefreshResult = {
    val meta = spark.read.parquet(metaPath(root)).head
    val (n, baseErr) = (meta.getLong(0), meta.getDouble(1))
    val conf = spark.sessionState.newHadoopConf()
    val consumedMarker = new org.apache.hadoop.fs.Path(
      s"$root/consumed_batches${batchId.fold("")(id => s"/b$id")}")
    if (batchId.isDefined &&
        consumedMarker.getFileSystem(conf).exists(consumedMarker))
      return RefreshResult(retrained = false, assigned = 0L, driftRatio = 1.0)
    val coded = encodeWith(booksDF(spark, root), batch).cache()
    try {
      val agg = coded.groupBy(col("vec_id"))
        .agg(sum(col("qerr")).as("e"))
        .agg(avg(col("e")), count(lit(1))).head
      val (batchErr, m) = (agg.getDouble(0), agg.getLong(1))
      val ratio = if (baseErr > 0) batchErr / baseErr else 1.0
      if (ratio <= DriftFactor) {
        val (target, mode, replay) = batchId match {
          case Some(id) =>
            val dir = s"${codeBatchesPath(root)}/b$id"
            val p = new org.apache.hadoop.fs.Path(dir)
            (dir, "overwrite", p.getFileSystem(conf).exists(p))
          case None => (codesPath(root), "append", false)
        }
        coded.select("vec_id", "nrm", "m", "code")
          .write.mode(mode).parquet(target)
        import spark.implicits._
        if (!replay)
          Seq((n + m, baseErr)).toDF("n", "base_err")
            .coalesce(1).write.mode("overwrite").parquet(metaPath(root))
        RefreshResult(retrained = false, assigned = m, driftRatio = ratio)
      } else {
        build(spark, root, corpus)
        val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(conf)
        val bp = new org.apache.hadoop.fs.Path(codeBatchesPath(root))
        val consumed = (if (fs.exists(bp))
          fs.listStatus(bp).toSeq.map(_.getPath.getName) else Nil) ++
          batchId.map(id => s"b$id")
        consumed.distinct.foreach { name =>
          fs.mkdirs(new org.apache.hadoop.fs.Path(
            s"$root/consumed_batches/$name"))
        }
        fs.delete(bp, true)
        RefreshResult(retrained = true, assigned = m, driftRatio = ratio)
      }
    } finally { coded.unpersist(); () }
  }

  /** ADC top-`topK` over the incremental index (`queries`: query_id,
    * qv): one lookup table of query-to-centroid dots per subspace,
    * approximate cosine = Σₘ lut[codeₘ] / (‖q‖·‖v‖) with exact norms.
    */
  def scoreTopK(spark: SparkSession, root: String, queries: DataFrame,
      topK: Int = 5): DataFrame = {
    val books = booksDF(spark, root)
    val sub = books.select(size(col("cv"))).first().getInt(0)
    val lut = queries
      .withColumn("qn", EmbeddingOps.norm(col("qv")))
      .select(col("query_id"), col("qn"),
        posexplode(expr(
          s"transform(sequence(0, ${M - 1}), m -> slice(qv, m * $sub + 1, $sub))"))
          .as(Seq("m", "qm")))
      .join(broadcast(books), Seq("m"))
      .select(col("query_id"), col("qn"), col("m"), col("code"),
        EmbeddingOps.dot(col("qm"), col("cv")).as("part"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    codesDF(spark, root).join(broadcast(lut), Seq("m", "code"))
      .filter(col("query_id") =!= col("vec_id"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg((sum(col("part")) / (max(col("qn")) * max(col("nrm")))).as("cos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("cos"))
      .orderBy(col("query_id"), col("rnk"))
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
