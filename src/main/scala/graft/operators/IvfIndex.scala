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

  // ------ incremental lifecycle: build → refresh* → search ------
  // The 100 TB embedding corpus GROWS continuously; rebuilding the index
  // per ingest batch is the scale-killer (a full KMeans fit + full-corpus
  // assignment per batch). The incremental index instead:
  //   build    — one bounded-sample fit + ONE full assignment job;
  //              vectors persist cell-ordered (the IVF layout: search
  //              scans only probed cells), plus a drift baseline (mean
  //              nearest-centroid squared distance at build time);
  //   refresh  — assigns ONLY the new batch to the existing centroids
  //              (broadcast join, map-only, batch-sized output appended
  //              to the cell table) and retrains ONLY when the batch's
  //              mean assignment distance drifts past DriftFactor × the
  //              baseline — distribution shift is the one case where
  //              stale centroids silently degrade recall;
  //   search   — probe ~k/4 nearest cells per query, exact re-rank on
  //              the probed candidates only.
  // IvfRefreshSpec pins refresh-recall ≥ rebuild-recall − ε and the
  // drift-gate trip; q376 drives the grown-corpus recall gate through
  // the DuckDB oracle at both SFs.
  //
  // Crash/exactly-once notes (stated, not hidden): meta writes LAST in
  // both build and refresh, so a crash mid-build leaves the old meta
  // pointing at possibly-new files — callers that need atomic cutover
  // should build into a fresh root and swap the root reference (the
  // graft table itself, when the index rides one, gives this for free).
  // A foreachBatch maintenance stream is at-least-once: a retried batch
  // re-appends its vectors; dedup by (vec_id) at read time or key the
  // append by the micro-batch id if the source can replay.

  /** Mean batch assignment distance above `DriftFactor` × the build-time
    * baseline forces a full retrain on the next refresh.
    */
  val DriftFactor = 1.5

  final case class RefreshResult(
      retrained: Boolean, assigned: Long, driftRatio: Double)

  private def centroidsPath(root: String) = s"$root/centroids"
  private def cellsPath(root: String) = s"$root/cells"
  private def batchesPath(root: String) = s"$root/cells_batches"
  private def metaPath(root: String) = s"$root/meta"

  /** Persisted cell table: (vec_id, v, nrm, cell) — the corpus in IVF
    * layout (the build-time base under `cells` plus one subdirectory
    * per keyed refresh batch). Search reads only probed cells; retrain
    * reconstructs the corpus from here, so refresh never needs the
    * source table.
    */
  def cellsDF(spark: SparkSession, root: String): DataFrame = {
    val base = spark.read.parquet(cellsPath(root))
    val bp = new org.apache.hadoop.fs.Path(batchesPath(root))
    val fs = bp.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(bp))
      base.unionByName(spark.read
        .option("recursiveFileLookup", "true")
        .parquet(batchesPath(root)))
    else base
  }

  def centroidsDF(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(centroidsPath(root))

  /** Fit k centroids on a bounded sample of `vecs` (vec_id, v). */
  private def fitCentroids(spark: SparkSession, vecs: DataFrame,
      n: Long, k: Int): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val frac = math.min(1.0, MaxFitSample.toDouble / math.max(1L, n))
    val sample =
      (if (frac < 1.0) vecs.sample(withReplacement = false, frac, seed = 42)
       else vecs)
        .limit(MaxFitSample)
        .withColumn("features", array_to_vector(col("v")))
    val model = new KMeans().setK(k).setSeed(42)
      .setFeaturesCol("features").setPredictionCol("cell")
      .fit(sample)
    import spark.implicits._
    model.clusterCenters.zipWithIndex.map { case (c, i) =>
      val arr = c.toArray
      (i, arr.toSeq, arr.map(x => x * x).sum)
    }.toSeq.toDF("cell", "cv", "cnorm2")
  }

  /** Assign (vec_id, v) rows to their nearest centroid — centroids
    * collected and BROADCAST (k ≤ 4096 × dim 64 doubles ≈ 2 MB), then a
    * tight per-row loop: truly map-only, zero shuffle. The obvious
    * join(broadcast(cents)) + window-argmin formulation materializes
    * corpus × k rows through a row_number shuffle — a k-fold network
    * amplification that is THE scale bug of IVF assignment at 100 TB.
    * Arithmetic order matches the expression form bit-for-bit
    * (sequential left-to-right dot, cnorm2 − 2·dot, ties → lowest
    * cell), so results are identical to the window formulation. Output:
    * (vec_id, v, nrm, cell, dist2) with dist2 the true squared distance
    * (drift is measured in it).
    */
  private[graft] def assignTo(spark: SparkSession, cents: DataFrame,
      vecs: DataFrame): DataFrame = {
    val cArr = cents.select(col("cell"), col("cv"), col("cnorm2"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      .sortBy(_._1)
    val bc = spark.sparkContext.broadcast(cArr)
    import spark.implicits._
    vecs.select(col("vec_id"), col("v")).as[(Long, Array[Double])]
      .mapPartitions { it =>
        val cs = bc.value
        it.map { case (id, v) =>
          var best = -1
          var bestD = Double.MaxValue
          var j = 0
          while (j < cs.length) {
            val (cell, cv, cn2) = cs(j)
            var dot = 0.0
            var i = 0
            while (i < v.length) { dot += v(i) * cv(i); i += 1 }
            val d = cn2 - 2.0 * dot
            // ascending cell order: strict < keeps the LOWEST cell on
            // ties — the window formulation's (adist, cell) order
            if (d < bestD) { bestD = d; best = cell }
            j += 1
          }
          var nrm2 = 0.0
          var i = 0
          while (i < v.length) { nrm2 += v(i) * v(i); i += 1 }
          (id, v, math.sqrt(nrm2), best, bestD + nrm2)
        }
      }.toDF("vec_id", "v", "nrm", "cell", "dist2")
  }

  private def assign(spark: SparkSession, vecs: DataFrame,
      cents: DataFrame): DataFrame = assignTo(spark, cents, vecs)

  /** Build the incremental index at `root` from `corpus` (vec_id,
    * v: array<double>): one sample fit, one full assignment job, and
    * the drift baseline. Overwrites any prior index at `root`.
    */
  def build(spark: SparkSession, root: String, corpus: DataFrame): Unit = {
    val n = corpus.count()
    val k = kFor(n)
    val cents = fitCentroids(spark, corpus, n, k)
    cents.coalesce(1).write.mode("overwrite").parquet(centroidsPath(root))
    val assigned = assign(spark, corpus,
      spark.read.parquet(centroidsPath(root))).cache()
    try {
      assigned.select("vec_id", "v", "nrm", "cell")
        .write.mode("overwrite").parquet(cellsPath(root))
      val base = assigned.agg(avg(col("dist2"))).head.getDouble(0)
      import spark.implicits._
      Seq((k, n, base)).toDF("k", "n", "base_dist")
        .coalesce(1).write.mode("overwrite").parquet(metaPath(root))
    } finally { assigned.unpersist(); () }
  }

  /** Ingest a new batch (vec_id, v) into the index at `root`: assign to
    * the EXISTING centroids and append (batch-sized work), or retrain
    * from scratch when the batch's mean assignment distance exceeds
    * DriftFactor × the build-time baseline. The retrain corpus is the
    * cell table ∪ batch — the index is self-contained.
    *
    * `batchId` makes the append IDEMPOTENT under at-least-once
    * delivery (a foreachBatch maintenance stream's retried
    * micro-batch): a keyed batch writes its OWN subdirectory with
    * overwrite semantics, so a replay rewrites the same rows instead of
    * appending duplicates, and the bookkeeping n bumps only on first
    * delivery. The rare drift-retrain path stays at-least-once (a crash
    * between the rebuild and the replay re-appends; the gate makes
    * retrains exceptional, and a keyed replay after a COMPLETED retrain
    * is detected via the consumed-batch marker below).
    */
  def refresh(spark: SparkSession, root: String, batch: DataFrame,
      batchId: Option[Long] = None): RefreshResult = {
    val meta = spark.read.parquet(metaPath(root)).head
    val (k, n, baseDist) =
      (meta.getInt(0), meta.getLong(1), meta.getDouble(2))
    val conf = spark.sessionState.newHadoopConf()
    // a keyed batch already consumed by a completed retrain replays as
    // a no-op: its rows live in the rebuilt base now
    val consumedMarker = new org.apache.hadoop.fs.Path(
      s"$root/consumed_batches${batchId.fold("")(id => s"/b$id")}")
    if (batchId.isDefined &&
        consumedMarker.getFileSystem(conf).exists(consumedMarker))
      return RefreshResult(retrained = false, assigned = 0L, driftRatio = 1.0)
    val assigned = assign(spark, batch, centroidsDF(spark, root)).cache()
    try {
      val agg = assigned.agg(avg(col("dist2")), count(lit(1))).head
      val (batchDist, m) = (agg.getDouble(0), agg.getLong(1))
      val ratio = if (baseDist > 0) batchDist / baseDist else 1.0
      if (ratio <= DriftFactor) {
        val (target, mode, replay) = batchId match {
          case Some(id) =>
            val dir = s"${batchesPath(root)}/b$id"
            val p = new org.apache.hadoop.fs.Path(dir)
            (dir, "overwrite", p.getFileSystem(conf).exists(p))
          case None => (cellsPath(root), "append", false)
        }
        assigned.select("vec_id", "v", "nrm", "cell")
          .write.mode(mode).parquet(target)
        import spark.implicits._
        if (!replay)
          Seq((k, n + m, baseDist)).toDF("k", "n", "base_dist")
            .coalesce(1).write.mode("overwrite").parquet(metaPath(root))
        RefreshResult(retrained = false, assigned = m, driftRatio = ratio)
      } else {
        // distribution shift: stale centroids would silently starve
        // recall — retrain from the index's own vectors plus the batch.
        // The corpus is staged to DURABLE parquet first, not a cache:
        // build() overwrites the cells directory this corpus reads
        // from, and a cache-evicted partition recomputing mid-build
        // would read the overwritten path. Retrain is rare (the gate);
        // one extra corpus write is its price.
        val staged = s"$root/retrain_staging"
        cellsDF(spark, root).select("vec_id", "v")
          .unionByName(batch.select("vec_id", "v"))
          .write.mode("overwrite").parquet(staged)
        val p = new org.apache.hadoop.fs.Path(staged)
        val fs = p.getFileSystem(conf)
        try {
          build(spark, root, spark.read.parquet(staged))
          // the rebuilt base absorbed every keyed batch (and this one):
          // mark them consumed so a later keyed replay is a no-op, then
          // drop the now-duplicate subdirectories
          val bp = new org.apache.hadoop.fs.Path(batchesPath(root))
          val consumed = (if (fs.exists(bp))
            fs.listStatus(bp).toSeq.map(_.getPath.getName) else Nil) ++
            batchId.map(id => s"b$id")
          consumed.distinct.foreach { name =>
            fs.mkdirs(new org.apache.hadoop.fs.Path(
              s"$root/consumed_batches/$name"))
          }
          fs.delete(bp, true)
        } finally { fs.delete(p, true); () }
        RefreshResult(retrained = true, assigned = m, driftRatio = ratio)
      }
    } finally { assigned.unpersist(); () }
  }

  /** ANN top-`topK` over the incremental index: probe the ~k/4 nearest
    * cells per query (or `probesOverride` — the recall/cost knob every
    * IVF deployment tunes), exact-cosine re-rank over probed candidates
    * only. `queries`: (query_id, qv: array<double>).
    */
  def searchTopK(spark: SparkSession, root: String, queries: DataFrame,
      topK: Int = 5, probesOverride: Option[Int] = None): DataFrame = {
    import EmbeddingOps._
    val cents = centroidsDF(spark, root)
    val k = spark.read.parquet(metaPath(root)).head.getInt(0)
    val probes = probesOverride.getOrElse(probesFor(k))
    val q = queries.select(col("query_id"), col("qv"))
      .withColumn("qn", norm(col("qv")))
    val byDist = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cdist"), col("cell"))
    val probed = broadcast(q).join(broadcast(cents))
      .withColumn("cdist",
        col("cnorm2") - lit(2.0) * dot(col("qv"), col("cv")))
      .withColumn("cell_rank", row_number().over(byDist))
      .filter(col("cell_rank") <= probes)
      .select(col("query_id"), col("qv"), col("qn"), col("cell"))
    val byCos = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    probed.join(cellsDF(spark, root), Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("qv"), col("v"), col("qn"), col("nrm")).as("cos"))
      .withColumn("rnk", row_number().over(byCos))
      .filter(col("rnk") <= topK)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("cos"))
      .orderBy(col("query_id"), col("rnk"))
  }
}
