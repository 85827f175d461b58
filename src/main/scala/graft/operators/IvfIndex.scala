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
  //              vectors persist PHYSICALLY cell-partitioned (hive
  //              `cell=` dirs): the IVF layout is in the file layout,
  //              not just a column, so search prunes at the FILE level;
  //              plus a drift baseline (mean nearest-centroid squared
  //              distance at build time);
  //   refresh  — assigns ONLY the new batch to the existing centroids
  //              (map-only loop, batch-sized output appended to the
  //              cell overlay, re-clustered by cell on write) and
  //              retrains ONLY when the batch's mean assignment distance
  //              drifts past DriftFactor × the baseline — distribution
  //              shift is the one case where stale centroids silently
  //              degrade recall;
  //   search   — probe ~k/4 nearest cells per query, push the probed
  //              cell ids as a PARTITION filter (only probed cells'
  //              files are opened — IvfLayoutSpec pins the opened-file
  //              set with a counting filesystem), exact re-rank on the
  //              probed candidates only.
  // Crash consistency rides [[IndexGen]]: every (re)build stages into a
  // hidden dir and publishes with one atomic rename to the next `g<n>`
  // generation — a crash mid-retrain leaves the OLD generation serving,
  // never a torn index; consumed-batch markers ride inside the staged
  // dir so keyed-replay idempotence holds on both sides of the swap.
  // Overlay growth between retrains is bounded by [[BatchOverlays]]
  // folding (auto-triggered past [[CompactAfter]] keyed batches).
  // IvfRefreshSpec pins refresh-recall ≥ rebuild-recall − ε and the
  // drift-gate trip; q376 drives the grown-corpus recall gate through
  // the DuckDB oracle at both SFs; IndexCrashSpec pins old-or-new-never-
  // torn; IndexCompactionSpec pins the bounded overlay dir count.

  /** Mean batch assignment distance above `DriftFactor` × the build-time
    * baseline forces a full retrain on the next refresh.
    */
  val DriftFactor = 1.5

  final case class RefreshResult(
      retrained: Boolean, assigned: Long, driftRatio: Double)

  /** Keyed overlay dirs tolerated before refresh auto-folds them into a
    * merged tier (see [[BatchOverlays.compact]] — overlay-sized cost,
    * the base is never rewritten).
    */
  val CompactAfter = 16

  private val OverlayName = "cells_batches"

  /** Static cell-table schema: handed to every read so neither the
    * driver nor the planner ever opens a data-file footer to infer it —
    * at 100 TB schema inference is itself a scale bug, and the counting-
    * filesystem layout pin requires zero non-probed opens.
    */
  private val cellSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("vec_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("v",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType)),
    org.apache.spark.sql.types.StructField("nrm",
      org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("cell",
      org.apache.spark.sql.types.IntegerType)))

  private def genOf(spark: SparkSession, root: String): String =
    IndexGen.resolveOrFail(IndexGen.fsOf(spark, root), root).toString

  def isBuilt(spark: SparkSession, root: String): Boolean =
    IndexGen.isBuilt(IndexGen.fsOf(spark, root), root)

  /** Persisted cell table: (vec_id, v, nrm, cell) — the corpus in
    * PHYSICAL IVF layout: hive `cell=` partition dirs in the build-time
    * base plus the keyed-batch overlay (each overlay dir cell-partitioned
    * too). A filter on `cell` prunes at the FILE level in every part.
    * Retrain reconstructs the corpus from here, so refresh never needs
    * the source table.
    */
  /** Gen-scoped readers: every multi-artifact operation resolves the
    * generation ONCE and reads all artifacts from it — resolving per
    * artifact would let a concurrently-published retrain flip the gen
    * between reads and silently mix OLD centroids with NEW cells
    * (cell ids are centroid-specific: wrong pruning, degraded recall,
    * no error).
    */
  private def cellsAt(spark: SparkSession, gen: String): DataFrame = {
    val base = spark.read.schema(cellSchema).parquet(s"$gen/cells")
    BatchOverlays.readActive(spark, s"$gen/$OverlayName", cellSchema)
      .map(base.unionByName(_)).getOrElse(base)
  }

  def cellsDF(spark: SparkSession, root: String): DataFrame =
    cellsAt(spark, genOf(spark, root))

  def centroidsDF(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"${genOf(spark, root)}/centroids")

  /** (k, n, base_dist) bookkeeping of the active generation. */
  def metaDF(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"${genOf(spark, root)}/meta")

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

  /** One sample fit + one full assignment job, written into `staging`
    * (centroids, then the cell-partitioned base, meta LAST). The caller
    * publishes staging via [[IndexGen.commit]] — shared by build and the
    * retrain path of refresh, and the crash-injection point of
    * IndexCrashSpec (a staged-but-uncommitted build must be invisible).
    */
  private[graft] def buildInto(spark: SparkSession, staging: String,
      corpus: DataFrame): Unit = {
    val n = corpus.count()
    val k = kFor(n)
    val cents = fitCentroids(spark, corpus, n, k)
    cents.coalesce(1).write.mode("overwrite").parquet(s"$staging/centroids")
    val assigned = assign(spark, corpus,
      spark.read.parquet(s"$staging/centroids")).cache()
    try {
      // PHYSICAL cell layout: partitionBy(cell) encodes the cell in the
      // directory layout so search's probed-cell filter prunes at file
      // listing instead of post-scan (the whole point of IVF at 100 TB).
      // Range-clustering on (cell, vec_id) — not hash(cell) — keeps
      // small cells one-file while letting a HOT cell span several
      // tasks/files: a skewed cluster must not become one straggler
      // task writing one unsplittable-at-write giant file.
      assigned.select("vec_id", "v", "nrm", "cell")
        .repartitionByRange(col("cell"), col("vec_id"))
        .write.partitionBy("cell").mode("overwrite")
        .parquet(s"$staging/cells")
      val base = assigned.agg(avg(col("dist2"))).head.getDouble(0)
      import spark.implicits._
      Seq((k, n, base)).toDF("k", "n", "base_dist")
        .coalesce(1).write.mode("overwrite").parquet(s"$staging/meta")
    } finally { assigned.unpersist(); () }
  }

  /** Build the incremental index at `root` from `corpus` (vec_id,
    * v: array<double>): stage a full build, publish it as the next
    * generation with one atomic rename.
    */
  def build(spark: SparkSession, root: String, corpus: DataFrame): Unit = {
    val staging = IndexGen.staging(root)
    buildInto(spark, staging, corpus)
    IndexGen.commit(IndexGen.fsOf(spark, root), root, staging)
    ()
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
      batchId: Option[Long] = None,
      compactAfter: Int = CompactAfter): RefreshResult = {
    val fs = IndexGen.fsOf(spark, root)
    val gen = genOf(spark, root)
    val meta = spark.read.parquet(s"$gen/meta").head
    val (k, n, baseDist) =
      (meta.getInt(0), meta.getLong(1), meta.getDouble(2))
    // a keyed batch already consumed by a completed retrain or an
    // overlay fold replays as a no-op: its rows live in the rebuilt
    // base / merged tier now
    if (batchId.exists(id => fs.exists(
        new org.apache.hadoop.fs.Path(s"$gen/consumed_batches/b$id"))))
      return RefreshResult(retrained = false, assigned = 0L, driftRatio = 1.0)
    val assigned = assign(spark, batch,
      spark.read.parquet(s"$gen/centroids")).cache()
    try {
      val agg = assigned.agg(avg(col("dist2")), count(lit(1))).head
      val (batchDist, m) = (agg.getDouble(0), agg.getLong(1))
      val ratio = if (baseDist > 0) batchDist / baseDist else 1.0
      if (ratio <= DriftFactor) {
        // EVERY batch lands in the overlay store — keyed batches in
        // their own replay-idempotent b<id> dir, unkeyed ones in a
        // fresh u<uuid> dir (appending into the BASE would accumulate
        // per-batch file slivers folding can never reclaim)
        val (target, replay) = batchId match {
          case Some(id) =>
            val dir = s"$gen/$OverlayName/b$id"
            (dir, fs.exists(new org.apache.hadoop.fs.Path(dir)))
          case None =>
            (s"$gen/$OverlayName/u${java.util.UUID.randomUUID()
              .toString.take(8)}", false)
        }
        // overlay rows carry the same physical cell layout as the base
        // (batch-sized repartition — the assignment itself stays
        // map-only), so search's partition filter prunes them too
        assigned.select("vec_id", "v", "nrm", "cell")
          .repartition(col("cell"))
          .write.partitionBy("cell").mode("overwrite").parquet(target)
        import spark.implicits._
        if (!replay)
          IndexGen.writeMetaAtomic(spark, gen,
            Seq((k, n + m, baseDist)).toDF("k", "n", "base_dist"))
        // bound the overlay dir growth between (rare) retrains: fold
        // past the threshold — overlay-sized cost, base untouched
        if (BatchOverlays.count(fs, s"$gen/$OverlayName") > compactAfter)
          BatchOverlays.compact(spark, gen, OverlayName, cellSchema,
            clusterBy = Some("cell"))
        RefreshResult(retrained = false, assigned = m, driftRatio = ratio)
      } else {
        // distribution shift: stale centroids would silently starve
        // recall — retrain from the index's own vectors plus the batch
        // into a STAGED next generation. The staging dir is disjoint
        // from the (immutable) current generation the corpus reads, so
        // no durable corpus copy is needed, and the single publish
        // rename means a crash anywhere in here leaves the old
        // generation serving — never a torn index.
        val staging = IndexGen.staging(root)
        buildInto(spark, staging,
          cellsAt(spark, gen).select("vec_id", "v")
            .unionByName(batch.select("vec_id", "v")))
        // consumed markers ride INSIDE the staged generation, so they
        // become visible exactly iff the retrain that absorbed those
        // batches published — keyed-replay idempotence holds on both
        // sides of the crash window
        val overlay = s"$gen/$OverlayName"
        val prior = {
          val cb = new org.apache.hadoop.fs.Path(s"$gen/consumed_batches")
          if (fs.exists(cb)) fs.listStatus(cb).toSeq.map(_.getPath.getName)
          else Seq.empty
        }
        val absorbed =
          BatchOverlays.activeDirs(fs, overlay).map(_.getName) ++
          BatchOverlays.foldedNames(fs, overlay) ++
          batchId.map(id => s"b$id")
        (prior ++ absorbed.filter(_.startsWith("b"))).distinct.foreach { nm =>
          fs.mkdirs(new org.apache.hadoop.fs.Path(
            s"$staging/consumed_batches/$nm"))
        }
        IndexGen.commit(fs, root, staging)
        RefreshResult(retrained = true, assigned = m, driftRatio = ratio)
      }
    } finally { assigned.unpersist(); () }
  }

  /** Index OPTIMIZE: fold the keyed overlay into one merged tier now
    * (the auto-trigger's manual entry point).
    */
  def compact(spark: SparkSession, root: String): Unit =
    BatchOverlays.compact(spark, genOf(spark, root), OverlayName,
      cellSchema, clusterBy = Some("cell"))

  /** Per-query probed cells: (query_id, qv, qn, cell) — each query's
    * `probes` nearest centroids by the same (cdist, cell) order the
    * assignment uses. A corpus-independent job: queries × k slim rows
    * through one bounded window.
    */
  private def probeAssignments(spark: SparkSession, gen: String,
      queries: DataFrame, probes: Int): DataFrame = {
    import EmbeddingOps._
    val cents = spark.read.parquet(s"$gen/centroids")
    val q = queries.select(col("query_id"), col("qv"))
      .withColumn("qn", norm(col("qv")))
    val byDist = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cdist"), col("cell"))
    broadcast(q).join(broadcast(cents))
      .withColumn("cdist",
        col("cnorm2") - lit(2.0) * dot(col("qv"), col("cv")))
      .withColumn("cell_rank", row_number().over(byDist))
      .filter(col("cell_rank") <= probes)
      .select(col("query_id"), col("qv"), col("qn"), col("cell"))
  }

  /** The distinct probed-cell id set for a query batch — ≤ k ≤ 4096
    * values however many queries, so collecting it driver-side is
    * bounded; searchTopK pushes it as the partition filter and
    * IvfLayoutSpec asserts against it.
    */
  private[graft] def probedCells(spark: SparkSession, root: String,
      queries: DataFrame, probes: Int): Array[Int] =
    probedCellsAt(spark, genOf(spark, root), queries, probes)

  private def probedCellsAt(spark: SparkSession, gen: String,
      queries: DataFrame, probes: Int): Array[Int] =
    probeAssignments(spark, gen, queries, probes)
      .select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted

  /** ANN top-`topK` over the incremental index: probe the ~k/4 nearest
    * cells per query (or `probesOverride` — the recall/cost knob every
    * IVF deployment tunes), exact-cosine re-rank over probed candidates
    * only. The probed-cell IN-list is pushed as a PARTITION filter on
    * the physically cell-partitioned read, so only probed cells' files
    * are listed into scan tasks — the other cells' bytes are never read
    * (the probe job runs twice, once to collect the ≤ k cell ids and
    * once in the final plan; it is queries × k slim rows, independent of
    * corpus size). `queries`: (query_id, qv: array<double>).
    */
  def searchTopK(spark: SparkSession, root: String, queries: DataFrame,
      topK: Int = 5, probesOverride: Option[Int] = None): DataFrame = {
    import EmbeddingOps._
    val gen = genOf(spark, root) // ONE resolve: meta, centroids and
    // cells must come from the same generation (see cellsAt)
    val k = spark.read.parquet(s"$gen/meta").head.getInt(0)
    val probes = probesOverride.getOrElse(probesFor(k))
    val probed = probeAssignments(spark, gen, queries, probes)
    val cellIds = probedCellsAt(spark, gen, queries, probes)
    val pruned = cellsAt(spark, gen)
      .filter(col("cell").isin(cellIds.map(Int.box).toSeq: _*))
    val byCos = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    probed.join(pruned, Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("qv"), col("v"), col("qn"), col("nrm")).as("cos"))
      .withColumn("rnk", row_number().over(byCos))
      .filter(col("rnk") <= topK)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("cos"))
      .orderBy(col("query_id"), col("rnk"))
  }
}
