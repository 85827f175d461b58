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
  // Crash consistency and overlay folding ride the same [[IndexGen]] /
  // [[BatchOverlays]] machinery as IvfIndex: staged generations
  // published by one atomic rename, consumed markers inside the staged
  // dir, keyed overlay dirs auto-folded past [[CompactAfter]].

  val DriftFactor = 1.5

  /** Keyed overlay dirs tolerated before refresh auto-folds them. */
  val CompactAfter = 16

  final case class RefreshResult(
      retrained: Boolean, assigned: Long, driftRatio: Double)

  private val OverlayName = "codes_batches"

  /** Static packed-codes schema — handed to every read so no data-file
    * footer is ever opened for inference.
    */
  private val codeSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("vec_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("nrm",
      org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("codes",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.IntegerType))))

  private def genOf(spark: SparkSession, root: String): String =
    IndexGen.resolveOrFail(IndexGen.fsOf(spark, root), root).toString

  def isBuilt(spark: SparkSession, root: String): Boolean =
    IndexGen.isBuilt(IndexGen.fsOf(spark, root), root)

  def booksDF(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"${genOf(spark, root)}/codebooks")

  /** (n, base_err) bookkeeping of the active generation. */
  def metaDF(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"${genOf(spark, root)}/meta")

  /** Persisted codes, PACKED: one row per vector — (vec_id, nrm,
    * codes: array<int> of length M). One row per (vec, subspace) would
    * repeat vec_id + nrm M times and put 8× the rows through every
    * scan and aggregation ADC does; the M-nibble claim should be the
    * row layout too. Build-time base under `codes` plus the keyed
    * overlay (the IvfIndex idempotence layout).
    */
  private def codesAt(spark: SparkSession, gen: String): DataFrame = {
    val base = spark.read.schema(codeSchema).parquet(s"$gen/codes")
    BatchOverlays.readActive(spark, s"$gen/$OverlayName", codeSchema)
      .map(base.unionByName(_)).getOrElse(base)
  }

  def codesDF(spark: SparkSession, root: String): DataFrame =
    codesAt(spark, genOf(spark, root))

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

  /** Codebooks collected for broadcast: `[m][code] = (cv, cnorm2)`.
    * M × K × sub doubles ≈ 8 KB at the defaults — driver-side by design.
    */
  private[graft] def collectBooks(
      books: DataFrame): Array[Array[(Array[Double], Double)]] = {
    val rows = books.select(col("m"), col("code"), col("cv"), col("cnorm2"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1),
        r.getSeq[Double](2).toArray, r.getDouble(3)))
    rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (_, cs) =>
      cs.sortBy(_._2).map(c => (c._3, c._4))
    }.toArray
  }

  /** Encode (vec_id, v) rows against the given codebooks: codebooks
    * broadcast (≈8 KB), then a tight per-row loop over all M subspaces —
    * truly map-only, zero shuffle, one output row per vector. The
    * join(broadcast)+window-argmin formulation this replaces pushed
    * corpus × M × K = 128× the rows through a row_number SHUFFLE on
    * every build, retrain, and refresh — the exact scale bug
    * [[IvfIndex.assignTo]] eradicated from IVF assignment. Arithmetic
    * matches it bit-for-bit: sequential left-to-right dots, adist =
    * cnorm2 − 2·dot, strict < keeps the LOWEST code on ties (the
    * (adist, code) window order). Output (vec_id, nrm, codes, qerr)
    * with qerr the vector's total squared quantization error — drift is
    * measured in its corpus mean.
    */
  private[graft] def encodePacked(spark: SparkSession, books: DataFrame,
      vecs: DataFrame): DataFrame = {
    val bArr = collectBooks(books)
    val bc = spark.sparkContext.broadcast(bArr)
    import spark.implicits._
    vecs.select(col("vec_id"), col("v")).as[(Long, Array[Double])]
      .mapPartitions { it =>
        val bks = bc.value
        val mCount = bks.length
        val sub = bks(0)(0)._1.length
        it.map { case (id, v) =>
          var nrm2 = 0.0
          var i = 0
          while (i < v.length) { nrm2 += v(i) * v(i); i += 1 }
          val codes = new Array[Int](mCount)
          var qerr = 0.0
          var m = 0
          while (m < mCount) {
            val off = m * sub
            val book = bks(m)
            var best = -1
            var bestD = Double.MaxValue
            var c = 0
            while (c < book.length) {
              val (cv, cn2) = book(c)
              var dotv = 0.0
              var j = 0
              while (j < sub) { dotv += v(off + j) * cv(j); j += 1 }
              val d = cn2 - 2.0 * dotv
              if (d < bestD) { bestD = d; best = c }
              c += 1
            }
            var vm2 = 0.0
            var j = 0
            while (j < sub) { vm2 += v(off + j) * v(off + j); j += 1 }
            qerr += bestD + vm2
            codes(m) = best
            m += 1
          }
          (id, math.sqrt(nrm2), codes, qerr)
        }
      }.toDF("vec_id", "nrm", "codes", "qerr")
  }

  /** Fit + whole-corpus encode, written into `staging` (codebooks, then
    * packed codes, meta LAST); the caller publishes via
    * [[IndexGen.commit]].
    */
  private[graft] def buildInto(spark: SparkSession, staging: String,
      corpus: DataFrame): Unit = {
    val n = corpus.count()
    fitBooks(spark, corpus, n)
      .coalesce(1).write.mode("overwrite").parquet(s"$staging/codebooks")
    val coded = encodePacked(spark,
      spark.read.parquet(s"$staging/codebooks"), corpus).cache()
    try {
      coded.select("vec_id", "nrm", "codes")
        .write.mode("overwrite").parquet(s"$staging/codes")
      // packed rows: the baseline is a straight corpus mean — no
      // per-vector regroup needed
      val base = coded.agg(avg(col("qerr"))).head.getDouble(0)
      import spark.implicits._
      Seq((n, base)).toDF("n", "base_err")
        .coalesce(1).write.mode("overwrite").parquet(s"$staging/meta")
    } finally { coded.unpersist(); () }
  }

  /** Build the incremental PQ index at `root` from `corpus` (vec_id,
    * v: array<double>): fit codebooks, encode the whole corpus ONCE,
    * publish codes + the quantization-error baseline as the next
    * generation with one atomic rename.
    */
  def build(spark: SparkSession, root: String, corpus: DataFrame): Unit = {
    val staging = IndexGen.staging(root)
    buildInto(spark, staging, corpus)
    IndexGen.commit(IndexGen.fsOf(spark, root), root, staging)
    ()
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
      corpus: => DataFrame, batchId: Option[Long] = None,
      compactAfter: Int = CompactAfter): RefreshResult = {
    val fs = IndexGen.fsOf(spark, root)
    val gen = genOf(spark, root)
    val meta = spark.read.parquet(s"$gen/meta").head
    val (n, baseErr) = (meta.getLong(0), meta.getDouble(1))
    if (batchId.exists(id => fs.exists(
        new org.apache.hadoop.fs.Path(s"$gen/consumed_batches/b$id"))))
      return RefreshResult(retrained = false, assigned = 0L, driftRatio = 1.0)
    val coded = encodePacked(spark,
      spark.read.parquet(s"$gen/codebooks"), batch).cache()
    try {
      val agg = coded.agg(avg(col("qerr")), count(lit(1))).head
      val (batchErr, m) = (agg.getDouble(0), agg.getLong(1))
      val ratio = if (baseErr > 0) batchErr / baseErr else 1.0
      if (ratio <= DriftFactor) {
        // every batch lands in the overlay store (unkeyed in a fresh
        // u<uuid> dir) so folding bounds ALL refresh-file growth, not
        // just the keyed path's — see IvfIndex.refresh
        val (target, replay) = batchId match {
          case Some(id) =>
            val dir = s"$gen/$OverlayName/b$id"
            (dir, fs.exists(new org.apache.hadoop.fs.Path(dir)))
          case None =>
            (s"$gen/$OverlayName/u${java.util.UUID.randomUUID()
              .toString.take(8)}", false)
        }
        coded.select("vec_id", "nrm", "codes")
          .write.mode("overwrite").parquet(target)
        import spark.implicits._
        if (!replay)
          IndexGen.writeMetaAtomic(spark, gen,
            Seq((n + m, baseErr)).toDF("n", "base_err"))
        if (BatchOverlays.count(fs, s"$gen/$OverlayName") > compactAfter)
          BatchOverlays.compact(spark, gen, OverlayName, codeSchema,
            clusterBy = None)
        RefreshResult(retrained = false, assigned = m, driftRatio = ratio)
      } else {
        // retrain corpus = caller corpus ∪ THIS batch, batch winning on
        // vec_id overlap: a caller whose corpus snapshot predates the
        // pending batch must not have it silently and unrecoverably
        // dropped (the anti-join runs once, on the rare drift path).
        // NOTE the caller's corpus must still cover the base and all
        // previously refreshed vectors — codes deliberately hold no
        // vectors, so the index cannot reconstruct them itself.
        val full = corpus.select(col("vec_id"), col("v"))
          .join(batch.select(col("vec_id")), Seq("vec_id"), "left_anti")
          .unionByName(batch.select(col("vec_id"), col("v")))
        val staging = IndexGen.staging(root)
        buildInto(spark, staging, full)
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
    } finally { coded.unpersist(); () }
  }

  /** Index OPTIMIZE: fold the keyed overlay into one merged tier now. */
  def compact(spark: SparkSession, root: String): Unit =
    BatchOverlays.compact(spark, genOf(spark, root), OverlayName,
      codeSchema, clusterBy = None)

  /** Per-query ADC lookup tables, computed map-only against the
    * broadcast codebooks: (query_id, qn, luts) with
    * `luts[m][code] = qₘ · cv(m, code)` — M × K doubles per query.
    */
  private def lutDF(spark: SparkSession, books: DataFrame,
      queries: DataFrame): DataFrame = {
    val bArr = collectBooks(books)
    val bc = spark.sparkContext.broadcast(bArr)
    import spark.implicits._
    queries.select(col("query_id"), col("qv")).as[(Long, Array[Double])]
      .mapPartitions { it =>
        val bks = bc.value
        val mCount = bks.length
        val sub = bks(0)(0)._1.length
        it.map { case (id, qv) =>
          var qn2 = 0.0
          var i = 0
          while (i < qv.length) { qn2 += qv(i) * qv(i); i += 1 }
          val luts = Array.tabulate(mCount) { m =>
            val off = m * sub
            val book = bks(m)
            Array.tabulate(book.length) { c =>
              val cv = book(c)._1
              var d = 0.0
              var j = 0
              while (j < sub) { d += qv(off + j) * cv(j); j += 1 }
              d
            }
          }
          (id, math.sqrt(qn2), luts)
        }
      }.toDF("query_id", "qn", "luts")
  }

  /** ADC top-`topK` over the incremental index (`queries`: query_id,
    * qv): one lookup table of query-to-centroid dots per subspace,
    * approximate cosine = Σₘ lut[m][codeₘ] / (‖q‖·‖v‖) with exact
    * norms. With packed codes the whole score is computed MAP-SIDE per
    * (vector, query) row — no ×M×K row explosion, no argmin; the only
    * shuffles are the duplicate collapse and the per-query top-k
    * window over corpus × queries slim rows. The max() collapse makes
    * ranking robust to duplicate code rows (an unkeyed at-least-once
    * replay, or re-ingesting an existing vec_id): duplicates carry
    * identical codes, so max is exact — where the former per-subspace
    * sum(part) roughly DOUBLED the numerator and corrupted ranking.
    */
  def scoreTopK(spark: SparkSession, root: String, queries: DataFrame,
      topK: Int = 5): DataFrame = {
    // ONE gen resolve: LUTs from one generation's codebooks scored
    // against another generation's codes would be garbage — the same
    // cross-gen mixing hazard IvfIndex.searchTopK pins out
    val gen = genOf(spark, root)
    val lut = lutDF(spark, spark.read.parquet(s"$gen/codebooks"), queries)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    codesAt(spark, gen).crossJoin(broadcast(lut))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (expr(s"aggregate(sequence(0, ${M - 1}), CAST(0.0 AS DOUBLE), " +
          "(acc, m) -> acc + luts[m][codes[m]])")
          / (col("qn") * col("nrm"))).as("cos"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(max(col("cos")).as("cos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("cos"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Encode the corpus: (vec_id, nrm, m, code) — the long form some
    * consumers join on, produced by a map-only posexplode of the packed
    * encoder (no shuffle; the window-argmin long-form encode this
    * replaces pushed corpus × M × K rows through a row_number shuffle).
    */
  def encode(spark: SparkSession, dir: String, n: Long): DataFrame = {
    val booksDf = codebooks(spark, dir, n)
    val e = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), EmbeddingOps.toDouble(col("embedding")).as("v"))
    encodePacked(spark, booksDf, e)
      .select(col("vec_id"), col("nrm"),
        posexplode(col("codes")).as(Seq("m", "code")))
  }
}
