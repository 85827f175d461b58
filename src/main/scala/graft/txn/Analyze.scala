package graft.txn

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{And => CAnd, AttributeReference, BinaryComparison, EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.functions._

/** ANALYZE TABLE + the cost decisions it unlocks.
  *
  * `computeStats` runs ONE scan folding every requested column's
  * (count, nulls, ndv, min, max) into a single aggregate row — the q131
  * profiling shape — and lands it in a versioned `_stats/` sidecar
  * parquet (the BloomIndex convention: no log-protocol change, vacuum
  * can age out superseded builds, the snapshot version keys validity).
  *
  * `estimateRows` turns a simple conjunctive predicate into a
  * cardinality estimate with the textbook selectivity rules — equality
  * → 1/ndv, range → overlap fraction of [min, max] — and
  * `joinAuto` uses the estimate to pick BROADCAST vs shuffle for a
  * filtered dimension join. That decision is exactly what a 100 TB plan
  * gets wrong without stats: Spark's own threshold sees the dimension's
  * FILE size, not the post-filter cardinality, so a selective filter on
  * a big dimension misses its broadcast. Estimates only pick the
  * strategy — results are identical either way, which is what the spec
  * pins.
  */
object Analyze {

  def dir(version: Long): String = f"_stats/stats-$version%020d"

  /** Equi-depth histogram buckets per numeric column. */
  val HistBuckets = 32

  /** One scan → (column, n, n_null, ndv, min_str, max_str, hist)
    * sidecar. `hist` is the numeric column's equi-depth bucket BOUNDS
    * (HistBuckets+1 approx-percentile values) — the skew-proof range
    * selectivity a uniform [min, max] assumption cannot give; null for
    * non-numeric columns (they keep the uniform rule).
    */
  def computeStats(
      spark: SparkSession,
      tablePath: String,
      columns: Seq[String]): Unit = {
    require(columns.nonEmpty)
    val conf = spark.sessionState.newHadoopConf()
    val log = new TxnLog(tablePath, conf)
    val snap = log.snapshotLatest()
    val df = SnapshotReader.read(spark, tablePath)
    val numeric: Set[String] = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] =>
        f.name
    }.toSet
    writeBuild(spark, tablePath, snap.version,
      statsRows(spark, df, columns, numeric, withHist = true))
  }

  /** HLL lgConfigK: 2^12 registers ≈ ±1.6% ndv at any scale, 8 KB per
    * column — small enough to ride the sidecar, mergeable so
    * [[computeStatsIncremental]] unions instead of rescanning.
    */
  private val HllLgK = 12

  /** One aggregate scan of `df` → per-column stats rows
    * (column, n, n_null, ndv, min_str, max_str, hist, hll).
    * `ndv` derives from a DataSketches HLL sketch (register-wise max
    * merge makes incremental refresh EQUAL a full rebuild); the sketch
    * bytes persist beside it.
    */
  private def statsRows(
      spark: SparkSession,
      df: DataFrame,
      columns: Seq[String],
      numeric: Set[String],
      withHist: Boolean): Seq[StatsRow] = {
    val pcts = (0 to HistBuckets).map(_.toDouble / HistBuckets)
    val aggs = columns.flatMap { c =>
      Seq(count(lit(1)).as(s"${c}__n"),
        count(when(col(c).isNull, 1)).as(s"${c}__null"),
        // sketch over the STRING form: one codegen'd path for every
        // type, distinctness preserved within a column's fixed shape
        hll_sketch_agg(col(c).cast("string"), lit(HllLgK))
          .as(s"${c}__hll"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max")) ++
        (if (withHist && numeric(c))
          Seq(percentile_approx(col(c).cast("double"),
            lit(pcts.toArray), lit(10000)).as(s"${c}__hist"))
        else Seq.empty)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0) // 1 row
    columns.map { c =>
      val hll = row.getAs[Array[Byte]](s"${c}__hll")
      StatsRow(c, row.getAs[Long](s"${c}__n"),
        row.getAs[Long](s"${c}__null"),
        estimateOf(hll),
        row.getAs[String](s"${c}__min"), row.getAs[String](s"${c}__max"),
        if (withHist && numeric(c))
          Option(row.getAs[scala.collection.Seq[Double]](s"${c}__hist"))
            .map(_.toList)
        else None,
        Option(hll))
    }
  }

  private[graft] final case class StatsRow(
      column: String, n: Long, nNull: Long, ndv: Long,
      minS: String, maxS: String, hist: Option[Seq[Double]],
      hll: Option[Array[Byte]])

  private def estimateOf(hll: Array[Byte]): Long =
    if (hll == null || hll.isEmpty) 0L
    else math.round(
      org.apache.datasketches.hll.HllSketch.heapify(hll).getEstimate)

  private def writeBuild(
      spark: SparkSession,
      tablePath: String,
      version: Long,
      rows: Seq[StatsRow]): Unit = {
    import spark.implicits._
    rows.map(r => (r.column, r.n, r.nNull, r.ndv, r.minS, r.maxS,
        r.hist, r.hll.orNull))
      .toDF("column", "n", "n_null", "ndv", "min_str", "max_str", "hist",
        "hll")
      .coalesce(1).write.mode("overwrite")
      .parquet(new Path(tablePath, dir(version)).toString)
  }

  /** INCREMENTAL refresh: when the current snapshot is a pure SUPERSET
    * of the analyzed one (append-only ingest — the overwhelmingly
    * common case), only the NEW files scan; counts add, min/max widen,
    * and the HLL sketches union register-wise (bit-identical to a full
    * rebuild). Any rewrite, delete, or DV change falls back to a full
    * scan — subtraction from sketches/min-max is unsound. Equi-depth
    * histograms carry forward from the prior build (documented
    * staleness: bucket BOUNDS describe the analyzed prefix; counts and
    * ndv stay exact/fresh) — a FULL analyze refreshes them.
    * Returns the mode taken: "incremental", "full", or "noop".
    */
  def computeStatsIncremental(
      spark: SparkSession,
      tablePath: String,
      columns: Seq[String]): String = {
    require(columns.nonEmpty)
    val conf = spark.sessionState.newHadoopConf()
    val log = new TxnLog(tablePath, conf)
    val snap1 = log.snapshotLatest()
    val priorDirOpt = latestBuild(spark, tablePath)
    def full(): String = { computeStats(spark, tablePath, columns); "full" }
    priorDirOpt match {
      case None => full()
      case Some(priorDir) =>
        val v0 = priorDir.stripPrefix("_stats/stats-").toLong
        if (v0 >= snap1.version) return "noop"
        val priorDf = spark.read.parquet(s"$tablePath/$priorDir")
        if (!priorDf.columns.contains("hll")) return full() // pre-sketch build
        val prior = priorDf.collect().map { r =>
          r.getAs[String]("column") -> StatsRow(
            r.getAs[String]("column"), r.getAs[Long]("n"),
            r.getAs[Long]("n_null"), r.getAs[Long]("ndv"),
            r.getAs[String]("min_str"), r.getAs[String]("max_str"),
            Option(r.getAs[scala.collection.Seq[Double]]("hist"))
              .map(_.toList),
            Option(r.getAs[Array[Byte]]("hll")))
        }.toMap
        if (columns.exists(c => !prior.contains(c))) return full()
        // the analyzed base version may have EXPIRED from the log
        // (expireLog) — not incrementable, but analyzable from scratch
        val snap0 =
          try log.snapshot(v0)
          catch { case _: IllegalArgumentException => return full() }
        val byPath0 = snap0.files.map(f => f.path -> f.dv).toMap
        val byPath1 = snap1.files.map(f => f.path -> f.dv).toMap
        val sameOld = snap0.files.forall(f =>
          byPath1.get(f.path).contains(f.dv))
        if (!sameOld) return full() // rewrite/delete/DV change: no subtraction
        val newFiles = snap1.files.filterNot(f => byPath0.contains(f.path))
        if (newFiles.isEmpty) return "noop"
        val schema = snap1.metadata.map(m =>
          org.apache.spark.sql.types.DataType.fromJson(m.schemaJson)
            .asInstanceOf[org.apache.spark.sql.types.StructType])
        val mapping = snap1.metadata.map(_.columnMapping).getOrElse(Map.empty)
        val slice = DeletionVectors.readFiles(spark, tablePath, newFiles,
          schema, mapping = mapping)
        val numeric: Set[String] = slice.schema.fields.collect {
          case f if f.dataType
              .isInstanceOf[org.apache.spark.sql.types.NumericType] => f.name
        }.toSet
        val fresh = statsRows(spark, slice, columns, numeric,
          withHist = false)
        val types = slice.schema.fields.map(f => f.name -> f.dataType).toMap
        val merged = fresh.map { nw =>
          val p = prior(nw.column)
          val u = new org.apache.datasketches.hll.Union(HllLgK)
          p.hll.foreach(b =>
            u.update(org.apache.datasketches.hll.HllSketch.heapify(b)))
          nw.hll.foreach(b =>
            u.update(org.apache.datasketches.hll.HllSketch.heapify(b)))
          val uBytes = u.getResult(
            org.apache.datasketches.hll.TgtHllType.HLL_8).toUpdatableByteArray
          StatsRow(nw.column, p.n + nw.n, p.nNull + nw.nNull,
            estimateOf(uBytes),
            mergeBound(types(nw.column), p.minS, nw.minS, takeMin = true),
            mergeBound(types(nw.column), p.maxS, nw.maxS, takeMin = false),
            p.hist, // carried forward; a FULL analyze refreshes bounds
            Some(uBytes))
        }
        writeBuild(spark, tablePath, snap1.version, merged)
        "incremental"
    }
  }

  /** Typed min/max merge of two string-form bounds (either may be null
    * for an all-null slice): numerics compare as BigDecimal, everything
    * else in UTF-8 byte order (what the stats writer's string cast
    * preserves for dates/timestamps).
    */
  private def mergeBound(
      dt: org.apache.spark.sql.types.DataType,
      a: String, b: String, takeMin: Boolean): String = {
    if (a == null) return b
    if (b == null) return a
    import org.apache.spark.sql.types._
    val aLess = dt match {
      // fractional columns can legitimately carry "NaN"/"Infinity"
      // strings (BigDecimal would throw); Double.compare totals-orders
      // them with NaN LARGEST — exactly Spark's min/max ordering
      case FloatType | DoubleType =>
        java.lang.Double.compare(
          java.lang.Double.parseDouble(a),
          java.lang.Double.parseDouble(b)) <= 0
      case _: NumericType =>
        BigDecimal(a) <= BigDecimal(b)
      case _ =>
        org.apache.spark.unsafe.types.UTF8String.fromString(a)
          .compareTo(org.apache.spark.unsafe.types.UTF8String
            .fromString(b)) <= 0
    }
    if (aLess == takeMin) a else b
  }

  /** Latest stats build at or below the current snapshot version. */
  def latest(spark: SparkSession, tablePath: String): Option[DataFrame] =
    latestBuild(spark, tablePath)
      .map(d => spark.read.parquet(s"$tablePath/$d"))

  /** Most recent `_stats/stats-<v>` directory, if any — vacuum protects
    * it (the CBO prunes live reads with it); superseded builds age out
    * through the orphan sweep like superseded bloom builds.
    */
  def latestBuild(spark: SparkSession, tablePath: String): Option[String] = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(tablePath, "_stats")
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return None
    fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("stats-")).sorted.lastOption
      .map(n => s"_stats/$n")
  }

  private[graft] final case class ColStats(
      n: Long, nNull: Long, ndv: Long, minS: String, maxS: String,
      hist: Option[Seq[Double]] = None)

  /** The latest ANALYZE build's per-column stats (empty when never
    * analyzed) — the DSv2 `Statistics.columnStats` feed: with
    * `spark.sql.cbo.enabled` Spark's own FilterEstimation /
    * JoinEstimation consume these through the scan, so selective-filter
    * cardinality (and with it broadcast and join-order decisions) stops
    * assuming uniformity over file sizes. One `_stats` sidecar read.
    */
  private[graft] def columnStatsFor(
      spark: SparkSession, tablePath: String): Map[String, ColStats] =
    statsMap(spark, tablePath).getOrElse(Map.empty)

  private def statsMap(spark: SparkSession, tablePath: String)
      : Option[Map[String, ColStats]] =
    latest(spark, tablePath).map { df =>
      val hasHist = df.columns.contains("hist") // pre-histogram sidecars
      df.collect().map { r =>
        r.getAs[String]("column") -> ColStats(r.getAs[Long]("n"),
          r.getAs[Long]("n_null"), r.getAs[Long]("ndv"),
          r.getAs[String]("min_str"), r.getAs[String]("max_str"),
          if (hasHist)
            Option(r.getAs[scala.collection.Seq[Double]]("hist")).map(_.toList)
          else None)
      }.toMap
    }

  /** Fraction of rows with value < v, from equi-depth bounds: full
    * buckets below v each contribute 1/B; the straddling bucket
    * interpolates linearly.
    */
  private def histFracBelow(bounds: Seq[Double], v: Double): Double = {
    val b = bounds.length - 1
    if (b < 1) return 0.5
    if (v <= bounds.head) return 0.0
    if (v >= bounds.last) return 1.0
    var i = 0
    while (i < b && bounds(i + 1) <= v) i += 1
    val lo = bounds(i); val hi = bounds(i + 1)
    val partial = if (hi > lo) (v - lo) / (hi - lo) else 1.0
    (i + partial) / b
  }

  /** Estimated surviving rows of `pred` over the analyzed table.
    * Handles conjunctions of `col (=|<|<=|>|>=) literal` on numeric and
    * string columns; anything unrecognized contributes selectivity 1
    * (the sound direction for a broadcast decision is to OVERestimate).
    */
  def estimateRows(
      spark: SparkSession,
      tablePath: String,
      pred: Column): Option[Long] =
    statsMap(spark, tablePath).map { stats =>
      val total = stats.values.map(_.n).maxOption.getOrElse(0L)
      // resolve the Column to a Catalyst expression against the table's
      // schema (analysis only — nothing is scanned)
      val resolved = SnapshotReader.read(spark, tablePath).filter(pred)
        .queryExecution.analyzed.collectFirst {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            f.condition
        }.getOrElse(
          org.apache.spark.sql.catalyst.expressions.Literal.TrueLiteral)
      def sel(e: org.apache.spark.sql.catalyst.expressions.Expression)
          : Double = e match {
        case CAnd(l, r) => sel(l) * sel(r)
        case cmp: BinaryComparison =>
          (cmp.left, cmp.right) match {
            case (a: AttributeReference, Literal(v, _)) =>
              stats.get(a.name).map(s => selOf(cmp, s, v)).getOrElse(1.0)
            case (Literal(v, _), a: AttributeReference) =>
              // flip: lit OP col ≡ col flip(OP) lit
              val flipped: BinaryComparison = cmp match {
                case _: LessThan => GreaterThan(cmp.right, cmp.left)
                case _: LessThanOrEqual => GreaterThanOrEqual(cmp.right, cmp.left)
                case _: GreaterThan => LessThan(cmp.right, cmp.left)
                case _: GreaterThanOrEqual => LessThanOrEqual(cmp.right, cmp.left)
                case _ => EqualTo(cmp.right, cmp.left)
              }
              stats.get(a.name).map(s => selOf(flipped, s, v)).getOrElse(1.0)
            case _ => 1.0
          }
        case _ => 1.0
      }
      math.ceil(total * sel(resolved).min(1.0).max(0.0)).toLong
    }

  private def selOf(cmp: BinaryComparison, s: ColStats, v: Any): Double = {
    def num(x: Any): Option[Double] = x match {
      case n: Number => Some(n.doubleValue())
      case u: org.apache.spark.unsafe.types.UTF8String =>
        u.toString.toDoubleOption
      case other => other.toString.toDoubleOption
    }
    cmp match {
      case _: EqualTo => if (s.ndv > 0) 1.0 / s.ndv else 1.0
      case _ =>
        // equi-depth histogram first (skew-proof); uniform [min, max]
        // interpolation only when no histogram was analyzed
        (s.hist, num(v)) match {
          case (Some(bounds), Some(x)) if bounds.length >= 2 =>
            val f = histFracBelow(bounds, x)
            cmp match {
              case _: LessThan | _: LessThanOrEqual => f
              case _ => 1.0 - f
            }
          case _ =>
            (num(s.minS), num(s.maxS), num(v)) match {
              case (Some(lo), Some(hi), Some(x)) if hi > lo =>
                val f = ((x - lo) / (hi - lo)).max(0.0).min(1.0)
                cmp match {
                  case _: LessThan | _: LessThanOrEqual => f
                  case _ => 1.0 - f
                }
              case _ => 1.0
            }
        }
    }
  }

  /** Selectivity of a pushed DSv2 filter set from the `_stats` sidecar
    * — the hook `GraftBatchScan.estimateStatistics` uses to report
    * POST-FILTER cardinality to Catalyst, so the broadcast decision
    * sees selectivity, not just pruned file bytes. Same textbook rules
    * as [[estimateRows]]; unrecognized shapes contribute 1.0
    * (overestimating is the sound direction). None when no sidecar
    * exists.
    */
  private[graft] def selectivityOfFilters(
      spark: SparkSession,
      tablePath: String,
      filters: Seq[org.apache.spark.sql.sources.Filter]): Option[Double] =
    statsMap(spark, tablePath).map { stats =>
      import org.apache.spark.sql.{sources => v1}
      // selOf dispatches on the catalyst node TYPE only — fabricate one
      val eqT = EqualTo(Literal(0), Literal(0))
      val ltT = LessThan(Literal(0), Literal(0))
      val leT = LessThanOrEqual(Literal(0), Literal(0))
      val gtT = GreaterThan(Literal(0), Literal(0))
      val geT = GreaterThanOrEqual(Literal(0), Literal(0))
      def col(c: String)(f: ColStats => Double): Double =
        stats.get(c).map(f).getOrElse(1.0)
      def one(f: v1.Filter): Double = f match {
        case v1.EqualTo(c, v) => col(c)(selOf(eqT, _, v))
        case v1.LessThan(c, v) => col(c)(selOf(ltT, _, v))
        case v1.LessThanOrEqual(c, v) => col(c)(selOf(leT, _, v))
        case v1.GreaterThan(c, v) => col(c)(selOf(gtT, _, v))
        case v1.GreaterThanOrEqual(c, v) => col(c)(selOf(geT, _, v))
        case v1.In(c, vs) =>
          col(c)(s => if (s.ndv > 0) (vs.length.toDouble / s.ndv).min(1.0) else 1.0)
        case v1.IsNull(c) =>
          col(c)(s => if (s.n > 0) s.nNull.toDouble / s.n else 1.0)
        case v1.IsNotNull(c) =>
          col(c)(s => if (s.n > 0) (s.n - s.nNull).toDouble / s.n else 1.0)
        case v1.And(l, r) => one(l) * one(r)
        case _ => 1.0
      }
      filters.map(one).product.max(0.0).min(1.0)
    }

  /** Join `fact` to a FILTERED slice of the analyzed dimension table,
    * broadcasting the slice when the stats-estimated cardinality is
    * under `broadcastRowLimit` — the post-filter decision Spark's
    * file-size threshold cannot make. Falls back to a plain shuffle
    * join when stats are absent or the estimate is large. Strategy
    * only; identical results either way.
    */
  def joinAuto(
      fact: DataFrame,
      spark: SparkSession,
      dimTablePath: String,
      dimPred: Column,
      joinKeys: Seq[(String, String)],
      broadcastRowLimit: Long = 1000000L): DataFrame = {
    val dim = SnapshotReader.read(spark, dimTablePath).filter(dimPred)
    val cond = joinKeys.map { case (l, r) => fact(l) === dim(r) }
      .reduce(_ && _)
    estimateRows(spark, dimTablePath, dimPred) match {
      case Some(est) if est <= broadcastRowLimit =>
        fact.join(broadcast(dim), cond)
      case _ => fact.join(dim, cond)
    }
  }
}
