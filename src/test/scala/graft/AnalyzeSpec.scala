package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.txn.{Analyze, DeletionVectors, SnapshotReader, TableWriter, TxnLog}

/** ANALYZE stats sidecar + the cost-based broadcast decision. */
class AnalyzeSpec extends AnyFunSuite {
  import SparkTestSession._

  private def freshDir(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  private lazy val table: String = {
    val dir = freshDir("anlz")
    TableWriter.write(spark, Tables.load(spark, sf, "orders"), dir,
      version = 0L, commitTs = 1000L)
    Analyze.computeStats(spark, dir,
      Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"))
    dir
  }

  test("stats land correct: counts exact, ndv within approx tolerance") {
    val stats = Analyze.latest(spark, table).get.collect()
      .map(r => r.getAs[String]("column") -> r).toMap
    val o = Tables.load(spark, sf, "orders")
    val n = o.count()
    assert(stats("o_orderkey").getAs[Long]("n") == n)
    assert(stats("o_orderkey").getAs[Long]("n_null") == 0L)
    val ndv = stats("o_orderpriority").getAs[Long]("ndv")
    assert(ndv == 5L, s"5 priorities, approx said $ndv") // tiny domain: exact
    val keyNdv = stats("o_orderkey").getAs[Long]("ndv").toDouble
    assert(math.abs(keyNdv - n) / n < 0.05, "ndv of a unique key ~ n")
  }

  test("equality selectivity ~ n/ndv; range ~ overlap fraction") {
    val o = Tables.load(spark, sf, "orders")
    val n = o.count().toDouble
    val eq = Analyze.estimateRows(spark, table,
      col("o_orderpriority") === "1-URGENT").get.toDouble
    assert(math.abs(eq - n / 5) / (n / 5) < 0.1,
      s"equality on 5-value column should estimate ~n/5, got $eq")
    val hi = o.agg(max(col("o_totalprice"))).collect()(0).getDouble(0)
    val lo = o.agg(min(col("o_totalprice"))).collect()(0).getDouble(0)
    val cut = lo + 0.25 * (hi - lo)
    val rng = Analyze.estimateRows(spark, table,
      col("o_totalprice") <= cut).get.toDouble
    assert(rng > 0 && rng < 0.6 * n,
      s"a 25%-range predicate must not estimate near the full table: $rng")
    // conjunction multiplies
    val both = Analyze.estimateRows(spark, table,
      col("o_orderpriority") === "1-URGENT" &&
        col("o_totalprice") <= cut).get.toDouble
    assert(both < eq && both < rng, "AND must tighten the estimate")
  }

  test("joinAuto broadcasts a selective slice, shuffles a wide one") {
    val fact = Tables.load(spark, sf, "lineitem")
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // row limit scaled to the sf0.001 fixture (1.5k orders): the
      // selective slice estimates far under it, the full table far over
      val selective = Analyze.joinAuto(fact, spark, table,
        col("o_totalprice") > 550000.0, Seq("l_orderkey" -> "o_orderkey"),
        broadcastRowLimit = 200L)
      val p1 = selective.queryExecution.executedPlan.toString
      assert(p1.contains("BroadcastHashJoin"),
        s"stats say the slice is tiny — must broadcast:\n${p1.take(1500)}")
      val wide = Analyze.joinAuto(fact, spark, table,
        col("o_totalprice") > 0.0, Seq("l_orderkey" -> "o_orderkey"),
        broadcastRowLimit = 200L)
      val p2 = wide.queryExecution.executedPlan.toString
      assert(!p2.contains("BroadcastHashJoin"),
        s"near-full dimension must shuffle:\n${p2.take(1500)}")
      // strategy only — identical results
      assert(selective.count() ==
        fact.join(SnapshotReader.read(spark, table)
            .filter(col("o_totalprice") > 550000.0),
          fact("l_orderkey") === col("o_orderkey")).count())
    }
  }

  test("scan statistics fold in pushed-filter selectivity: the join flips to broadcast") {
    // two identical dimension tables; only one carries the _stats sidecar
    val withStats = freshDir("anlz_bc1")
    val noStats = freshDir("anlz_bc2")
    val dim = Tables.load(spark, sf, "orders")
    TableWriter.write(spark, dim, withStats, version = 0L, commitTs = 1000L)
    TableWriter.write(spark, dim, noStats, version = 0L, commitTs = 1000L)
    Analyze.computeStats(spark, withStats, Seq("o_orderkey", "o_custkey"))
    val fact = Tables.load(spark, sf, "lineitem")
    def joined(path: String) = fact.join(
      spark.read.format("graft").option("tablePath", path).load()
        // selective: one key of ~1.5k → post-filter bytes ~ size/ndv
        .filter(col("o_orderkey") === 7L),
      col("l_orderkey") === col("o_orderkey"))
    // threshold below the dim FILE size but far above size/ndv
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "20KB",
      "spark.sql.adaptive.enabled" -> "false") {
      val flip = joined(withStats).queryExecution.executedPlan.toString
      val stay = joined(noStats).queryExecution.executedPlan.toString
      assert(flip.contains("BroadcastHashJoin"),
        s"stats-estimated post-filter size must broadcast:\n${flip.take(1500)}")
      assert(!stay.contains("BroadcastHashJoin"),
        s"without a sidecar the file-size estimate must not:\n${stay.take(1500)}")
      // strategy only — identical results either way
      val a = joined(withStats).collect().map(_.toString).sorted.toSeq
      val b = joined(noStats).collect().map(_.toString).sorted.toSeq
      assert(a == b && a.nonEmpty)
    }
  }

  test("equi-depth histogram beats the uniform assumption on skew") {
    val path = freshDir("hist")
    import spark.implicits._
    // 95% of values in [0, 10], 5% spread to 10000: uniform [min, max]
    // interpolation thinks `x > 5000` keeps ~half the rows; the truth
    // (and the histogram) is ~2.5%
    val skewed = ((0L until 19000L).map(i => i % 10) ++
      (0L until 1000L).map(i => i * 10)).map(Tuple1(_)).toDF("x")
    TableWriter.write(spark, skewed, path, version = 0L, commitTs = 1000L)
    Analyze.computeStats(spark, path, Seq("x"))
    val truth = skewed.filter(col("x") > 5000L).count()
    val est = Analyze.estimateRows(spark, path, col("x") > 5000L).get
    val uniform = 20000L / 2 // what [0, 9990] interpolation predicts
    assert(est <= truth * 3 && est >= truth / 3,
      s"histogram estimate $est should be within 3x of truth $truth")
    assert(est < uniform / 4,
      s"histogram estimate $est should crush the uniform guess $uniform")
  }

  test("ANALYZE stats surface to Catalyst CBO as per-column statistics") {
    withSQLConf("spark.sql.cbo.enabled" -> "true") {
      val df = spark.read.format("graft").option("tablePath", table).load()
        .select(col("o_orderkey"), col("o_orderpriority"))
      val stats = df.queryExecution.optimizedPlan.stats
      assert(stats.rowCount.isDefined, "CBO must see a row count")
      val attr = stats.attributeStats.toSeq
        .map { case (a, s) => a.name -> s }.toMap
      assert(attr.contains("o_orderpriority"),
        s"analyzed column must carry CBO stats: ${attr.keySet}")
      assert(attr("o_orderpriority").distinctCount.exists(_.toLong == 5L))
      assert(attr("o_orderkey").nullCount.exists(_.toLong == 0L))
      assert(attr("o_orderkey").min.isDefined &&
        attr("o_orderkey").max.isDefined,
        "numeric min/max must convert from the sidecar's string form")
      // the estimators consume them: an equality filter's cardinality
      // comes out ~ n/ndv, far below the unfiltered count
      val n = stats.rowCount.get.toLong
      val filtered = df.filter(col("o_orderpriority") === "1-URGENT")
        .queryExecution.optimizedPlan.stats
      assert(filtered.rowCount.isDefined)
      val est = filtered.rowCount.get.toLong
      assert(est < n / 2 && est > 0,
        s"equality selectivity must bite: $est of $n")
    }
  }

  test("CBO range estimates use the equi-depth histogram on skew") {
    import spark.implicits._
    val path = freshDir("anlz_cbo_hist")
    // 10k rows at x=0 (the hot value), 100 spread over (1000, 1100]
    val skewed = (0 until 10000).map(_ => 0L) ++
      (1 to 100).map(i => 1000L + i)
    TableWriter.write(spark, skewed.toDF("x"), path,
      version = 0L, commitTs = 1000L)
    Analyze.computeStats(spark, path, Seq("x"))
    withSQLConf("spark.sql.cbo.enabled" -> "true") {
      val df = spark.read.format("graft").option("tablePath", path).load()
      val base = df.queryExecution.optimizedPlan.stats
      assert(base.attributeStats.toSeq.exists {
        case (a, s) => a.name == "x" && s.histogram.isDefined
      }, "the equi-depth bounds must surface as a CBO histogram")
      val est = df.filter(col("x") > 500L)
        .queryExecution.optimizedPlan.stats.rowCount.get.toLong
      // uniform [0, 1100] would say ~55% of 10100 ≈ 5500 rows; the
      // histogram knows the tail is (at most) one thin bucket. CBO
      // estimates are heuristics — the pin is the ORDER OF MAGNITUDE
      // (a wrong-side estimate here flips broadcasts at 100 TB), not
      // exact truth-tracking: equi-depth bins under extreme skew may
      // under-estimate the thin tail.
      assert(est < 1500L,
        s"histogram range estimate must crush the uniform guess: $est")
      assert(est >= 1L, s"and stay positive: $est")
    }
  }

  test("INCREMENTAL analyze over appends EQUALS a full rebuild " +
      "(sketches union register-wise); mutations fall back to full") {
    val dir = freshDir("anlz_inc2")
    val o = Tables.load(spark, sf, "orders")
    TableWriter.write(spark, o.filter(col("o_orderkey") % 2 === 0), dir,
      version = 0L, commitTs = 1000L)
    Analyze.computeStats(spark, dir, Seq("o_orderkey", "o_orderpriority"))
    TableWriter.append(spark, o.filter(col("o_orderkey") % 2 =!= 0), dir,
      commitTs = 2000L)
    assert(Analyze.computeStatsIncremental(spark, dir,
      Seq("o_orderkey", "o_orderpriority")) == "incremental")
    val inc = Analyze.columnStatsFor(spark, dir)
    // full rebuild over the same state must agree EXACTLY — counts and
    // bounds by arithmetic, ndv because HLL union is register-wise max
    Analyze.computeStats(spark, dir, Seq("o_orderkey", "o_orderpriority"))
    val full = Analyze.columnStatsFor(spark, dir)
    Seq("o_orderkey", "o_orderpriority").foreach { c =>
      assert(inc(c).n == full(c).n, s"$c n")
      assert(inc(c).nNull == full(c).nNull, s"$c nulls")
      assert(inc(c).minS == full(c).minS && inc(c).maxS == full(c).maxS,
        s"$c bounds")
      assert(inc(c).ndv == full(c).ndv,
        s"$c ndv: incremental ${inc(c).ndv} vs rebuild ${full(c).ndv}")
    }
    assert(inc("o_orderkey").n == o.count())
    // nothing new -> noop; a DV delete -> full fallback
    assert(Analyze.computeStatsIncremental(spark, dir,
      Seq("o_orderkey", "o_orderpriority")) == "noop")
    DeletionVectors.deleteWhere(spark, dir, col("o_orderkey") % 7 === 0,
      version = new TxnLog(dir,
        spark.sessionState.newHadoopConf()).latestVersion().get + 1,
      commitTs = 3000L)
    assert(Analyze.computeStatsIncremental(spark, dir,
      Seq("o_orderkey", "o_orderpriority")) == "full")
    assert(Analyze.columnStatsFor(spark, dir)("o_orderkey").n ==
      o.filter(col("o_orderkey") % 7 =!= 0).count())
  }

  test("vacuum protects the LATEST stats build, reclaims superseded " +
      "ones — ANALYZE must survive maintenance") {
    val dir = freshDir("anlz_vac")
    TableWriter.write(spark, Tables.load(spark, sf, "orders").limit(200),
      dir, version = 0L, commitTs = 1000L)
    Analyze.computeStats(spark, dir, Seq("o_orderkey"))
    TableWriter.append(spark,
      Tables.load(spark, sf, "orders").limit(10), dir, commitTs = 2000L)
    Analyze.computeStats(spark, dir, Seq("o_orderkey", "o_custkey"))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // age every stats sidecar so the orphan mtime rule would fire
    val statsRoot = new org.apache.hadoop.fs.Path(dir, "_stats")
    def allStats() = fs.listStatus(statsRoot).map(_.getPath)
    allStats().foreach { d =>
      fs.listStatus(d).foreach(f => fs.setTimes(f.getPath, 1000L, -1L))
    }
    assert(allStats().length == 2)
    TableWriter.vacuum(spark, dir, retainMillis = 0L,
      nowMillis = System.currentTimeMillis() + 1000)
    val remaining = allStats().map(_.getName).toSeq
    assert(remaining == Seq(remaining.max),
      s"only the latest build may remain: $remaining")
    assert(Analyze.columnStatsFor(spark, dir).contains("o_custkey"),
      "the surviving build must still load")
  }

  test("CBO stats flip the PHYSICAL JOIN both ways: sort-merge without " +
      "cbo, broadcast with cbo + ANALYZE") {
    // the filter is an OR across two columns: never pushed to the scan
    // (so the sidecar's pushed-filter selectivity cannot shrink the scan
    // size — isolating the CBO decision), but FilterEstimation can
    // estimate it from the ANALYZE ndv's as ~2/ndv — a few rows
    val key1 = Tables.load(spark, sf, "orders")
      .select(col("o_custkey")).head().getLong(0)
    val fact = Tables.load(spark, sf, "lineitem")
    def plan(cbo: Boolean, threshold: Long): String = withSQLConf(
        "spark.sql.cbo.enabled" -> cbo.toString,
        "spark.sql.autoBroadcastJoinThreshold" -> threshold.toString) {
      val dim = spark.read.format("graft").option("tablePath", table).load()
        .filter(col("o_custkey") === key1 || col("o_orderkey") === 7L)
      fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .queryExecution.sparkPlan.toString
    }
    // threshold: half the UNFILTERED dim scan size — the cbo-off filter
    // estimate (= child size) stays above it; the cbo-on estimate
    // (couple of rows) falls far below it
    val dimSize = spark.read.format("graft").option("tablePath", table)
      .load().queryExecution.optimizedPlan.stats.sizeInBytes.toLong
    val off = plan(cbo = false, dimSize / 2)
    val on = plan(cbo = true, dimSize / 2)
    assert(off.contains("SortMergeJoin") && !off.contains("BroadcastHashJoin"),
      s"without cbo the join must sort-merge:\n${off.take(800)}")
    assert(on.contains("BroadcastHashJoin"),
      s"with cbo + ANALYZE the dim slice must broadcast:\n${on.take(800)}")
    // stats that never change a plan are decoration — this is the
    // decision-level pin on top of AnalyzeSpec's estimator pins
  }

  private def withSQLConf[A](kv: (String, String)*)(f: => A): A = {
    val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
