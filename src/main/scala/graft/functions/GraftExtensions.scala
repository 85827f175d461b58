package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Pmod}

/** SQL surface for the engine's custom Catalyst expressions, via the
  * standard `SparkSessionExtensions` hook:
  *
  *   spark.sql.extensions=graft.functions.GraftExtensions
  *
  * registers them at session build (the cluster deployment path), and
  * [[GraftExtensions.install]] registers the same functions on an
  * already-running session (the notebook/test path). Either way,
  * `spark.sql("SELECT graft_murmur3(...)...")` plans the same codegen'd
  * expressions the DataFrame API uses — SQL users get routing parity
  * and the vector kernels without touching Scala.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    GraftExtensions.tableFunctions.foreach { case (name, info, builder) =>
      ext.injectTableFunction((FunctionIdentifier(name), info, builder))
    }
  }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** (name, info, builder) for every exposed function. */
  val functions: Seq[(String, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    ("graft_murmur3",
      info("graft_murmur3",
        "graft_murmur3(str) - reference-parity murmur3_x86_32 of a string"),
      (children: Seq[Expression]) => Murmur3X86Expr(children.head)),
    ("graft_route",
      info("graft_route",
        "graft_route(pv, n) - murmur3 route slot in [0, n)"),
      (children: Seq[Expression]) =>
        // same & MAX_VALUE % n form as Murmur3X86.routeIndex
        Pmod(org.apache.spark.sql.catalyst.expressions.BitwiseAnd(
          Murmur3X86Expr(children.head),
          org.apache.spark.sql.catalyst.expressions.Literal(Int.MaxValue)),
          children(1))),
    ("graft_dot",
      info("graft_dot",
        "graft_dot(a, b) - sequential-order dot product of double arrays"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1))),
    ("graft_simhash",
      info("graft_simhash",
        "graft_simhash(tokens) - packed 64-bit SimHash of a string array"),
      (children: Seq[Expression]) => SimHash64Expr(children.head)),
    ("graft_shingles",
      info("graft_shingles",
        "graft_shingles(tokens, k) - distinct 64-bit k-shingle hashes"),
      (children: Seq[Expression]) =>
        ShingleHashesExpr(children.head, intLit(children(1), "graft_shingles"))),
    ("graft_minhash",
      info("graft_minhash",
        "graft_minhash(shingle_hashes, n) - n-hash MinHash signature"),
      (children: Seq[Expression]) =>
        MinHashSigExpr(children.head, intLit(children(1), "graft_minhash"))))

  /** Table-valued functions — SQL access to whole-relation surfaces
    * (the Delta `table_changes` idea):
    *
    *   SELECT * FROM graft_changes('/data/t', 0)
    *
    * returns the CDC envelope (op/partition/ts/version + payload) from
    * `startingVersion`, snapshot-first (includeHistory defaults true;
    * pass false for incremental-only). Args must be literals — the
    * table's schema is resolved at PLANNING time from its log.
    */
  val tableFunctions: Seq[(String, ExpressionInfo,
      Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] =
    Seq(
      ("graft_changes",
        info("graft_changes",
          "graft_changes(tablePath, startingVersion[, includeHistory]) - " +
            "CDC rows of a graft table from a version"),
        (children: Seq[Expression]) => {
          require(children.size >= 2 && children.size <= 3,
            "graft_changes(tablePath, startingVersion[, includeHistory])")
          val path = strLitOf(children.head, "graft_changes")
          val sv = longLitOf(children(1), "graft_changes")
          val hist = children.lift(2).forall(boolLitOf(_, "graft_changes"))
          graft.txn.CdcReader.cdc(
            org.apache.spark.sql.SparkSession.active, path,
            startingVersion = sv, includeHistory = hist)
            .queryExecution.logical
        }),
      ("graft_history",
        info("graft_history",
          "graft_history(tablePath) - commit history of a graft table " +
            "(version, operation, commit_ts, n_added, n_removed), newest first"),
        (children: Seq[Expression]) => {
          require(children.size == 1, "graft_history(tablePath)")
          val path = strLitOf(children.head, "graft_history")
          val spark = org.apache.spark.sql.SparkSession.active
          import spark.implicits._
          new graft.txn.TxnLog(path, spark.sessionState.newHadoopConf())
            .history()
            .toDF("version", "operation", "commit_ts", "n_added", "n_removed")
            .queryExecution.logical
        }),
      // Pure-read TVF: a path table (no catalog registration needed),
      // optionally time-traveled — `SELECT * FROM graft_snapshot(path)`.
      ("graft_snapshot",
        info("graft_snapshot",
          "graft_snapshot(tablePath[, versionAsOf]) - rows of a graft " +
            "table's snapshot (latest, or the given version)"),
        (children: Seq[Expression]) => {
          require(children.nonEmpty && children.size <= 2,
            "graft_snapshot(tablePath[, versionAsOf])")
          val path = strLitOf(children.head, "graft_snapshot")
          graft.txn.SnapshotReader.read(
            org.apache.spark.sql.SparkSession.active, path,
            versionAsOf = children.lift(1)
              .map(longLitOf(_, "graft_snapshot")))
            .queryExecution.logical
        }),
      // PROCEDURE-style TVFs (the Iceberg CALL idea expressed as table
      // functions, like Delta's OPTIMIZE/VACUUM commands): the
      // maintenance action runs when the function is PLANNED — also
      // under EXPLAIN — and the returned relation is its metrics row.
      ("graft_optimize",
        info("graft_optimize",
          "graft_optimize(tablePath) - compact the table's small files " +
            "into one file per partition; returns (version, " +
            "files_before, files_after)"),
        (children: Seq[Expression]) => {
          require(children.size == 1, "graft_optimize(tablePath)")
          val path = strLitOf(children.head, "graft_optimize")
          val spark = org.apache.spark.sql.SparkSession.active
          val log = new graft.txn.TxnLog(path,
            spark.sessionState.newHadoopConf())
          val before = log.snapshotLatest().files.size
          graft.txn.TableWriter.compact(spark, path,
            version = log.latestVersion().get + 1,
            commitTs = System.currentTimeMillis())
          val after = log.snapshotLatest()
          import spark.implicits._
          Seq((after.version, before.toLong, after.files.size.toLong))
            .toDF("version", "files_before", "files_after")
            .queryExecution.logical
        }),
      ("graft_vacuum",
        info("graft_vacuum",
          "graft_vacuum(tablePath, retainMillis[, dryRun]) - delete " +
            "data files unreferenced by the latest snapshot past the " +
            "retention horizon; returns one row per deleted path"),
        (children: Seq[Expression]) => {
          require(children.size >= 2 && children.size <= 3,
            "graft_vacuum(tablePath, retainMillis[, dryRun])")
          val path = strLitOf(children.head, "graft_vacuum")
          val retain = longLitOf(children(1), "graft_vacuum")
          val dry = children.lift(2).exists(boolLitOf(_, "graft_vacuum"))
          val spark = org.apache.spark.sql.SparkSession.active
          val deleted = graft.txn.TableWriter.vacuum(spark, path,
            retainMillis = retain,
            nowMillis = System.currentTimeMillis(), dryRun = dry)
          import spark.implicits._
          deleted.toDF("deleted_path").queryExecution.logical
        }))

  /** SQL literal → Int for kernel shape parameters (k, numHashes): these
    * fix the expression's output type/semantics, so a non-literal is a
    * planning error, reported as one.
    */
  private def intLit(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal integer shape parameter, got $other")
  }

  private def strLitOf(e: Expression, fn: String): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
        if v != null && e.dataType ==
          org.apache.spark.sql.types.StringType =>
      v.toString
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal string table path, got $other")
  }

  private def longLitOf(e: Expression, fn: String): Long = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal version number, got $other")
  }

  private def boolLitOf(e: Expression, fn: String): Boolean = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal boolean, got $other")
  }

  /** Register on an already-built session (tests, notebooks). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    functions.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), inf, builder)
    }
    tableFunctions.foreach { case (name, inf, builder) =>
      spark.sessionState.tableFunctionRegistry.registerFunction(
        FunctionIdentifier(name), inf, builder)
    }
  }
}
