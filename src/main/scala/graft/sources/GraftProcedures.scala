package graft.sources

import graft.txn._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Maintenance procedures on Spark 4's ProcedureCatalog — the
  * `CALL gcat.system.optimize(...)` surface.
  *
  * The procedure-style TVFs (`graft_optimize` & co) run their side
  * effects when the TVF PLANS, so `EXPLAIN SELECT * FROM
  * graft_vacuum(...)` would vacuum — the documented q218/q219 caveat.
  * `CALL` fixes that at the framework level: Spark's `Call` plan
  * implements `ExecutableDuringAnalysis` with `stageForExplain()`, so
  * EXPLAIN renders the staged plan WITHOUT invoking the procedure, and
  * the body runs exactly once per executed statement. The TVFs stay as
  * deprecated aliases; every procedure here delegates to the same
  * TableWriter/TxnLog entry points.
  *
  * Table arguments accept either `ns.name` (resolved against the
  * catalog's warehouse) or an explicit path (anything containing '/').
  */
private[sources] object GraftProcedures {

  /** Resolve a procedure's `table` argument against the warehouse. */
  private def resolvePath(warehouse: String, table: String): String =
    if (table.contains("/")) table
    else s"$warehouse/${table.split('.').mkString("/")}"

  private def scanOf(schema: StructType, data: Seq[Seq[Any]]): Scan =
    new LocalScan {
      override def readSchema(): StructType = schema
      override def rows(): Array[InternalRow] = data.map { vs =>
        new GenericInternalRow(vs.map {
          case s: String => UTF8String.fromString(s)
          case other => other
        }.toArray): InternalRow
      }.toArray
      override def description(): String = "graft procedure result"
    }

  private def in(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()

  private def inDefault(
      name: String, dt: DataType, default: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  /** One self-bound procedure: parameters, a result schema, and a body
    * that runs AT EXECUTION (Spark invokes call() from the analyzed
    * Call plan only when execute=true — never under EXPLAIN).
    */
  private abstract class P(
      procName: String,
      desc: String,
      params: Seq[ProcedureParameter],
      resultSchema: StructType)
    extends UnboundProcedure with BoundProcedure {

    override def name(): String = procName
    override def description(): String = desc
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params.toArray
    override def isDeterministic: Boolean = false

    def run(spark: SparkSession, input: InternalRow): Seq[Seq[Any]]

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = SparkSession.active
      java.util.Collections.singletonList(
        scanOf(resultSchema, run(spark, input))).iterator()
    }
  }

  private def log(spark: SparkSession, path: String): TxnLog =
    new TxnLog(path, spark.sessionState.newHadoopConf())

  /** Next version of a table that must EXIST — a typo'd identifier
    * fails with the resolved path, not a bare NoSuchElementException.
    */
  private def nextVersion(l: TxnLog, path: String): Long =
    l.latestVersion().getOrElse(throw new IllegalArgumentException(
      s"no graft table at $path (empty or missing _txn_log)")) + 1

  /** The procedure registry for one catalog (bound to its warehouse). */
  def all(warehouse: String): Map[String, UnboundProcedure] = Seq(

    new P("optimize",
      "compact small files (bin-packed to max_file_mb when given; " +
        "Z-ordered by the comma-separated zorder_cols when given)",
      Seq(in("table", StringType),
        inDefault("max_file_mb", LongType, "NULL"),
        inDefault("zorder_cols", StringType, "''")),
      StructType(Seq(StructField("version", LongType),
        StructField("files_before", LongType),
        StructField("files_after", LongType)))) {
      override def run(spark: SparkSession, in: InternalRow): Seq[Seq[Any]] = {
        val path = resolvePath(warehouse, in.getUTF8String(0).toString)
        val maxMb = if (in.isNullAt(1)) None else Some(in.getLong(1))
        val zorder =
          if (in.isNullAt(2)) Seq.empty
          else in.getUTF8String(2).toString
            .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val l = log(spark, path)
        val v = nextVersion(l, path)
        val before = l.snapshotLatest().files.size
        TableWriter.compact(spark, path,
          version = v,
          commitTs = System.currentTimeMillis(),
          zorderBy = zorder,
          maxFileBytes = maxMb.map(_ * 1024L * 1024L)
            .getOrElse(Long.MaxValue))
        val after = l.snapshotLatest()
        Seq(Seq(after.version, before.toLong, after.files.size.toLong))
      }
    },

    new P("vacuum",
      "delete data files unreferenced by the latest snapshot past the " +
        "retention horizon; retention under 7 days refuses unless force",
      Seq(in("table", StringType),
        in("retain_millis", LongType),
        inDefault("dry_run", BooleanType, "false"),
        inDefault("force", BooleanType, "false")),
      StructType(Seq(StructField("deleted_path", StringType)))) {
      override def run(spark: SparkSession, in: InternalRow): Seq[Seq[Any]] = {
        val path = resolvePath(warehouse, in.getUTF8String(0).toString)
        val retain = in.getLong(1)
        val dry = !in.isNullAt(2) && in.getBoolean(2)
        val force = !in.isNullAt(3) && in.getBoolean(3)
        // same safety interlock as the TVF: a short retention silently
        // breaks concurrent readers, time travel, and CDC replay
        require(dry || force || retain >= 7L * 24 * 3600 * 1000,
          s"vacuum: retention ${retain}ms is below the 7-day safety " +
            "floor — pass force => true to override")
        TableWriter.vacuum(spark, path, retainMillis = retain,
          nowMillis = System.currentTimeMillis(), dryRun = dry)
          .map(p => Seq(p))
      }
    },

    new P("restore",
      "restore the table's live state to a past version as a NEW " +
        "commit (history preserved, rolled-back states stay " +
        "time-travelable)",
      Seq(in("table", StringType), in("version", LongType)),
      StructType(Seq(StructField("version", LongType),
        StructField("restored_to", LongType)))) {
      override def run(spark: SparkSession, in: InternalRow): Seq[Seq[Any]] = {
        val path = resolvePath(warehouse, in.getUTF8String(0).toString)
        val to = in.getLong(1)
        val v = nextVersion(log(spark, path), path)
        TableWriter.restore(spark, path, toVersion = to,
          version = v, commitTs = System.currentTimeMillis())
        Seq(Seq(v, to))
      }
    },

    new P("expire_log",
      "delete commit files and checkpoints below the newest checkpoint " +
        "past the retention horizon",
      Seq(in("table", StringType), in("retain_millis", LongType)),
      StructType(Seq(StructField("deleted_log_file", StringType)))) {
      override def run(spark: SparkSession, in: InternalRow): Seq[Seq[Any]] = {
        val path = resolvePath(warehouse, in.getUTF8String(0).toString)
        log(spark, path).expireLog(in.getLong(1)).map(p => Seq(p))
      }
    },

    new P("clone_deep",
      "independent physical copy of a table snapshot: data files and " +
        "referenced deletion-vector sidecars copy (distributed) into " +
        "the destination's own tree; deep-cloning a shallow clone " +
        "materializes it",
      Seq(in("source", StringType), in("target", StringType),
        inDefault("version", LongType, "NULL")),
      StructType(Seq(StructField("source_version", LongType),
        StructField("files", LongType),
        StructField("bytes", LongType)))) {
      override def run(spark: SparkSession, in: InternalRow): Seq[Seq[Any]] = {
        val src = resolvePath(warehouse, in.getUTF8String(0).toString)
        val dst = resolvePath(warehouse, in.getUTF8String(1).toString)
        val asOf = if (in.isNullAt(2)) None else Some(in.getLong(2))
        val v = TableWriter.cloneDeep(spark, src, dst,
          commitTs = System.currentTimeMillis(), versionAsOf = asOf)
        val files = log(spark, dst).snapshotLatest().files
        Seq(Seq(v, files.size.toLong, files.map(_.size).sum))
      }
    },

    new P("analyze",
      "compute per-column statistics (counts, nulls, HLL ndv, min/max, " +
        "equi-depth histogram) into a versioned _stats sidecar the CBO " +
        "consumes; incremental => true scans only files appended since " +
        "the last build (sketches union; falls back to full on " +
        "rewrites/deletes)",
      Seq(in("table", StringType), in("columns", StringType),
        inDefault("incremental", BooleanType, "false")),
      StructType(Seq(StructField("version", LongType),
        StructField("n_columns", LongType),
        StructField("mode", StringType)))) {
      override def run(spark: SparkSession, in: InternalRow): Seq[Seq[Any]] = {
        val path = resolvePath(warehouse, in.getUTF8String(0).toString)
        val cols = in.getUTF8String(1).toString
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val inc = !in.isNullAt(2) && in.getBoolean(2)
        val l = log(spark, path)
        val v = l.latestVersion().getOrElse(
          throw new IllegalArgumentException(
            s"no graft table at $path (empty or missing _txn_log)"))
        val mode =
          if (inc) Analyze.computeStatsIncremental(spark, path, cols)
          else { Analyze.computeStats(spark, path, cols); "full" }
        Seq(Seq(v, cols.size.toLong, mode))
      }
    },

    new P("fsck",
      "reconcile the log with physical storage: live files whose bytes " +
        "are gone list (dry_run, the default) or commit as removes so " +
        "scans stop crashing on lost splits (FSCK REPAIR TABLE)",
      Seq(in("table", StringType),
        inDefault("dry_run", BooleanType, "true")),
      StructType(Seq(StructField("missing_path", StringType),
        StructField("repaired", BooleanType)))) {
      override def run(spark: SparkSession, in: InternalRow): Seq[Seq[Any]] = {
        val path = resolvePath(warehouse, in.getUTF8String(0).toString)
        val dry = in.isNullAt(1) || in.getBoolean(1)
        val missing =
          if (dry) Fsck.missingFiles(spark, path)
          else Fsck.repair(spark, path, System.currentTimeMillis())
        missing.map(p => Seq(p, java.lang.Boolean.valueOf(!dry)))
      }
    },

    new P("reorg",
      "rewrite deletion-vector-carrying files without their dead rows " +
        "(REORG ... APPLY (PURGE)) — logical table unchanged",
      Seq(in("table", StringType)),
      StructType(Seq(StructField("version", LongType),
        StructField("files_purged", LongType),
        StructField("dvs_remaining", LongType)))) {
      override def run(spark: SparkSession, in: InternalRow): Seq[Seq[Any]] = {
        val path = resolvePath(warehouse, in.getUTF8String(0).toString)
        val l = log(spark, path)
        val rewritten = DeletionVectors.purge(spark, path,
          version = nextVersion(l, path),
          commitTs = System.currentTimeMillis())
        val after = l.snapshotLatest()
        Seq(Seq(after.version, rewritten.size.toLong,
          after.files.count(_.dv.isDefined).toLong))
      }
    },

    new P("checkpoint",
      "force a parquet checkpoint of the latest version (one is written " +
        "automatically every checkpointInterval commits): snapshot " +
        "resolution then reads one checkpoint + a bounded tail, and " +
        "expire_log gains an anchor below which commit files can drop",
      Seq(in("table", StringType)),
      StructType(Seq(StructField("version", LongType),
        StructField("n_live_files", LongType)))) {
      override def run(spark: SparkSession, in: InternalRow): Seq[Seq[Any]] = {
        val path = resolvePath(warehouse, in.getUTF8String(0).toString)
        val l = log(spark, path)
        val v = l.latestVersion().getOrElse(
          throw new IllegalArgumentException(
            s"no graft table at $path (empty or missing _txn_log)"))
        l.writeCheckpoint(v)
        Seq(Seq(v, l.snapshot(v).files.size.toLong))
      }
    }
  ).map(p => p.name() -> (p: UnboundProcedure)).toMap

  /** CALL addresses procedures under the `system` namespace (the
    * Iceberg convention): `CALL gcat.system.optimize(...)`.
    */
  val Namespace: Array[String] = Array("system")

  def load(warehouse: String, ident: Identifier): UnboundProcedure = {
    require(ident.namespace().sameElements(Namespace),
      s"unknown procedure namespace ${ident.namespace().mkString(".")} " +
        "(procedures live under `system`)")
    all(warehouse).getOrElse(ident.name(),
      throw new IllegalArgumentException(
        s"unknown procedure ${ident.name()}; available: " +
          all(warehouse).keys.toSeq.sorted.mkString(", ")))
  }

  def list(warehouse: String, namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Namespace))
      all(warehouse).keys.toSeq.sorted
        .map(n => Identifier.of(Namespace, n)).toArray
    else Array.empty
}
