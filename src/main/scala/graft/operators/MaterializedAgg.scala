package graft.operators

import graft.txn.{CdcReader, SnapshotReader, TableWriter, TxnLog}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental materialized-view maintenance (IVM) for distributive
  * aggregates — grouped COUNT + SUM (AVG derives as sum/cnt at read time) —
  * over a graft table.
  *
  * The MV is itself a graft table: every refresh is a versioned commit, so
  * the view is time-travelable and its own CDC stream exists. A refresh
  * applies ONLY the CDC delta since the last refreshed base version: row
  * additions (op 'c') count +1, row removals (whole-file 'r' and
  * deletion-vector 'd') count −1, and the signed per-key delta aggregate
  * merges into the stored state with ONE outer join. The base table is
  * never re-aggregated — at 100 TB the refresh cost is proportional to the
  * CHANGED rows, not the table.
  *
  * Sums run in exact decimal (the engine's money convention, see
  * queries/Relational.scala) so additive maintenance cannot drift from a
  * from-scratch recompute: decimal addition is associative, float addition
  * is not.
  */
object MaterializedAgg {

  /** keys → GROUP BY columns; sums → columns maintained as exact-decimal
    * SUMs alongside the row count.
    */
  final case class Spec(keys: Seq[String], sums: Seq[String])

  private val SumType = DecimalType(25, 2)
  private def money(c: Column): Column = c.cast(DecimalType(15, 2))

  private def stateFile(mvPath: String) = s"$mvPath/_mv_state.json"

  private def writeState(spark: SparkSession, mvPath: String,
      baseVersion: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(stateFile(mvPath))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(s"""{"baseVersion":$baseVersion}""".getBytes("UTF-8"))
    finally out.close()
  }

  /** The base-table version the MV state reflects. */
  def refreshedThrough(spark: SparkSession, mvPath: String): Long = {
    val p = new org.apache.hadoop.fs.Path(stateFile(mvPath))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    """"baseVersion"\s*:\s*(\d+)""".r.findFirstMatchIn(txt)
      .map(_.group(1).toLong)
      .getOrElse(throw new IllegalStateException(s"bad MV state: $txt"))
  }

  private def aggOf(df: DataFrame, spec: Spec, sign: Column): DataFrame = {
    val aggs = sum(sign).as("mv_cnt") +:
      spec.sums.map(c => sum(sign * money(col(c))).cast(SumType)
        .as(s"sum_$c"))
    df.groupBy(spec.keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Full aggregate of the base snapshot at `versionAsOf` → MV commit v0. */
  def create(spark: SparkSession, basePath: String, mvPath: String,
      spec: Spec, versionAsOf: Option[Long] = None): Long = {
    val base = SnapshotReader.read(spark, basePath, versionAsOf = versionAsOf)
    val mv = aggOf(base, spec, lit(1L))
    TableWriter.write(spark, mv, mvPath, version = 0L,
      commitTs = System.currentTimeMillis(), operation = "MV CREATE")
    val baseV = versionAsOf.getOrElse(
      new TxnLog(basePath, spark.sessionState.newHadoopConf())
        .latestVersion().getOrElse(0L))
    writeState(spark, mvPath, baseV)
    baseV
  }

  /** Apply the CDC delta (base's versions (refreshedThrough, latest]) to
    * the stored state. No-op when the base hasn't moved. Returns the new
    * refreshed-through version.
    */
  def refresh(spark: SparkSession, basePath: String, mvPath: String,
      spec: Spec): Long = {
    val from = refreshedThrough(spark, mvPath)
    val latest = new TxnLog(basePath, spark.sessionState.newHadoopConf())
      .latestVersion().getOrElse(0L)
    if (latest <= from) return from

    val delta = CdcReader.cdc(spark, basePath, startingVersion = from,
        includeHistory = false)
      .filter(col("op").isin("c", "r", "d")) // 'm' carries no rows
      .withColumn("_sign",
        when(col("op") === "c", lit(1L)).otherwise(lit(-1L)))
    val dAgg = aggOf(delta, spec, col("_sign"))
      .withColumnRenamed("mv_cnt", "_d_cnt")
    val dRenamed = spec.sums.foldLeft(dAgg)((d, c) =>
      d.withColumnRenamed(s"sum_$c", s"_d_sum_$c"))

    val zero = lit(BigDecimal(0)).cast(SumType)
    val cur = SnapshotReader.read(spark, mvPath)
    val merged = cur.join(dRenamed, spec.keys, "full_outer")
      .select(spec.keys.map(col) ++
        Seq((coalesce(col("mv_cnt"), lit(0L)) +
          coalesce(col("_d_cnt"), lit(0L))).as("mv_cnt")) ++
        spec.sums.map(c =>
          (coalesce(col(s"sum_$c"), zero) + coalesce(col(s"_d_sum_$c"), zero))
            .cast(SumType).as(s"sum_$c")): _*)
      .filter(col("mv_cnt") > 0) // fully-dead groups leave the view
    // the refresh REPLACES the state: remove every current MV file in the
    // same commit the new aggregate lands in (snapshot isolation — a
    // reader sees exactly one generation)
    val now = System.currentTimeMillis()
    val mvLog = new TxnLog(mvPath, spark.sessionState.newHadoopConf())
    val mvSnap = mvLog.snapshotLatest()
    val removes = mvSnap.files.map(f =>
      graft.txn.RemoveFile(f.path, now, f.partitionValues))
    TableWriter.write(spark, merged, mvPath, version = mvSnap.version + 1,
      commitTs = now, operation = "MV REFRESH", extraActions = removes)
    writeState(spark, mvPath, latest)
    latest
  }
}
