package graft.operators

import graft.txn.{SnapshotReader, TxnLog}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type-2 history build from a versioned table: turn the table's
  * commit history into per-key validity intervals
  * (key, state, valid_from, valid_to) — valid_to NULL for the current
  * interval. The warehouse-dimension shape: "what did this key look
  * like, when".
  *
  * States are compared at per-KEY aggregate granularity (row count +
  * a caller-chosen cents-exact measure): the multiset view — row-level
  * comparison is ill-defined under duplicate keys, and integer cents
  * keep the comparison engine-exact.
  *
  * Scale: one scan per version (time travel), each reduced to per-key
  * aggregates BEFORE any join; key deletions surface through one
  * left-anti join per CONSECUTIVE version pair (tombstones), then a
  * single window partitioned by key orders ≤|versions| rows per key.
  * Never a versions × versions join. For tables with long histories,
  * bound `versions` to the range of interest.
  */
object Scd2 {

  /** Validity intervals for every key over `versions` (default: all).
    * Returns (keys..., n, cents, valid_from, valid_to) — one row per
    * interval, `valid_to` null while current. A deleted key's last
    * interval CLOSES at the version it vanished (and reopens if it
    * reappears).
    */
  def intervals(
      spark: SparkSession,
      tablePath: String,
      keys: Seq[String],
      centsOf: Column,
      versions: Option[Seq[Long]] = None): DataFrame = {
    val log = new TxnLog(tablePath, spark.sessionState.newHadoopConf())
    val vs = versions.getOrElse(log.versions())
    require(vs.nonEmpty, s"no versions at $tablePath")
    val states = vs.map { v =>
      SnapshotReader.read(spark, tablePath, versionAsOf = Some(v))
        .groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("n"),
          sum(centsOf.cast("long")).as("cents"))
        .withColumn("version", lit(v))
    }
    // tombstones make ABSENCE explicit, so deletion closes an interval
    // and reappearance opens a fresh one — the window below never has to
    // reason about gaps
    val tombstones = vs.sliding(2).collect { case Seq(a, b) =>
      states(vs.indexOf(a)).select(keys.map(col): _*)
        .join(states(vs.indexOf(b)).select(keys.map(col): _*),
          keys, "left_anti")
        .withColumn("n", lit(null).cast("long"))
        .withColumn("cents", lit(null).cast("long"))
        .withColumn("version", lit(b))
    }.toSeq
    val all = (states ++ tombstones).reduce(_ unionByName _)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("version"))
    all
      .withColumn("prev_n", lag(col("n"), 1).over(w))
      .withColumn("prev_cents", lag(col("cents"), 1).over(w))
      .withColumn("is_first", lag(col("version"), 1).over(w).isNull)
      // null-safe compares: a transition to/from a tombstone is a change
      .filter(col("is_first") ||
        !(col("prev_n") <=> col("n")) ||
        !(col("prev_cents") <=> col("cents")))
      .withColumn("valid_from", col("version"))
      .withColumn("valid_to", lead(col("version"), 1).over(w))
      .filter(col("n").isNotNull) // absent-intervals are not output rows
      .select((keys.map(col) ++ Seq(col("n"), col("cents"),
        col("valid_from"), col("valid_to"))): _*)
  }
}
