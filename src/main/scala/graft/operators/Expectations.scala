package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality expectations audit — the DRY-RUN counterpart of table
  * CHECK constraints: per expectation, how many rows violate, without
  * failing anything. The write path enforces (TableWriter rejects a
  * frame violating `Metadata.constraints`); this measures, for the
  * pre-ingest report a pipeline wants BEFORE deciding to quarantine,
  * fix, or accept.
  *
  * SQL CHECK semantics: a NULL predicate PASSES — a violation is the
  * predicate evaluating to exactly FALSE.
  *
  * Scale shape: all expectations audit in ONE aggregate pass over the
  * frame (k conditional counts fused into one partial-agg scan), then
  * the k-row result explodes driver-side — cost is one table scan
  * regardless of how many expectations ride along.
  */
object Expectations {

  /** Per-expectation violation ledger: (expectation, n_rows,
    * n_violations, violation_ppm), ordered by expectation name.
    */
  def audit(df: DataFrame, expectations: Seq[(String, String)]): DataFrame = {
    require(expectations.nonEmpty, "audit needs at least one expectation")
    val vCols = expectations.map { case (name, sql) =>
      count(when(expr(sql) <=> lit(false), 1)).cast("long").as(s"_v_$name")
    }
    val one = df.agg(count(lit(1)).cast("long").as("_n"), vCols: _*)
    val items = expectations.map { case (name, _) =>
      struct(lit(name).as("expectation"),
        col(s"_v_$name").as("n_violations"))
    }
    one.select(col("_n"), explode(array(items: _*)).as("x"))
      .select(col("x.expectation").as("expectation"),
        col("_n").as("n_rows"),
        col("x.n_violations").as("n_violations"),
        when(col("_n") === 0L, lit(0L))
          .otherwise(expr("CAST(x.n_violations * 1000000 DIV _n AS BIGINT)"))
          .as("violation_ppm"))
      .orderBy(col("expectation"))
  }

  /** Audit a graft table against its OWN declared CHECK constraints
    * (named via ALTER TABLE ADD CONSTRAINT) — the post-hoc health check
    * after a CONVERT import or a constraint added to existing data.
    */
  def auditTable(spark: SparkSession, tablePath: String): DataFrame = {
    val log = new graft.txn.TxnLog(tablePath,
      spark.sessionState.newHadoopConf())
    val meta = log.snapshotLatest().metadata.getOrElse(
      throw new IllegalStateException(s"no metadata at $tablePath"))
    val named = meta.constraintNames.toSeq
    val anonymous = meta.constraints
      .filterNot(meta.constraintNames.values.toSet)
      .zipWithIndex.map { case (e, i) => s"check_$i" -> e }
    val all = (named ++ anonymous).sortBy(_._1)
    require(all.nonEmpty, s"table at $tablePath declares no constraints")
    audit(graft.txn.SnapshotReader.read(spark, tablePath), all)
  }
}
