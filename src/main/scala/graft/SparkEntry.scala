package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All operators live in the QueryDef registries under graft.queries /
  * graft.operators; this object is just the flat map the driver consumes.
  */
object SparkEntry {

  /** Full operator registry. Order matters only for readability. */
  def registry: Seq[QueryDef] =
    _root_.graft.queries.Relational.defs ++
      _root_.graft.queries.Events.defs ++
      _root_.graft.queries.Text.defs ++
      _root_.graft.queries.Similarity.defs ++
      _root_.graft.queries.Cdc.defs ++
      _root_.graft.queries.Maintenance.defs ++
      _root_.graft.queries.Multimodal.defs ++
      _root_.graft.queries.Pipeline.defs ++
      _root_.graft.queries.Analytics.defs ++
      _root_.graft.queries.TpchClassics.defs ++
      _root_.graft.queries.StreamingLive.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
