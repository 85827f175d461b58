package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loads the driver-generated TESTDATA tables (TESTDATA.md) from a scale
  * directory. All query entry points resolve their inputs through here so
  * the scan always goes through the vectorized parquet reader with
  * Catalyst pruning/pushdown intact (no caching, no driver materialization).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts has drifted across testdata generations: TIMESTAMP(NANOS)
    // parquet (read as raw nanos, converted to µs) or TIMESTAMP(MICROS)
    // with isAdjustedToUTC=false (which Spark 4 infers as TIMESTAMP_NTZ).
    // Normalize both to a session-TZ TIMESTAMP at µs precision — the
    // session runs UTC, so the NTZ→LTZ cast is value-exact and matches
    // DuckDB's naive view of the same column.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" &&
      df.schema("ts").dataType == org.apache.spark.sql.types.LongType) {
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else if (name == "events" &&
      df.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType) {
      df.withColumn("ts",
        org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
    } else df
  }

  /** Registers every table as a temp view named exactly like the DuckDB
    * oracle's view names, so `spark.sql` text and oracle SQL line up. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
