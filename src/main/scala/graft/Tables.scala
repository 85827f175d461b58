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
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 refuses to read
    // as a timestamp; read it as raw nanos and convert to µs precision
    // (exact — matches DuckDB's epoch_us view of the same column).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" &&
      df.schema("ts").dataType == org.apache.spark.sql.types.LongType) {
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else df
  }

  /** Registers every table as a temp view named exactly like the DuckDB
    * oracle's view names, so `spark.sql` text and oracle SQL line up. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
