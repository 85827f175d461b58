package graft.queries

import graft.Tables
import org.apache.spark.sql.SparkSession

/** Bucketed-table lifecycle for the co-located join (q39): both join
  * sides written ONCE per scale dir with `bucketBy(N, key).sortBy(key)`,
  * so every later join on that key plans with zero Exchange (and a
  * bucket-aligned sort) — Spark's form of co-partitioning fact tables,
  * the discipline that removes the dominant shuffle from a 100 TB join.
  * At cluster scale the same write would land in the warehouse/metastore;
  * here the in-memory catalog + local warehouse dir model it.
  */
object Bucketing {

  val Buckets = 16

  /** Returns (ordersTable, lineitemTable) bucketed on the join key,
    * writing them only if this session hasn't yet (keyed by scale dir).
    */
  def ensureBucketed(spark: SparkSession, dir: String): (String, String) = {
    val key = java.lang.Long.toHexString(
      graft.functions.SketchExprs.hash64(
        org.apache.spark.unsafe.types.UTF8String.fromString(dir)))
    val ot = s"graft_orders_b$key"
    val lt = s"graft_lineitem_b$key"
    def write(table: String, src: String, bucketCol: String): Unit = {
      // the in-memory catalog forgets tables across JVMs but the warehouse
      // dir persists — clear a stale location before re-creating
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      val loc = new org.apache.hadoop.fs.Path(s"$wh/$table")
      val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(loc)) fs.delete(loc, true)
      Tables.load(spark, dir, src)
        .write.bucketBy(Buckets, bucketCol).sortBy(bucketCol)
        .mode("overwrite").saveAsTable(table)
    }
    if (!spark.catalog.tableExists(ot)) write(ot, "orders", "o_orderkey")
    if (!spark.catalog.tableExists(lt)) write(lt, "lineitem", "l_orderkey")
    (ot, lt)
  }
}
