package graft.txn

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snowflake-style result cache keyed by TABLE VERSIONS: a query over
  * transactional tables is a pure function of (query, snapshot versions),
  * so its materialized result can be served until any input table
  * commits — correct invalidation falls out of the txn log for free, no
  * TTL heuristics. The hit path costs one log listing per input table
  * plus a parquet open; the miss path runs the query once and the write
  * is atomic (temp + rename), so concurrent misses race benignly — one
  * result wins, both are identical.
  */
object ResultCache {

  private def cacheRoot: String =
    sys.env.getOrElse("GRAFT_CACHE_DIR",
      sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft_result_cache")

  /** Current-version fingerprint of the input tables. */
  private def versionKey(spark: SparkSession, tables: Seq[String]): String = {
    val conf = spark.sessionState.newHadoopConf()
    tables.sorted.map { t =>
      val v = new TxnLog(t, conf).latestVersion().getOrElse(-1L)
      val h = java.lang.Long.toHexString(graft.functions.SketchExprs.hash64(
        org.apache.spark.unsafe.types.UTF8String.fromString(t)))
      s"${h}v$v"
    }.mkString("_")
  }

  /** Serve `name` over `tables` from cache when every input table is
    * still at its cached version; else run `compute`, cache, serve.
    */
  def run(
      spark: SparkSession,
      name: String,
      tables: Seq[String])(compute: => DataFrame): DataFrame = {
    require(name.matches("[A-Za-z0-9_-]+"), s"unsafe cache name '$name'")
    val key = versionKey(spark, tables)
    val dest = new Path(s"$cacheRoot/${name}_$key")
    val fs = dest.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dest)) {
      val tmp = new Path(dest.getParent, s".${dest.getName}.tmp")
      fs.delete(tmp, true)
      compute.write.mode("overwrite").parquet(tmp.toString)
      fs.mkdirs(dest.getParent)
      if (!fs.rename(tmp, dest) && !fs.exists(dest))
        throw new IllegalStateException(s"could not publish cache at $dest")
    }
    spark.read.parquet(dest.toString)
  }

  /** Drop every cached generation of `name` (all version keys). */
  def invalidate(spark: SparkSession, name: String): Unit = {
    val root = new Path(cacheRoot)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(root))
      fs.listStatus(root).map(_.getPath)
        .filter(_.getName.startsWith(s"${name}_"))
        .foreach(p => fs.delete(p, true))
  }
}
