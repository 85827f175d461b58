package graft.txn

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{BloomFilterExprs, SketchExprs}
import graft.functions.BloomFilterExprs.LongBloom

/** Per-FILE bloom indexes for point-lookup file skipping (the Delta
  * bloom-index idea): min/max stats cannot prune an equality probe on a
  * high-cardinality key — every file's [min, max] spans the whole
  * domain — but a few bits per row per file answer "is key k possibly in
  * this file" and drop the rest of a 100 TB scan before it starts.
  *
  * Builds live OUTSIDE the data files, in `_bloom/bloom-<v>/` sidecar
  * parquet keyed by (file_name, physical column): the log stays
  * line-sized, data files stay immutable, and a rebuild is one sidecar
  * swap. Soundness: a file with no bloom row (added after the build, or
  * never indexed) is always kept; deletion vectors only shrink a file,
  * so its bloom stays an over-approximation.
  */
object BloomIndex {

  def dir(version: Long): String = f"_bloom/bloom-$version%020d"

  /** Hash a probe value the way [[build]] hashed the column. */
  private[graft] def probeHash(dt: org.apache.spark.sql.types.DataType,
      v: Any): Option[Long] = dt match {
    case LongType =>
      try Some(v.toString.toLong) catch { case _: NumberFormatException => None }
    case StringType =>
      Some(SketchExprs.hash64(UTF8String.fromString(v.toString)))
    case _ => None
  }

  /** Build per-file blooms for `columns` (long/string) over the LIVE
    * files of `version`'s snapshot, into one sidecar directory. Columns
    * are named LOGICALLY; the sidecar stores physical names so the index
    * survives later renames.
    */
  def build(
      spark: SparkSession,
      tablePath: String,
      columns: Seq[String],
      version: Long,
      bitsPerKey: Int = 10): Unit = {
    require(columns.nonEmpty)
    val conf = spark.sessionState.newHadoopConf()
    val log = new TxnLog(tablePath, conf)
    val snap = log.snapshot(version)
    val meta = snap.metadata.getOrElse(
      throw new IllegalStateException(s"no metadata at $tablePath"))
    val schema = org.apache.spark.sql.types.DataType.fromJson(meta.schemaJson)
      .asInstanceOf[StructType]
    val mapping = meta.columnMapping
    val files = snap.files.filterNot(f => TxnLog.isExternal(f.path))
    if (files.isEmpty) return
    // one sizing for every file of a column: aggregateByKey needs a
    // uniform zero, and the max row count bounds every file's key count
    val maxRows = files.flatMap(_.stats.map(_.numRecords)).reduceOption(_ max _)
      .getOrElse(1L << 20)
    val physSchema = ColumnMapping.physicalSchema(schema, mapping)
    val paths = files.map(f => TxnLog.dataPath(tablePath, f.path))
    import spark.implicits._
    val rows: Seq[(String, String, Int, Array[Byte])] = columns.flatMap { c =>
      val dt = schema(c).dataType
      require(dt == LongType || dt == StringType,
        s"bloom index supports LONG/STRING, '$c' is $dt")
      val phys = ColumnMapping.physicalName(c, mapping)
      val hashed = spark.read.option("basePath", tablePath)
        .schema(physSchema).parquet(paths: _*)
        .select(col("_metadata.file_name").as("fn"), col(phys).as("v"))
        .na.drop()
        .rdd.map { r =>
          val h = dt match {
            case LongType => r.getLong(1)
            case _ => SketchExprs.hash64(UTF8String.fromString(r.getString(1)))
          }
          r.getString(0) -> h
        }
      hashed.aggregateByKey(BloomFilterExprs.empty(maxRows, bitsPerKey))(
          { (b, h) => b.put(h); b }, { (a, b) => a.merge(b) })
        .collect() // one row per (file, column): bounded by |files|
        .map { case (fn, bloom) =>
          (fn, phys, bloom.k, longsToBytes(bloom.bits))
        }
    }
    rows.toDF("file_name", "column", "k", "bits")
      .coalesce(1)
      .write.mode("overwrite")
      .parquet(s"$tablePath/${dir(version)}")
  }

  /** Latest build's blooms: (file_name, physical column) → sketch.
    * Empty when no build exists.
    */
  def load(
      spark: SparkSession,
      tablePath: String): Map[(String, String), LongBloom] = {
    latestBuild(spark, tablePath) match {
      case None => Map.empty
      case Some(d) =>
        spark.read.parquet(s"$tablePath/$d").collect().map { r =>
          (r.getAs[String]("file_name"), r.getAs[String]("column")) ->
            new LongBloom(bytesToLongs(r.getAs[Array[Byte]]("bits")),
              r.getAs[Int]("k"))
        }.toMap
    }
  }

  /** Most recent `_bloom/bloom-<v>` directory, if any. */
  def latestBuild(spark: SparkSession, tablePath: String): Option[String] = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(tablePath, "_bloom")
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return None
    fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("bloom-")).sorted.lastOption
      .map(n => s"_bloom/$n")
  }

  /** Superseded build dirs (every build but the latest) — vacuum
    * reclaims these past the retention horizon.
    */
  def supersededBuilds(spark: SparkSession, tablePath: String): Seq[String] = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(tablePath, "_bloom")
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return Seq.empty
    val all = fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("bloom-")).sorted
    all.dropRight(1).map(n => s"_bloom/$n").toSeq
  }

  private[txn] def longsToBytes(ls: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(ls.length * 8)
    ls.foreach(bb.putLong)
    bb.array()
  }

  private[txn] def bytesToLongs(bs: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bs)
    Array.fill(bs.length / 8)(bb.getLong)
  }
}
