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
    // each file's bloom is sized by ITS OWN row count (footer stats) —
    // a uniform largest-file sizing would put hundreds of GB of mostly-
    // empty bloom bytes on disk for a skewed 100k-file table
    val sizeByFile: Map[String, Long] = files.map { f =>
      new Path(f.path).getName ->
        f.stats.map(_.numRecords).getOrElse(1L << 20)
    }.toMap
    val bSizes = spark.sparkContext.broadcast(sizeByFile)
    val bpk = bitsPerKey
    val physSchema = ColumnMapping.physicalSchema(schema, mapping)
    val paths = files.map(f => TxnLog.dataPath(tablePath, f.path))
    import spark.implicits._
    val perCol = columns.map { c =>
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
      // the key rides inside the value so the first-seen combiner can
      // size the bloom for ITS file (aggregateByKey's seqOp never sees
      // the key); merges only ever pair same-file (= same-size) blooms
      hashed.map { case (fn, h) => (fn, (fn, h)) }
        .aggregateByKey(null: LongBloom)(
          { (b, v) =>
            val bb = if (b != null) b
              else BloomFilterExprs.empty(
                math.max(1L, bSizes.value.getOrElse(v._1, 1L << 20)), bpk)
            bb.put(v._2); bb
          },
          { (a, b) =>
            if (a == null) b else if (b == null) a else a.merge(b) })
        .map { case (fn, bloom) =>
          (fn, phys, bloom.k, longsToBytes(bloom.bits))
        }
    }
    // EXECUTOR-side write, never a driver collect: the sidecar lands
    // straight from the aggregation tasks; file count scales with the
    // row count (one row per (file, column))
    val outParts = math.max(1,
      math.min(256, files.size * columns.size / 1000 + 1))
    spark.sparkContext.union(perCol)
      .toDF("file_name", "column", "k", "bits")
      .repartition(outParts)
      .write.mode("overwrite")
      .parquet(s"$tablePath/${dir(version)}")
  }

  /** File names DROPPED by the given point probes, evaluated where the
    * blooms live — inside tasks over the sidecar parquet (filter
    * pushdown prunes to the probed columns); the driver only ever holds
    * file NAMES, never bloom bytes. Each term is (physical column,
    * candidate hashes): a file is dropped when some term's bloom row
    * says NO candidate might be contained. Files or columns without a
    * bloom row are never dropped (soundness).
    */
  def prunedFiles(
      spark: SparkSession,
      tablePath: String,
      terms: Seq[(String, Seq[Long])]): Set[String] = {
    val ts = terms.filter(_._2.nonEmpty)
    if (ts.isEmpty) return Set.empty
    latestBuild(spark, tablePath) match {
      case None => Set.empty
      case Some(d) =>
        // AND across terms, so SAME-column terms stay separate probes
        val termsByCol: Map[String, Seq[Seq[Long]]] =
          ts.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
        val bTerms = spark.sparkContext.broadcast(termsByCol)
        import spark.implicits._
        spark.read.parquet(s"$tablePath/$d")
          .filter(col("column").isin(termsByCol.keys.toSeq: _*))
          .select(col("file_name"), col("column"), col("k"), col("bits"))
          .as[(String, String, Int, Array[Byte])]
          .flatMap { case (fn, c, k, bits) =>
            bTerms.value.get(c).flatMap { probes =>
              val b = new LongBloom(bytesToLongs(bits), k)
              if (probes.exists(hs => !hs.exists(b.mightContain))) Some(fn)
              else None
            }
          }
          .distinct().collect().toSet
    }
  }

  /** Latest build's blooms: (file_name, physical column) → sketch.
    * INTROSPECTION/SPEC surface only — materializes every bloom on the
    * driver, which the prune path ([[prunedFiles]]) deliberately never
    * does. Empty when no build exists.
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
