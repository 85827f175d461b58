package graft.txn

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** File-level data skipping over AddFile footer stats (the Delta stats
  * idea): a range predicate prunes the snapshot's file LIST before Spark
  * ever opens a file, complementing the row-group pruning the parquet
  * reader does once a file is open. At 100 TB this is the difference
  * between listing a thousand files and scanning them.
  */
object DataSkipping {

  /** Files whose [min, max] on `column` may overlap [lo, hi]; files
    * without usable stats are conservatively kept.
    */
  def pruneFiles(
      files: Seq[AddFile],
      dt: DataType,
      column: String,
      lo: Any,
      hi: Any): Seq[AddFile] = {
    def num(s: String): Double = s.toDouble
    files.filter { f =>
      f.stats.flatMap(st =>
        st.minValues.get(column).zip(st.maxValues.get(column))) match {
        case None => true
        case Some((mn, mx)) => dt match {
          case LongType | IntegerType | DoubleType | FloatType | ShortType |
              // temporal stats are physical numbers: DATE = days (INT32),
              // TIMESTAMP = micros (INT64, the TableWriter contract) —
              // pass lo/hi in those units
              DateType | TimestampType | TimestampNTZType =>
            // doubles cover the exact-integer range these tables use
            !(num(mx) < num(lo.toString) || num(mn) > num(hi.toString))
          case StringType =>
            !(mx < lo.toString || mn > hi.toString)
          case _ => true
        }
      }
    }
  }

  /** Conjunctive pruning: a file survives only if every range may
    * overlap — the multi-dimension form (e.g. key range AND time range).
    */
  def pruneFilesAll(
      files: Seq[AddFile],
      schema: StructType,
      preds: Seq[(String, Any, Any)]): Seq[AddFile] =
    preds.foldLeft(files) { case (fs, (c, lo, hi)) =>
      pruneFiles(fs, schema(c).dataType, c, lo, hi)
    }

  /** Snapshot read with stats-based file pruning + the residual row
    * filter (pruning is file-granular; the filter is still applied and
    * still pushes down into the scan for row-group skipping).
    */
  def readRange(
      spark: SparkSession,
      tablePath: String,
      column: String,
      lo: Any,
      hi: Any): DataFrame = {
    val log = new TxnLog(tablePath, spark.sessionState.newHadoopConf())
    val snap = log.snapshotLatest()
    val schema = snap.metadata.map(m =>
      DataType.fromJson(m.schemaJson).asInstanceOf[StructType])
      .getOrElse(throw new IllegalArgumentException(s"no schema at $tablePath"))
    val dt = schema(column).dataType
    val kept = pruneFiles(snap.files, dt, column, lo, hi)
    if (kept.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .filter(col(column) >= lo && col(column) <= hi)
    spark.read
      .option("basePath", tablePath)
      .parquet(kept.map(f => s"$tablePath/${f.path}"): _*)
      .filter(col(column) >= lo && col(column) <= hi)
  }
}
