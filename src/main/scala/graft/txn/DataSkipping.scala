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
      // hive-partitioned generations carry the column as a dir value,
      // not footer stats: a partition value is a min==max range, so the
      // same overlap test applies (null partitions always kept — sound)
      val partRange = f.partitionValues.get(column)
        .filter(_ != "__HIVE_DEFAULT_PARTITION__").map(v => (v, v))
      f.stats.flatMap(st =>
        st.minValues.get(column).zip(st.maxValues.get(column)))
        .orElse(partRange) match {
        case None => true
        case Some((mn, mx)) => dt match {
          case LongType | IntegerType | DoubleType | FloatType | ShortType |
              // temporal stats are physical numbers: DATE = days (INT32),
              // TIMESTAMP = micros (INT64, the TableWriter contract) —
              // pass lo/hi in those units
              DateType | TimestampType | TimestampNTZType =>
            // doubles cover the exact-integer range these tables use;
            // an unparseable bound (e.g. a hive-encoded '2024-01-01'
            // partition date vs numeric day stats) keeps the file —
            // pruning must stay sound over representation drift
            try !(num(mx) < num(lo.toString) || num(mn) > num(hi.toString))
            catch { case _: NumberFormatException => true }
          case StringType =>
            // UTF-8 byte order, matching UTF8String comparison semantics
            // and the writer's footerStats combine (TableWriter) — Java's
            // UTF-16 code-unit order disagrees for supplementary chars
            def cmp(a: String, b: String): Int =
              org.apache.spark.unsafe.types.UTF8String.fromString(a)
                .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))
            !(cmp(mx, lo.toString) < 0 || cmp(mn, hi.toString) > 0)
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

  /** Derive stats-prunable (column, lo, hi) ranges from a RESOLVED
    * predicate expression: conjunctions of =, <, <=, >, >= between a
    * column and a literal (either side). Anything else contributes no
    * range and is handled by the residual filter — pruning is always
    * sound, never complete.
    */
  private[graft] def rangesOf(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      schema: StructType): Seq[(String, Any, Any)] = {
    import org.apache.spark.sql.catalyst.expressions._
    def lift(v: Any): Any = v match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => other
    }
    def nonStr(v: Any): Boolean = !lift(v).isInstanceOf[String]
    // unbounded ends use huge sentinels; the numeric compare parses them
    val NegInf = Double.MinValue
    val PosInf = Double.MaxValue
    e match {
      case And(l, r) => rangesOf(l, schema) ++ rangesOf(r, schema)
      case EqualTo(a: AttributeReference, Literal(v, _)) =>
        Seq((a.name, lift(v), lift(v)))
      case EqualTo(Literal(v, _), a: AttributeReference) =>
        Seq((a.name, lift(v), lift(v)))
      case GreaterThan(a: AttributeReference, Literal(v, _)) if nonStr(v) =>
        Seq((a.name, lift(v), PosInf))
      case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) if nonStr(v) =>
        Seq((a.name, lift(v), PosInf))
      case LessThan(a: AttributeReference, Literal(v, _)) if nonStr(v) =>
        Seq((a.name, NegInf, lift(v)))
      case LessThanOrEqual(a: AttributeReference, Literal(v, _)) if nonStr(v) =>
        Seq((a.name, NegInf, lift(v)))
      case GreaterThan(Literal(v, _), a: AttributeReference) if nonStr(v) =>
        Seq((a.name, NegInf, lift(v)))
      case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) if nonStr(v) =>
        Seq((a.name, NegInf, lift(v)))
      case LessThan(Literal(v, _), a: AttributeReference) if nonStr(v) =>
        Seq((a.name, lift(v), PosInf))
      case LessThanOrEqual(Literal(v, _), a: AttributeReference) if nonStr(v) =>
        Seq((a.name, lift(v), PosInf))
      case _ => Seq.empty
    }
  }

  /** The predicate resolved against the table schema (Spark 4 Columns
    * are lazy ColumnNode trees; analyzing a Filter over an empty frame
    * yields real catalyst nodes with typed literals — UTF8String,
    * date-days, timestamp-micros — exactly the units the stats use).
    */
  private def resolvedCondition(
      spark: SparkSession,
      schema: StructType,
      pred: org.apache.spark.sql.Column)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    empty.filter(pred).queryExecution.analyzed.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
    }.getOrElse(org.apache.spark.sql.catalyst.expressions.Literal.TrueLiteral)
  }

  /** The files a predicate's derivable ranges keep — the planning half
    * of [[readWhere]], exposed for tests/observability.
    */
  private[graft] def filesFor(
      spark: SparkSession,
      tablePath: String,
      pred: org.apache.spark.sql.Column)
      : (Seq[AddFile], StructType, Map[String, String]) = {
    val log = new TxnLog(tablePath, spark.sessionState.newHadoopConf())
    val snap = log.snapshotLatest()
    val schema = snap.metadata.map(m =>
      DataType.fromJson(m.schemaJson).asInstanceOf[StructType])
      .getOrElse(throw new IllegalArgumentException(s"no schema at $tablePath"))
    val mapping = snap.metadata.map(_.columnMapping).getOrElse(Map.empty)
    // ranges are keyed by the predicate's LOGICAL names; file stats are
    // keyed by the footer's PHYSICAL names — translate before pruning
    val ranges = rangesOf(resolvedCondition(spark, schema, pred), schema)
      .map { case (c, lo, hi) =>
        (ColumnMapping.physicalName(c, mapping), lo, hi)
      }
    val physSchema = ColumnMapping.physicalSchema(schema, mapping)
    val statsKept = pruneFilesAll(snap.files, physSchema, ranges)
    // point probes (lo == hi) additionally consult the per-file bloom
    // index — the only file-level signal with power on high-cardinality
    // keys whose min/max spans every file. Soundness: files or columns
    // without a bloom row are kept.
    val points = ranges.filter { case (_, lo, hi) => lo == hi }
    val kept =
      if (points.isEmpty) statsKept
      else {
        // bloom evaluation runs in tasks over the sidecar; only DROPPED
        // file names come back to the driver
        val terms = points.flatMap { case (c, lo, _) =>
          BloomIndex.probeHash(physSchema(c).dataType, lo)
            .map(h => (c, Seq(h)))
        }
        val dropped = BloomIndex.prunedFiles(spark, tablePath, terms)
        if (dropped.isEmpty) statsKept
        else statsKept.filterNot(f =>
          dropped.contains(new org.apache.hadoop.fs.Path(f.path).getName))
      }
    (kept, schema, mapping)
  }

  /** Snapshot read with AUTOMATIC stats pruning: the ranges are derived
    * from the predicate itself, then the full predicate applies as the
    * residual filter (and still pushes into the scan).
    */
  def readWhere(
      spark: SparkSession,
      tablePath: String,
      pred: org.apache.spark.sql.Column): DataFrame = {
    val (kept, schema, mapping) = filesFor(spark, tablePath, pred)
    if (kept.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .filter(pred)
    DeletionVectors.readFiles(spark, tablePath, kept, Some(schema),
        mapping = mapping)
      .filter(pred)
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
    val mapping = snap.metadata.map(_.columnMapping).getOrElse(Map.empty)
    val dt = schema(column).dataType
    // stats keys are physical (footer-derived); `column` is logical
    val kept = pruneFiles(snap.files, dt,
      ColumnMapping.physicalName(column, mapping), lo, hi)
    if (kept.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .filter(col(column) >= lo && col(column) <= hi)
    DeletionVectors.readFiles(spark, tablePath, kept, Some(schema),
        mapping = mapping)
      .filter(col(column) >= lo && col(column) <= hi)
  }
}
