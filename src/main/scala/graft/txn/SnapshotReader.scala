package graft.txn

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch snapshot reads with time travel — versionAsOf / timestampAsOf
  * (reference semantics: DeltaReader.java:148–164 / 134–146, made strict:
  * a missing version/timestamp is an error, not a silent fallback to
  * latest). The scan itself is a plain vectorized parquet read over the
  * snapshot's file list with hive partition-column inference via basePath,
  * so Catalyst pruning/pushdown applies untouched.
  */
object SnapshotReader {

  def read(
      spark: SparkSession,
      tablePath: String,
      versionAsOf: Option[Long] = None,
      timestampAsOf: Option[Long] = None): DataFrame = {
    require(versionAsOf.isEmpty || timestampAsOf.isEmpty,
      "versionAsOf and timestampAsOf are mutually exclusive") // cfg XOR, DeltaLakeConnectorConfig.java:65–70
    val log = new TxnLog(tablePath, spark.sessionState.newHadoopConf())
    val version = versionAsOf
      .orElse(timestampAsOf.map(log.versionAtTimestamp))
      .getOrElse(log.latestVersion().getOrElse(
        throw new IllegalArgumentException(s"empty table at $tablePath")))
    val snap = log.snapshot(version)
    if (snap.files.isEmpty) {
      // valid but empty snapshot: produce an empty frame with the schema
      val schema = snap.metadata.map(m =>
        org.apache.spark.sql.types.DataType.fromJson(m.schemaJson)
          .asInstanceOf[org.apache.spark.sql.types.StructType])
        .getOrElse(org.apache.spark.sql.types.StructType(Nil))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else {
      // read with the DECLARED schema as of this version (not whatever
      // file Spark samples): after a schema-change commit, files written
      // earlier surface the added columns as null (Delta semantics).
      // Deletion vectors apply inside (DV-free tables take a plain scan);
      // column mapping (RENAME COLUMN) translates at the file boundary.
      DeletionVectors.readFiles(spark, tablePath, snap.files,
        snap.metadata.map(m =>
          org.apache.spark.sql.types.DataType.fromJson(m.schemaJson)
            .asInstanceOf[org.apache.spark.sql.types.StructType]),
        withRowMeta = false,
        mapping = snap.metadata.map(_.columnMapping).getOrElse(Map.empty))
    }
  }
}
