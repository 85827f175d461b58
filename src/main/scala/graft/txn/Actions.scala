package graft.txn

/** Transaction-log action ADT — the Delta-protocol-style log records the
  * reference consumes through delta-standalone (SURVEY.md §1.1; field set
  * per DeltaReader.java:202–208, 227–232, 237–243, 213–220). Serialized as
  * one JSON object per line, one file per commit version.
  */
sealed trait Action

/** Per-file column statistics for data skipping: row count plus
  * stringified min/max per top-level primitive column (long/double/
  * string shapes — the Delta stats idea). Readers parse them back by
  * the declared column type; a column absent from the maps is simply
  * not skippable.
  *
  * @param tight false when string/binary min/max may be TRUNCATED
  *        bounds rather than exact values: foreign-written parquet
  *        (arrow/parquet-rs, or parquet-mr with statistics truncation
  *        configured) registered by [[graft.txn.Convert]] truncates
  *        binary stats — min to a prefix (≤ the real min) and max to a
  *        truncated-and-INCREMENTED value not present in the data.
  *        Such bounds stay sound for file skipping (they only widen),
  *        but the stats-only MIN/MAX aggregate pushdown must refuse
  *        string columns of non-tight files or it returns values the
  *        data never held. Fixed-width numeric stats are exact either
  *        way (parquet has no truncation for them). Default keeps
  *        pre-flag logs and checkpoints reading as tight — correct,
  *        because graft's own writer never truncates.
  * @param nullCounts per-column null-row counts (Delta records these
  *        too): powers IS NULL / IS NOT NULL file pruning and the
  *        stats-only COUNT(col) aggregate answer. A column absent from
  *        the map is simply unknown (pre-feature logs, unsupported
  *        types) — readers must treat absence as "cannot prune".
  */
final case class FileStats(
    numRecords: Long,
    minValues: Map[String, String],
    maxValues: Map[String, String],
    tight: Boolean = true,
    nullCounts: Map[String, Long] = Map.empty)

/** A data file added to the table at some version.
  * @param partitionValues partition-column → value (empty for unpartitioned)
  * @param modificationTime epoch millis; becomes CDC event time for 'c' rows
  * @param dataChange false for reorganization (compaction) — CDC readers
  *                   skip such events; snapshot state still updates
  * @param stats optional footer-derived column stats for file skipping
  *              (with a DV attached, numRecords is an upper bound and
  *              min/max stay sound — deletion only narrows the file)
  * @param dv optional deletion-vector directory (table-relative): rows of
  *           this file listed there are logically deleted. A reader that
  *           ignores this field would resurrect them — which is why DV
  *           tables demand Protocol(2, _) (see TxnLog.SupportedReaderVersion)
  * @param baseRowId first stable row id of this file (the Delta row
  *           tracking idea): row i of the file has id `baseRowId + i`.
  *           Assigned once at commit from the table's monotonic
  *           high-water mark ([[CommitInfo.rowIdHighWater]]) and COPIED
  *           on every re-add of the same physical file (DV transitions,
  *           rebases), so an id names one physical row forever — stable
  *           under append and deletion-vector DELETE; a copy-on-write
  *           rewrite of the file mints fresh ids unless the rewrite
  *           materializes them. Default keeps pre-tracking logs readable
  *           (their rows read as NULL ids, never a wrong id).
  */
final case class AddFile(
    path: String,
    partitionValues: Map[String, String],
    size: Long,
    modificationTime: Long,
    dataChange: Boolean,
    stats: Option[FileStats] = None,
    dv: Option[String] = None,
    baseRowId: Option[Long] = None) extends Action

/** A data file logically removed (physically retained for CDC replay
  * until vacuumed).
  * @param deletionTimestamp epoch millis; CDC event time for 'r' rows
  * @param dataChange false for reorganization (compaction) — not a CDC
  *                   event (json4s default keeps pre-stats logs readable)
  */
final case class RemoveFile(
    path: String,
    deletionTimestamp: Long,
    partitionValues: Map[String, String],
    dataChange: Boolean = true) extends Action

/** Table metadata: schema (Spark StructType JSON) + partition columns.
  * A Metadata action inside a commit marks a schema change; CDC surfaces
  * it as an op='m' control row (reference: DeltaRecord.java:93–97).
  * @param constraints CHECK constraints — SQL boolean expressions every
  *        written row must satisfy (NULL passes, per SQL CHECK
  *        semantics). Optional with a default, so pre-constraint logs
  *        and checkpoints read unchanged.
  * @param columnMapping logical column name → PHYSICAL name (the name
  *        inside data files). Non-empty only after a metadata-only
  *        RENAME COLUMN (Delta column-mapping idea): files keep their
  *        creation-time field names forever; readers translate. Default
  *        keeps pre-mapping logs and checkpoints readable.
  * @param generatedColumns column → SQL expression (Delta generated
  *        columns): the write path computes the column when the writer
  *        omits it and REJECTS a writer-supplied value that disagrees,
  *        so a generated partition column (the common case — a date
  *        derived from a timestamp) is trustworthy for pruning.
  */
final case class Metadata(
    schemaJson: String,
    partitionColumns: Seq[String],
    constraints: Seq[String] = Seq.empty,
    columnMapping: Map[String, String] = Map.empty,
    generatedColumns: Map[String, String] = Map.empty,
    // SQL constraint NAMES (name → expression) for ALTER TABLE ADD/DROP
    // CONSTRAINT round-trips; enforcement always runs off `constraints`
    // (the expressions). Defaulted, so pre-naming logs read unchanged.
    constraintNames: Map[String, String] = Map.empty,
    // GENERATED ALWAYS AS IDENTITY columns: column → "start:step". The
    // WRITE PATH fills them (writer-supplied non-null values reject);
    // per-column allocation cursors ride CommitInfo.identityHighWater.
    // Defaulted, so pre-identity logs and checkpoints read unchanged.
    identityColumns: Map[String, String] = Map.empty,
    // Declared clustering columns (the Delta liquid-clustering surface):
    // OPTIMIZE with no explicit layout arguments clusters by THESE —
    // set once, every compaction maintains the layout. First entry may
    // carry the "hilbert:" curve prefix. Defaulted, so pre-clustering
    // logs and checkpoints read unchanged.
    clusterBy: Seq[String] = Seq.empty,
    // TABLE PROPERTIES (Delta's TBLPROPERTIES): free-form key → value
    // riding the Metadata, so SET/UNSET is one metadata commit and the
    // values time-travel with the schema. Keys under `graft.` configure
    // engine behavior (e.g. graft.autoCompact.* takes precedence over
    // the session conf); everything else is user storage surfaced by
    // SHOW TBLPROPERTIES. Defaulted, so pre-properties logs read
    // unchanged.
    properties: Map[String, String] = Map.empty) extends Action

/** Commit provenance; `timestamp` drives timestamp-as-of time travel.
  * @param rowIdHighWater the first UNUSED stable row id after this
  *        commit — the allocation cursor for [[AddFile.baseRowId]].
  *        Persisted (not recomputed from live files) so ids of deleted
  *        files are never reused. Defaulted for pre-tracking logs.
  * @param identityHighWater per-identity-column NEXT value after this
  *        commit's allocation — the claim record concurrent appends
  *        conflict on (two writers allocating from the same cursor
  *        would mint duplicate identity values; the loser must fail,
  *        not rebase). Defaulted for pre-identity logs.
  */
final case class CommitInfo(
    operation: String,
    timestamp: Long,
    rowIdHighWater: Option[Long] = None,
    identityHighWater: Option[Map[String, Long]] = None) extends Action

/** A change-data sidecar file (the Delta AddCDCFile idea): exact row-level
  * change records for ONE commit, written by DML paths (MERGE / UPDATE /
  * DELETE — copy-on-write and deletion-vector alike) when the table
  * property `graft.enableChangeDataFeed` is true. The file carries every
  * table column (partition columns materialized as regular columns, under
  * LOGICAL names as of the writing commit) plus `_change_type` ∈
  * {insert, update_preimage, update_postimage, delete}.
  *
  * Never part of table state: snapshot replay ignores these lines, and
  * readers of the table never open the files — only
  * [[ChangeDataFeed.tableChanges]] does. Vacuum protects a change file
  * while its commit is still in the log; once [[TxnLog.expireLog]] drops
  * the commit, the file ages out through the orphan sweep.
  */
final case class CdcFile(
    path: String,
    partitionValues: Map[String, String],
    size: Long,
    // commit wall-clock, stamped when the action folds into a CHECKPOINT
    // (commit files leave it None — the CommitInfo on the same line set
    // carries the time there): checkpoints expire cdc references by age,
    // and the reference needs a clock that rides the row. Defaulted, so
    // pre-field logs and checkpoints read unchanged.
    commitTimestamp: Option[Long] = None) extends Action

/** Forward-compatibility guard (the Delta protocol action): a reader
  * whose supported version is below `minReaderVersion` must REFUSE the
  * table — failing loudly beats silently misreading actions written by
  * a newer engine.
  */
final case class Protocol(
    minReaderVersion: Int,
    minWriterVersion: Int) extends Action

/** Application-scoped idempotence marker (Delta's SetTransaction /
  * "txn" action): records that application `appId` has applied its
  * state up to `version`, IN THE SAME COMMIT as the data it wrote — so
  * "did this batch already land?" is answered from the snapshot, and a
  * retried ingest (COPY INTO, a replayed streaming epoch) skips instead
  * of duplicating. The snapshot keeps the LATEST version per appId.
  */
final case class SetTxn(
    appId: String,
    version: Long,
    lastUpdated: Long) extends Action

/** One JSON line of a commit file — exactly one field is set. */
final case class LogLine(
    add: Option[AddFile] = None,
    remove: Option[RemoveFile] = None,
    metaData: Option[Metadata] = None,
    commitInfo: Option[CommitInfo] = None,
    protocol: Option[Protocol] = None,
    txn: Option[SetTxn] = None,
    cdc: Option[CdcFile] = None) {
  def action: Action =
    add.orElse[Action](remove).orElse(metaData).orElse(commitInfo)
      .orElse(protocol).orElse(txn).orElse(cdc)
      .getOrElse(throw new IllegalArgumentException("empty log line"))
}

object LogLine {
  def apply(a: Action): LogLine = a match {
    case x: AddFile    => LogLine(add = Some(x))
    case x: RemoveFile => LogLine(remove = Some(x))
    case x: Metadata   => LogLine(metaData = Some(x))
    case x: CommitInfo => LogLine(commitInfo = Some(x))
    case x: Protocol   => LogLine(protocol = Some(x))
    case x: SetTxn     => LogLine(txn = Some(x))
    case x: CdcFile    => LogLine(cdc = Some(x))
  }
}
