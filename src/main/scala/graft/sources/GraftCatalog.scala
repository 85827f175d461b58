package graft.sources

import graft.txn._
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util
import scala.jdk.CollectionConverters._

/** DataSource V2 `TableCatalog`: graft tables as first-class SQL
  * citizens. Configure once —
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
  * spark.conf.set("spark.sql.catalog.graft.warehouse", "/data/warehouse")
  * }}}
  *
  * — then `CREATE TABLE graft.ns.t (...) PARTITIONED BY (c)`,
  * `INSERT INTO graft.ns.t ...`, `INSERT OVERWRITE graft.ns.t ...`,
  * `SELECT ... FROM graft.ns.t` (with the batch source's file pruning /
  * column pruning / aggregate pushdown), `DROP TABLE`, `SHOW TABLES`.
  * A table is the directory `<warehouse>/<ns...>/<name>` with its
  * transaction log; CREATE is one metadata-only commit (v0), and every
  * write goes through the TableWriter path — constraints, generated
  * columns, footer stats, schema enforcement, and commit rebase all
  * apply to SQL writers for free.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"spark.sql.catalog.$name.warehouse is required"))
  }

  override def name(): String = catalogName

  private def spark = org.apache.spark.sql.SparkSession.active
  private def conf = spark.sessionState.newHadoopConf()
  private def fs = new Path(warehouse).getFileSystem(conf)

  private def tableDir(ident: Identifier): String =
    (ident.namespace() :+ ident.name())
      .foldLeft(new Path(warehouse)) { (p, part) => new Path(p, part) }
      .toString

  private def isTableDir(p: Path): Boolean =
    fs.exists(new Path(p, "_txn_log"))

  override def defaultNamespace(): Array[String] = Array("default")

  // ------ tables ------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val nsDir = namespace.foldLeft(new Path(warehouse))(new Path(_, _))
    if (!fs.exists(nsDir)) throw noNamespace(namespace)
    fs.listStatus(nsDir).filter(_.isDirectory)
      .filter(st => isTableDir(st.getPath))
      .map(st => Identifier.of(namespace, st.getPath.getName))
  }

  override def tableExists(ident: Identifier): Boolean =
    isTableDir(new Path(tableDir(ident)))

  override def loadTable(ident: Identifier): Table = {
    val dir = tableDir(ident)
    if (!isTableDir(new Path(dir)))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    val resolved = GraftBatch.resolve(Map("tablePath" -> dir))
    new GraftBatchTable(resolved.schema,
      Map("tablePath" -> dir),
      partitionColumns = resolved.partitionColumns)
  }

  /** SQL time travel: `SELECT ... FROM gcat.ns.t VERSION AS OF 3`. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = tableDir(ident)
    if (!isTableDir(new Path(dir)))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"VERSION AS OF expects a commit version number, got '$version'")
    }
    val resolved = GraftBatch.resolve(
      Map("tablePath" -> dir, "versionAsOf" -> v.toString))
    new GraftBatchTable(resolved.schema,
      Map("tablePath" -> dir, "versionAsOf" -> v.toString),
      partitionColumns = resolved.partitionColumns)
  }

  /** SQL time travel: `... TIMESTAMP AS OF '2024-01-01T00:00:00Z'`
    * (micros since epoch arrive from Spark's analyzer).
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val dir = tableDir(ident)
    if (!isTableDir(new Path(dir)))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    // Spark hands micros; the log's commit timestamps are millis
    val ms = timestamp / 1000L
    val resolved = GraftBatch.resolve(
      Map("tablePath" -> dir, "timestampAsOf" -> ms.toString))
    new GraftBatchTable(resolved.schema,
      Map("tablePath" -> dir, "timestampAsOf" -> ms.toString),
      partitionColumns = resolved.partitionColumns)
  }

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val dir = tableDir(ident)
    if (isTableDir(new Path(dir)))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(ident)
    val partCols = partitions.map {
      case t if t.name == "identity" && t.references().length == 1 =>
        t.references()(0).fieldNames.mkString(".")
      case other => throw new UnsupportedOperationException(
        s"graft tables support identity partitioning only, got $other")
    }.toSeq
    partCols.foreach(c => require(schema.fieldNames.contains(c),
      s"partition column $c not in schema"))
    // CREATE TABLE = one metadata-only commit (v0): schema + partition
    // spec exist before any data file does
    val log = new TxnLog(dir, conf)
    log.commit(0L, Seq(
      Metadata(schema.json, partCols),
      CommitInfo("CREATE TABLE", System.currentTimeMillis())))
    new GraftBatchTable(schema, Map("tablePath" -> dir),
      partitionColumns = partCols)
  }

  /** SQL ALTER TABLE mapped onto the engine's evolution commits:
    * ADD COLUMNS = a schema-evolution Metadata commit (pre-evolution
    * files surface the column as null, so the column must be nullable);
    * RENAME COLUMN = the metadata-only column-mapping rename. Anything
    * else (drops, type changes, repositioning, properties) refuses
    * loudly — refusal beats silently wrong table state.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = tableDir(ident)
    if (!isTableDir(new Path(dir)))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    changes.foreach {
      case ac: TableChange.AddColumn =>
        require(ac.fieldNames().length == 1,
          "nested ADD COLUMN is not supported")
        require(ac.isNullable,
          "an added column must be nullable: files written before the " +
            "evolution surface it as null")
        require(ac.position() == null,
          "ADD COLUMN ... FIRST/AFTER is not supported (columns append)")
        val log = new TxnLog(dir, conf)
        val snap = log.snapshotLatest()
        TxnLog.assertWritable(snap, dir)
        val m = snap.metadata.getOrElse(throw new IllegalStateException(
          s"no table metadata at $dir"))
        val schema = org.apache.spark.sql.types.DataType.fromJson(m.schemaJson)
          .asInstanceOf[StructType]
        val colName = ac.fieldNames().head
        require(!schema.fieldNames.contains(colName),
          s"column '$colName' already exists")
        val evolved = schema.add(
          org.apache.spark.sql.types.StructField(colName, ac.dataType(),
            nullable = true))
        log.commit(snap.version + 1, Seq(
          m.copy(schemaJson = evolved.json),
          CommitInfo("ALTER TABLE ADD COLUMN", System.currentTimeMillis())))
      case rc: TableChange.RenameColumn =>
        require(rc.fieldNames().length == 1,
          "nested RENAME COLUMN is not supported")
        TableWriter.renameColumn(spark, dir, rc.fieldNames().head,
          rc.newName(),
          version = new TxnLog(dir, conf).latestVersion().getOrElse(
            throw new IllegalStateException(s"no table at $dir")) + 1,
          commitTs = System.currentTimeMillis())
      case other =>
        throw new UnsupportedOperationException(
          s"ALTER TABLE change $other is not supported (supported: ADD " +
            "COLUMNS of nullable top-level columns, RENAME COLUMN)")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = new Path(tableDir(ident))
    if (!isTableDir(dir)) false
    else fs.delete(dir, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val src = new Path(tableDir(oldIdent))
    if (!isTableDir(src))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(oldIdent)
    val dst = new Path(tableDir(newIdent))
    if (isTableDir(dst))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(newIdent)
    fs.mkdirs(dst.getParent)
    if (!fs.rename(src, dst))
      throw new IllegalStateException(s"rename failed: $src -> $dst")
  }

  // ------ namespaces (directories under the warehouse) ------

  private def noNamespace(ns: Array[String]) =
    new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(ns)

  override def listNamespaces(): Array[Array[String]] = {
    val root = new Path(warehouse)
    if (!fs.exists(root)) return Array.empty
    fs.listStatus(root).filter(_.isDirectory)
      .filterNot(st => isTableDir(st.getPath))
      .map(st => Array(st.getPath.getName))
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw noNamespace(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean = {
    val p = namespace.foldLeft(new Path(warehouse))(new Path(_, _))
    fs.exists(p) && !isTableDir(p)
  }

  override def loadNamespaceMetadata(
      namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace)) util.Collections.emptyMap()
    else throw noNamespace(namespace)

  override def createNamespace(
      namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    val p = namespace.foldLeft(new Path(warehouse))(new Path(_, _))
    if (fs.exists(p))
      throw new org.apache.spark.sql.catalyst.analysis
        .NamespaceAlreadyExistsException(namespace)
    fs.mkdirs(p)
  }

  override def alterNamespace(
      namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ALTER NAMESPACE not supported")

  override def dropNamespace(
      namespace: Array[String], cascade: Boolean): Boolean = {
    val p = namespace.foldLeft(new Path(warehouse))(new Path(_, _))
    if (!fs.exists(p)) false
    else {
      if (!cascade && fs.listStatus(p).nonEmpty)
        throw new IllegalStateException(
          s"namespace ${namespace.mkString(".")} is not empty")
      fs.delete(p, true)
    }
  }
}
