package graft.txn

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** Logical↔physical column-name translation for metadata-only RENAME
  * COLUMN (the Delta column-mapping idea, name mode): data files keep
  * their creation-time field names forever; `Metadata.columnMapping`
  * records logical → physical, and every reader/writer translates at the
  * file boundary. Renaming a 100 TB table is one JSON commit.
  *
  * Only top-level columns map (nested-field rename is out of scope), and
  * [[TableWriter.renameColumn]] refuses names that would make the
  * translation ambiguous (a new logical name colliding with another
  * column's logical or physical name), so the per-column renames below
  * cannot interfere with each other.
  */
object ColumnMapping {

  /** The schema as data files spell it. */
  def physicalSchema(logical: StructType, mapping: Map[String, String]): StructType =
    if (mapping.isEmpty) logical
    else StructType(logical.fields.map(f =>
      f.copy(name = mapping.getOrElse(f.name, f.name))))

  /** Rename a frame read with physical names back to logical. */
  def toLogical(df: DataFrame, mapping: Map[String, String]): DataFrame =
    mapping.foldLeft(df) { case (d, (logical, physical)) =>
      if (logical == physical) d else d.withColumnRenamed(physical, logical)
    }

  /** Rename a logical frame to physical names for a file write. */
  def toPhysical(df: DataFrame, mapping: Map[String, String]): DataFrame =
    mapping.foldLeft(df) { case (d, (logical, physical)) =>
      if (logical == physical) d else d.withColumnRenamed(logical, physical)
    }

  /** The stats/footer key for a logical column. */
  def physicalName(column: String, mapping: Map[String, String]): String =
    mapping.getOrElse(column, column)
}
