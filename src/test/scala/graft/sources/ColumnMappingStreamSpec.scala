package graft.sources

import graft.Tables
import graft.txn.TableWriter
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The DSv2 streaming source on a column-mapped (renamed) table: the
  * per-file reader resolves parquet fields by name, so partitions must
  * carry the PHYSICAL schema — a mapping-blind plan would silently
  * surface every renamed column as null (the schema-evolution fallback).
  */
class ColumnMappingStreamSpec extends AnyFunSuite {
  import graft.SparkTestSession._

  test("streaming source reads renamed tables (physical at the file)") {
    val table = Files.createTempDirectory("colmap_stream").toString + "/t"
    val li = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      .filter(col("l_orderkey") % 7 === 0)
    TableWriter.write(spark, li, table, version = 0L, commitTs = 1000L)
    TableWriter.renameColumn(spark, table, "l_quantity", "qty",
      version = 1L, commitTs = 2000L)
    val schema = GraftCdc.envelopeSchema(
      GraftCdc.declaredSchema(table, spark.sessionState.newHadoopConf()))
    assert(schema.fieldNames.contains("qty"))
    val stream = new GraftCdcMicroBatchStream(schema,
      Map("tablePath" -> table, "startingVersion" -> "0",
        "includeHistory" -> "true"))
    val start = stream.initialOffset()
    val end = stream.latestOffset(start,
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
    val parts = stream.planInputPartitions(start, end)
    val rf = stream.createReaderFactory()
    val qtyIdx = schema.fieldIndex("qty")
    var rows = 0L
    var nullQty = 0L
    parts.foreach { p =>
      val r = rf.createReader(p)
      try while (r.next()) {
        val row = r.get()
        if (row.getUTF8String(0).toString != "m") {
          rows += 1
          if (row.isNullAt(qtyIdx)) nullQty += 1
        }
      } finally r.close()
    }
    assert(rows > 0)
    assert(nullQty == 0, s"$nullQty/$rows rows lost qty through the mapping")
  }
}
