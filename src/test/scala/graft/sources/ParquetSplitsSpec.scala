package graft.sources

import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.scalatest.funsuite.AnyFunSuite

/** Byte-range split arithmetic, property-pinned: for a parquet file with
  * many small row groups and EVERY split budget in a sweep, the ranges
  * must partition the file's rows EXHAUSTIVELY and DISJOINTLY (the
  * concatenation of per-range reads is exactly the whole file), and
  * `rowsBefore(rangeStart)` must equal the cumulative row count of the
  * ranges before it — the invariant that keeps deletion-vector positions
  * and base+position row ids file-absolute across splits. Because
  * rowsBefore is DERIVED from parquet-mr's own range filter, this spec
  * is the tripwire for any future parquet upgrade changing the rule.
  */
class ParquetSplitsSpec extends AnyFunSuite {
  import graft.SparkTestSession._

  private lazy val (file, conf, total) = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val hc = spark.sparkContext.hadoopConfiguration
    val prev = hc.get("parquet.block.size")
    val dir = java.nio.file.Files.createTempDirectory("splitprop").toString
    try {
      hc.setInt("parquet.block.size", 8 * 1024)
      (0L until 20000L).map(i => (i, i * 3)).toDF("id", "v")
        .coalesce(1).sortWithinPartitions(col("id"))
        .write.mode("overwrite").parquet(dir)
    } finally {
      if (prev == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", prev)
    }
    val c = spark.sessionState.newHadoopConf()
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
    (f, c, 20000L)
  }

  private def readIds(rangeStart: Long, rangeEnd: Long): Seq[Long] = {
    val b = ParquetReader.builder(new GroupReadSupport(),
      new org.apache.hadoop.fs.Path(file)).withConf(conf)
    val r = (if (ParquetSplits.isSplit(rangeStart, rangeEnd))
      b.withFileRange(rangeStart, rangeEnd) else b).build()
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    var g: Group = null
    try while ({ g = r.read(); g != null }) buf += g.getLong(0, 0)
    finally r.close()
    buf.toSeq
  }

  test("ranges partition rows exhaustively/disjointly and rowsBefore " +
      "matches the cumulative prefix for every budget in a sweep") {
    val size = new java.io.File(file).length()
    val whole = readIds(0L, Long.MaxValue)
    assert(whole.size.toLong == total)
    // budgets from "many tiny splits" to "one split covers all"
    Seq(6 * 1024L, 16 * 1024L, 50 * 1024L, size - 1, size, size + 1)
      .foreach { budget =>
        val ranges = ParquetSplits.ranges(size, budget)
        if (budget >= size) assert(ranges == Seq(ParquetSplits.WholeFile))
        var cum = 0L
        val got = ranges.flatMap { case (rs, re) =>
          assert(ParquetSplits.rowsBefore(file, conf, rs) == cum,
            s"budget=$budget rangeStart=$rs: rowsBefore != cumulative")
          val ids = readIds(rs, re)
          cum += ids.size
          ids
        }
        // exhaustive + disjoint + ORDERED: concatenation IS the file
        assert(got == whole, s"budget=$budget: split union != whole file")
      }
  }
}
