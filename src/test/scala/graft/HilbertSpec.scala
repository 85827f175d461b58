package graft

import graft.txn._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Hilbert clustering: the index is a TRUE Hilbert curve (every
  * consecutive pair of codes is a Manhattan-distance-1 step — the
  * locality property Morton lacks), it beats Morton on range-query file
  * hits on a uniform grid, and a `hilbert:`-prefixed OPTIMIZE rewrite
  * preserves content.
  */
class HilbertSpec extends AnyFunSuite {
  import SparkTestSession._

  private def inverse(bits: Int, dims: Int): Array[Array[Long]] = {
    val side = 1 << bits
    val cells = math.pow(side.toDouble, dims.toDouble).toInt
    val out = Array.ofDim[Array[Long]](cells)
    def walk(prefix: List[Long], d: Int): Unit =
      if (d == dims) {
        val coords = prefix.reverse.toArray
        out(ZOrder.hilbertIndex(bits, coords).toInt) = coords
      } else (0 until side).foreach(v => walk(v.toLong :: prefix, d + 1))
    walk(Nil, 0)
    out
  }

  test("2D: consecutive indices are Manhattan-1 neighbors, all cells covered") {
    val cells = inverse(bits = 4, dims = 2) // 16x16 grid
    assert(cells.forall(_ != null), "index must be a bijection")
    cells.sliding(2).foreach { case Array(a, b) =>
      val dist = a.zip(b).map { case (x, y) => math.abs(x - y) }.sum
      assert(dist == 1L, s"jump between ${a.toSeq} and ${b.toSeq}")
    }
  }

  test("3D: the curve property holds in higher dimensions") {
    val cells = inverse(bits = 3, dims = 3) // 8x8x8
    assert(cells.forall(_ != null))
    cells.sliding(2).foreach { case Array(a, b) =>
      assert(a.zip(b).map { case (x, y) => math.abs(x - y) }.sum == 1L)
    }
  }

  test("range queries touch no more files than Morton on a uniform grid") {
    val bits = 5; val side = 1 << bits // 32x32 grid, 64 files of 16 cells
    val cells = for (x <- 0L until side; y <- 0L until side) yield (x, y)
    def fileOf(codes: Map[(Long, Long), Long]): Map[(Long, Long), Long] =
      codes.toSeq.sortBy(_._2).zipWithIndex
        .map { case ((c, _), i) => c -> (i / 16).toLong }.toMap
    val hilbert = fileOf(cells.map(c =>
      c -> ZOrder.hilbertIndex(bits, Array(c._1, c._2))).toMap)
    def morton(x: Long, y: Long): Long =
      (0 until bits).foldLeft(0L)((acc, k) =>
        acc | (((x >> k) & 1L) << (2 * k)) | (((y >> k) & 1L) << (2 * k + 1)))
    val mort = fileOf(cells.map(c => c -> morton(c._1, c._2)).toMap)
    // 100 deterministic 6x6 range queries
    var hHits = 0L; var mHits = 0L
    for (qx <- 0L until 26L by 3L; qy <- 0L until 26L by 3L) {
      val q = for (x <- qx until qx + 6; y <- qy until qy + 6) yield (x, y)
      hHits += q.map(hilbert).distinct.size
      mHits += q.map(mort).distinct.size
    }
    assert(hHits <= mHits,
      s"hilbert touched $hHits files vs morton $mHits — locality regressed")
  }

  test("OPTIMIZE with the hilbert: prefix preserves content and clusters") {
    val table = Files.createTempDirectory("hilb").toString + "/t"
    import spark.implicits._
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    TableWriter.write(spark, grid.repartition(8), table,
      version = 0L, commitTs = 1000L)
    TableWriter.compact(spark, table, version = 1L, commitTs = 2000L,
      zorderBy = Seq("hilbert:x", "y"), targetFiles = 8,
      minFileBytes = Long.MaxValue)
    val log = new TxnLog(table, spark.sessionState.newHadoopConf())
    val files = log.snapshotLatest().files
    assert(files.size == 8)
    val got = SnapshotReader.read(spark, table)
      .agg(count(lit(1)), sum(col("x") * 64 + col("y"))).head()
    assert(got.getLong(0) == 4096L)
    assert(got.getLong(1) == (0L until 4096L).sum)
    // every output file covers a bounded x-range AND y-range (the
    // multi-dimension locality a single-column sort cannot give: an
    // x-sort makes every file span y=63). The bound is 48, not the
    // ideal 32: repartitionByRange picks boundaries by SAMPLING with a
    // run-varying seed (rdd.id), so a boundary can land mid-quadrant
    // and stretch one file across a curve fold.
    files.foreach { f =>
      val st = f.stats.get
      val spanX = st.maxValues("x").toLong - st.minValues("x").toLong
      val spanY = st.maxValues("y").toLong - st.minValues("y").toLong
      assert(spanX <= 48 && spanY <= 48,
        s"file ${f.path} spans x=$spanX y=$spanY — not clustered")
    }
  }
}
