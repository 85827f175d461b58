package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Global order statistics WITHOUT a single-task window — the scale-safe
  * replacement for `ROW_NUMBER()/NTILE(k)/SUM(...) OVER (ORDER BY ...)`
  * with no PARTITION BY. An unpartitioned ordered window forces the
  * ENTIRE frame through ONE task (Spark plans a SinglePartition
  * exchange); at 100x the data that is ~10⁹ rows in one partition — the
  * exact shape the repo's own q121/q193 comments forbid.
  *
  * Both operators here keep the sort DISTRIBUTED (range-partitioned,
  * every partition sorted in parallel — the q193/Triangles.degreeRanks
  * pattern) and derive the global statistic from bounded per-partition
  * metadata:
  *
  *  - [[withRank]]: rank = per-partition index + partition offset, via
  *    `zipWithIndex` (offsets = per-partition COUNTS, one long each);
  *  - [[withPrefixSum]]: running sum = per-partition running sum +
  *    partition PREFIX offset (offsets = per-partition SUMS, one long
  *    each, `scanLeft` on the driver).
  *
  * Driver state is one long per partition — never row data. The sorted
  * RDD object is shared by the offsets job and the output job, so the
  * range-sort shuffle is computed once and reused.
  *
  * `sortCols` must be a TOTAL order (unique tie-break) for the rank to
  * be deterministic — the same contract every ordered-window query in
  * this repo already satisfies.
  */
object DistributedOrder {

  /** Append a 1-based global rank column under the total order
    * `sortCols`. Equivalent to
    * `ROW_NUMBER() OVER (ORDER BY sortCols)` with a distributed plan.
    */
  def withRank(df: DataFrame, rankName: String, sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(df.schema.fields :+
      StructField(rankName, LongType, nullable = false))
    val rdd = df.sort(sortCols: _*).rdd.zipWithIndex().map {
      case (row, i) => Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Append the inclusive running sum of `value` (cast to long; must be
    * non-null) under the total order `sortCols`, plus the grand total —
    * `SUM(v) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)` and
    * `SUM(v) OVER ()` together, with a distributed plan. Sums accumulate
    * in Long (callers needing 128-bit headroom cast the RESULT columns
    * to DECIMAL(38,0) before multiplying, as q110 does).
    */
  def withPrefixSum(
      df: DataFrame,
      sumName: String,
      totalName: String,
      value: Column,
      sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val tagged = df.withColumn("_dps_v", value.cast("long"))
    val vIdx = tagged.schema.length - 1
    val sorted = tagged.sort(sortCols: _*).rdd
    // offsets job: ONE long per partition back to the driver
    val perPart = sorted.mapPartitionsWithIndex { (i, it) =>
      var s = 0L
      it.foreach(r => s += r.getLong(vIdx))
      Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = perPart.scanLeft(0L)(_ + _)
    val total = offsets.last
    val offB = spark.sparkContext.broadcast(offsets)
    val schema = StructType(df.schema.fields ++ Seq(
      StructField(sumName, LongType, nullable = false),
      StructField(totalName, LongType, nullable = false)))
    val out = sorted.mapPartitionsWithIndex { (i, it) =>
      var run = offB.value(i)
      it.map { r =>
        run += r.getLong(vIdx)
        Row.fromSeq(r.toSeq.init :+ run :+ total)
      }
    }
    spark.createDataFrame(out, schema)
  }

  /** Append the EXCLUSIVE running minimum of `value` (cast to long;
    * must be non-null) under the total order `sortCols` — for each row,
    * the minimum over all STRICTLY EARLIER rows (Long.MaxValue for the
    * first). The dominance primitive: in a (cost asc)-sorted frame,
    * "was anything cheaper also smaller?" is one comparison against
    * this column. Same distributed shape as [[withPrefixSum]]: range
    * sort, one long per partition to the driver, scanLeft offsets.
    */
  def withPrefixMin(
      df: DataFrame,
      minName: String,
      value: Column,
      sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val tagged = df.withColumn("_dpm_v", value.cast("long"))
    val vIdx = tagged.schema.length - 1
    val sorted = tagged.sort(sortCols: _*).rdd
    val perPart = sorted.mapPartitionsWithIndex { (i, it) =>
      var m = Long.MaxValue
      it.foreach(r => m = math.min(m, r.getLong(vIdx)))
      Iterator((i, m))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = perPart.scanLeft(Long.MaxValue)(math.min)
    val offB = spark.sparkContext.broadcast(offsets)
    val schema = StructType(df.schema.fields :+
      StructField(minName, LongType, nullable = false))
    val out = sorted.mapPartitionsWithIndex { (i, it) =>
      var run = offB.value(i)
      it.map { r =>
        val exclusive = run
        run = math.min(run, r.getLong(vIdx))
        Row.fromSeq(r.toSeq.init :+ exclusive)
      }
    }
    spark.createDataFrame(out, schema)
  }

  /** NTILE(k) from a precomputed global rank: with n rows, the first
    * n mod k tiles take ceil(n/k) rows and the rest floor(n/k) — the
    * standard SQL NTILE split, in exact integer arithmetic (no float
    * division to drift a boundary). Pair with [[withRank]].
    */
  def ntileFromRank(rankCol: String, n: Long, k: Int): Column = {
    require(k >= 1, s"ntile needs k >= 1, got $k")
    require(n >= 0, s"ntile needs n >= 0, got $n")
    val q = n / k
    val rem = n % k
    val thr = rem * (q + 1)
    if (q == 0L) col(rankCol).cast(IntegerType)
    else expr(
      s"CAST(IF($rankCol <= $thr, ($rankCol - 1) DIV ${q + 1} + 1, " +
        s"$rem + ($rankCol - 1 - $thr) DIV $q + 1) AS INT)")
  }
}
