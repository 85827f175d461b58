package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.BloomFilterExprs
import graft.functions.BloomFilterExprs.LongBloom

/** Bloom-filter join pruning: no false negatives ever, false-positive
  * rate near the sizing formula, the pruned semi-join bit-identical to
  * the plain one, and the probe filter sitting BELOW the join's exchange
  * (map-side, where it saves the shuffle).
  */
class BloomSpec extends AnyFunSuite {
  import SparkTestSession._

  test("local bloom: zero false negatives, FPP near nominal") {
    val b = BloomFilterExprs.empty(50000, bitsPerKey = 10)
    (0L until 50000L).foreach(b.put)
    assert((0L until 50000L).forall(b.mightContain), "false negative")
    val fp = (1000000L until 1100000L).count(b.mightContain)
    // 10 bits/key nominal ~0.8%; power-of-two rounding only lowers it.
    // 3% leaves room for hash variance without masking a real break.
    assert(fp < 3000, s"fpr ${fp / 100000.0} too high for 10 bits/key")
  }

  test("distributed build over long keys matches local put") {
    val keys = spark.range(0, 20000).toDF("k")
    val b = BloomFilterExprs.build(keys, "k", 20000)
    assert((0L until 20000L).forall(b.mightContain))
    val fp = (500000L until 550000L).count(b.mightContain)
    assert(fp < 1500)
  }

  test("string keys round-trip through the same sketch") {
    val keys = spark.range(0, 5000)
      .select(concat(lit("key_"), col("id")).as("k"))
    val b = BloomFilterExprs.build(keys, "k", 5000)
    val probe = spark.range(0, 10000)
      .select(col("id"), concat(lit("key_"), col("id")).as("k"))
    val bc = spark.sparkContext.broadcast(b)
    val hits = probe.filter(BloomFilterExprs.mightContain(col("k"), bc))
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert((0L until 5000L).forall(hits), "false negative on strings")
    assert(hits.count(_ >= 5000L) < 300, "string fpr too high")
  }

  test("semiJoinPruned equals the plain left-semi join") {
    val li = Tables.load(spark, sf, "lineitem")
    val dim = Tables.load(spark, sf, "orders")
      .filter(col("o_totalprice") > 200000.0)
    val pruned = BloomFilterExprs
      .semiJoinPruned(li, "l_orderkey", dim, "o_orderkey")
      .select(col("l_orderkey"), col("l_linenumber"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val exact = li.join(dim.select(col("o_orderkey").as("l_orderkey")),
        Seq("l_orderkey"), "left_semi")
      .select(col("l_orderkey"), col("l_linenumber"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(pruned == exact)
    assert(pruned.nonEmpty)
  }

  test("probe filter evaluates below any exchange (map-side pruning)") {
    val li = Tables.load(spark, sf, "lineitem")
    val dim = Tables.load(spark, sf, "orders")
      .filter(col("o_totalprice") > 200000.0)
    val p = BloomFilterExprs
      .semiJoinPruned(li, "l_orderkey", dim, "o_orderkey")
      .queryExecution.executedPlan.toString
    // the probe must sit in a Filter DIRECTLY over the lineitem scan —
    // i.e. on the map side, before any exchange sees the rows
    val filterToScan =
      "(?s)Filter [^\\n]*graft_bloom_might_contain[^\\n]*\\n[^\\n]*FileScan".r
    assert(filterToScan.findFirstIn(p).isDefined,
      s"bloom probe not directly over the scan in:\n${p.take(3000)}")
  }

  test("sketch for a million keys stays a few MB") {
    val b = BloomFilterExprs.empty(1000000L, bitsPerKey = 10)
    assert(b.sizeBytes <= (4 << 20), s"${b.sizeBytes} bytes for 1M keys")
  }
}
