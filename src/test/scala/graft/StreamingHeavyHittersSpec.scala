package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming Misra-Gries: the batch q135 sketch run across micro-batches
  * with state carry-over — the containment guarantee must hold over the
  * UNION of all batches, not per batch.
  */
class StreamingHeavyHittersSpec extends AnyFunSuite {
  import SparkTestSession._

  test("hot keys planted across batches survive in the latest emission") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val sqlCtx = spark.sqlContext
      import spark.implicits._
      implicit val sq = sqlCtx
      val mem = MemoryStream[Long]
      val cand = graft.streaming.StreamingHeavyHitters
        .candidates(mem.toDF().toDF("key"), k = 64, shards = 8)
      val q = cand.toDF().writeStream.outputMode("update")
        .format("memory").queryName("shh_out")
        .option("checkpointLocation", Files.createTempDirectory("ck").toString)
        .start()
      try {
        // the q135 skew shape, split across TWO batches: seven hot keys
        // (0..6) at ~5% each over a 10k-key tail — each batch alone holds
        // only HALF a hot key's mass, so surviving requires state
        def keyOf(i: Long): Long =
          if (i % 3 == 0) i % 7 else 100 + (i % 10000)
        val all = (0L until 20000L).map(keyOf)
        mem.addData(all.take(10000): _*)
        q.processAllAvailable()
        mem.addData(all.drop(10000): _*)
        q.processAllAvailable()
        // latest emission per (shard, key): the last batch's counters
        val latest = spark.sql(
          """SELECT key, MAX(lower_count) AS c FROM shh_out GROUP BY key""")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val trueCounts = all.groupBy(identity).view.mapValues(_.size.toLong)
        val hot = (0L until 7L).filter(k => trueCounts(k) > 20000L / 65)
        assert(hot.nonEmpty)
        hot.foreach { k =>
          assert(latest.contains(k),
            s"hot key $k (count ${trueCounts(k)}) missing from candidates")
          // MG lower bound: kept counter never exceeds the true count
          assert(latest(k) <= trueCounts(k))
        }
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None    => spark.conf.unset(providerKey)
    }
  }
}
