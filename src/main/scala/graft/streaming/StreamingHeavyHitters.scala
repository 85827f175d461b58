package graft.streaming

import graft.operators.HeavyHitters
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Streaming Misra-Gries heavy hitters on `transformWithState` — the
  * q135 sketch running CONTINUOUSLY: keys hash into [[shards]] state
  * keys, each shard folds its stream through the same mergeable
  * k-counter core the batch Aggregator uses, and every micro-batch
  * emits the shard's current candidate set (Update mode — downstream
  * reads the latest emission).
  *
  * The containment guarantee survives both sharding and batching: a key
  * lives in exactly ONE shard, so its shard-local count equals its
  * global count, and a summary folded batch-by-batch is the same MG
  * summary the one-shot fold produces (state carries the counters, not
  * per-batch approximations of them). Every key with global frequency
  * > n_shard/(k+1) is therefore present in its shard's latest emission.
  * State per shard: ≤ k counters — O(shards·k) total, RocksDB-backed.
  */
object StreamingHeavyHitters {

  final case class KeyEvent(shard: Int, key: Long)
  final case class Candidate(shard: Int, key: Long, lower_count: Long)

  class Processor(k: Int)
    extends StatefulProcessor[Int, KeyEvent, Candidate] {

    @transient private var sum: ValueState[HeavyHitters.Summary] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sum = getHandle.getValueState[HeavyHitters.Summary](
        "mg", Encoders.product[HeavyHitters.Summary], TTLConfig.NONE)

    override def handleInputRows(
        shard: Int,
        rows: Iterator[KeyEvent],
        timerValues: TimerValues): Iterator[Candidate] = {
      val mg = new HeavyHitters.MisraGries(k)
      val buf = scala.collection.mutable.Map.empty[Long, Long]
      if (sum.exists()) {
        val s = sum.get()
        s.keys.zip(s.counts).foreach { case (key, c) => buf(key) = c }
      }
      rows.foreach(e => mg.reduce(buf, e.key))
      val out = mg.finish(buf)
      sum.update(out)
      out.keys.zip(out.counts).iterator.map { case (key, c) =>
        Candidate(shard, key, c)
      }
    }
  }

  /** keys (one LongType column named `key`) → per-batch candidate
    * emissions. Processing-time mode: the sketch needs no event-time
    * semantics, only state carry-over.
    */
  def candidates(
      keys: DataFrame,
      k: Int = 64,
      shards: Int = 8): Dataset[Candidate] = {
    import keys.sparkSession.implicits._
    keys.select(pmod(col("key"), lit(shards)).cast("int").as("shard"),
        col("key").cast("long").as("key"))
      .as[KeyEvent]
      .groupByKey(_.shard)
      .transformWithState(new Processor(k),
        TimeMode.None(), OutputMode.Update())
  }
}
