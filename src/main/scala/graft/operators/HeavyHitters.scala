package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra-Gries heavy hitters: a k-counter mergeable summary with the
  * classic guarantee — after summarizing n items, EVERY key with true
  * frequency > n/(k+1) is present, and each kept counter underestimates
  * by at most n/(k+1). Merging two summaries (Agarwal et al., "Mergeable
  * Summaries") preserves the bound, so the sketch distributes: partial
  * summaries per partition, one tiny merge at the driver-side reduce —
  * O(k) state per task regardless of input size, where an exact
  * groupBy on a 100 TB key column shuffles every distinct key.
  *
  * The guarantee is what makes the op ORACLE-CHECKABLE despite being
  * approximate: intersect the candidate set with exact counts (≤ k keys,
  * so the recount is a pruned aggregate, not a second full groupBy at
  * the sketch's cost model) and keep those over the n/(k+1) threshold —
  * that set provably EQUALS the exact heavy-hitter set.
  */
object HeavyHitters {

  /** MG summary as a sorted association list (encoder-friendly). */
  final case class Summary(keys: Array[Long], counts: Array[Long])

  final class MisraGries(k: Int)
    extends Aggregator[Long, scala.collection.mutable.Map[Long, Long], Summary] {
    require(k > 0)

    override def zero: scala.collection.mutable.Map[Long, Long] =
      scala.collection.mutable.Map.empty

    override def reduce(
        b: scala.collection.mutable.Map[Long, Long],
        x: Long): scala.collection.mutable.Map[Long, Long] = {
      if (b.contains(x) || b.size < k) b.updateWith(x) {
        case Some(c) => Some(c + 1); case None => Some(1L)
      }
      else decrementAll(b, 1L)
      b
    }

    override def merge(
        a: scala.collection.mutable.Map[Long, Long],
        b: scala.collection.mutable.Map[Long, Long]):
        scala.collection.mutable.Map[Long, Long] = {
      b.foreach { case (key, c) =>
        a.updateWith(key) { case Some(c0) => Some(c0 + c); case None => Some(c) }
      }
      if (a.size > k) {
        // subtract the (k+1)-th largest count from everything; at most k
        // strictly-positive counters survive, error grows by that pivot —
        // exactly the mergeable-summaries prune
        val pivot = a.values.toArray.sortBy(-_).apply(k)
        decrementAll(a, pivot)
      }
      a
    }

    private def decrementAll(
        m: scala.collection.mutable.Map[Long, Long],
        by: Long): scala.collection.mutable.Map[Long, Long] = {
      val dead = m.iterator.collect { case (key, c) if c <= by => key }.toArray
      dead.foreach(m.remove)
      m.mapValuesInPlace((_, c) => c - by)
      m
    }

    override def finish(
        b: scala.collection.mutable.Map[Long, Long]): Summary = {
      val sorted = b.toArray.sortBy { case (key, c) => (-c, key) }
      Summary(sorted.map(_._1), sorted.map(_._2))
    }

    override def bufferEncoder:
        Encoder[scala.collection.mutable.Map[Long, Long]] =
      Encoders.kryo[scala.collection.mutable.Map[Long, Long]]
    override def outputEncoder: Encoder[Summary] = Encoders.product[Summary]
  }

  /** Candidate heavy keys of `keyCol` (a LONG expression) via a k-counter
    * MG pass: at most k keys, guaranteed to include every key with
    * frequency > n/(k+1).
    */
  def candidates(df: DataFrame, keyCol: Column, k: Int): Array[Long] = {
    import df.sparkSession.implicits._
    val ds = df.select(keyCol.cast("long").as("k")).na.drop().as[Long]
    ds.select(new MisraGries(k).toColumn).head().keys
  }

  /** Exact heavy hitters: keys with COUNT(*) > n/(k+1), found with MG
    * pruning — the full-table recount only aggregates rows whose key is
    * in the ≤k candidate set (a broadcast-sized IN-list pushed to the
    * scan), never materializing the full key distribution.
    */
  def exactHeavy(df: DataFrame, keyCol: Column, k: Int): DataFrame = {
    val cand = candidates(df, keyCol, k)
    val n = df.count()
    val threshold = n / (k + 1) // freq > n/(k+1) ⟺ freq > floor thereof
    df.select(keyCol.cast("long").as("key"))
      .filter(col("key").isin(cand.map(Long.box).toIndexedSeq: _*))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > threshold)
      .orderBy(col("cnt").desc, col("key"))
  }
}
