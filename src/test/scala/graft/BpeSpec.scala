package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BpeTrainer

/** BPE trainer: greedy merge semantics pinned against a hand-computed
  * corpus, the consecutive-run merge rule, and the scale contract —
  * ONE shuffle per training round.
  */
class BpeSpec extends AnyFunSuite {
  import SparkTestSession._

  private def words(ws: (String, Long)*) = {
    import spark.implicits._
    ws.toDF("w", "f")
      .select(regexp_replace(col("w"), "(.)", "($1)").as("s"), col("f"))
  }

  test("merges follow weighted pair counts with deterministic tiebreaks") {
    // pair counts round 1: (a,b): ab×2 + ba(no)… hand-computed:
    //   "abab" f=3 → (a,b)×2, (b,a)×1
    //   "aab"  f=2 → (a,a)×1, (a,b)×1
    // (a,b)=8, (b,a)=3, (a,a)=2 → merge (a,b)
    val (merges, fin) = BpeTrainer.train(words("abab" -> 3L, "aab" -> 2L), 2)
    assert(merges.head == BpeTrainer.Merge(1, "a", "b", 8L))
    // after merging: "abab"→(ab)(ab) f=3 → pair (ab,ab)=3;
    // "aab"→(a)(ab) f=2 → pair (a,ab)=2 → round 2 merges (ab,ab)
    assert(merges(1) == BpeTrainer.Merge(2, "ab", "ab", 3L))
    val s = fin.orderBy(col("f")).collect().map(_.getString(0)).toSeq
    assert(s == Seq("(a)(ab)", "(abab)"), s)
    fin.unpersist()
  }

  test("consecutive runs merge greedily left-to-right") {
    // merging (a,a) over "aaaa" must yield (aa)(aa), over "aaa" (aa)(a)
    val (merges, fin) = BpeTrainer.train(
      words("aaaa" -> 2L, "aaa" -> 1L), 1)
    // counts: aaaa → (a,a)×3×2=6; aaa → (a,a)×2 → 8
    assert(merges.head == BpeTrainer.Merge(1, "a", "a", 8L))
    val s = fin.orderBy(col("f")).collect().map(_.getString(0)).toSeq
    assert(s == Seq("(aa)(a)", "(aa)(aa)"), s)
    fin.unpersist()
  }

  test("a training round's pair count is exactly one shuffle") {
    // AQE wraps the plan, so count exchanges in the rendered tree
    val plan = BpeTrainer.pairCounts(words("abab" -> 3L, "aab" -> 2L))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange ".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"one hash-aggregate shuffle per round, got $exchanges:\n$plan")
  }

  test("stops when no pairs remain") {
    val (merges, fin) = BpeTrainer.train(words("ab" -> 1L), 5)
    assert(merges == Seq(BpeTrainer.Merge(1, "a", "b", 1L)))
    fin.unpersist()
  }

  test("applyMerges replays a ledger exactly (train's final state) and " +
      "is MAP-ONLY — zero shuffles") {
    val w0 = words("abab" -> 5L, "abc" -> 3L, "bc" -> 2L, "aa" -> 4L)
    val (merges, fin) = BpeTrainer.train(w0, 3)
    val replayed = BpeTrainer.applyMerges(w0, merges)
    val a = fin.orderBy("s").collect().map(r => (r.getString(0), r.getLong(1)))
    val b = replayed.orderBy("s").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(a.sameElements(b),
      s"apply must equal the trainer's final symbolization: " +
        s"${a.toSeq} vs ${b.toSeq}")
    fin.unpersist()
    // inference is a fused projection: no Exchange anywhere in the plan
    val plan = BpeTrainer.applyMerges(w0, merges)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"applyMerges must not shuffle:\n$plan")
  }
}
