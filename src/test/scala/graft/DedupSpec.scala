package graft

import graft.operators.EmbeddingOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Spark-only LSH scale paths must reproduce their brute-force
  * SQL-verified baselines at small scale (recall/precision checks).
  */
class DedupSpec extends AnyFunSuite {

  test("connected components: union-find and label propagation agree") {
    import SparkTestSession._
    import spark.implicits._
    // chain 1-2-3, pair 10-11, triangle 20-21-22, self-contained 30-31
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L), (31L, 30L))
      .toDF("doc_a", "doc_b")
    def normalize(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val small = normalize(
      graft.operators.ConnectedComponents.components(pairs))
    val dist = normalize(
      graft.operators.ConnectedComponents.components(pairs,
        smallThreshold = 0L)) // force the distributed path
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 30L -> 30L, 31L -> 30L)
    assert(small == want)
    assert(dist == want)
  }

  test("connected components converge on a deep chain (log-diameter rounds)") {
    import SparkTestSession._
    import spark.implicits._
    // 120-hop path graph: diameter far beyond any per-round propagation
    // budget — the r5 hazard where maxIter=10 silently returned SPLIT
    // components. Pointer jumping must land the min label end-to-end
    // within the default cap.
    val n = 120
    val chain = (0 until n).map(i => (i.toLong, i.toLong + 1)).toDF("doc_a", "doc_b")
    def normalize(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (0L to n.toLong).map(_ -> 0L).toMap
    assert(normalize(
      graft.operators.ConnectedComponents.components(chain)) == want)
    assert(normalize(graft.operators.ConnectedComponents.components(chain,
      smallThreshold = 0L)) == want)
  }

  test("connected components FAIL LOUDLY when the iteration cap is hit") {
    import SparkTestSession._
    import spark.implicits._
    val chain = (0 until 40).map(i => (i.toLong, i.toLong + 1)).toDF("doc_a", "doc_b")
    val e = intercept[IllegalStateException] {
      graft.operators.ConnectedComponents.components(chain,
        maxIter = 1, smallThreshold = 0L).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }
  import SparkTestSession._

  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("SkewGuard: small buckets pair densely, hot buckets star to min id") {
    import spark.implicits._
    // bucket "small": 5 members → all C(5,2)=10 pairs (exact semantics);
    // bucket "hot": 1000 members over cap=50 → 999 star pairs, NOT ~500k
    val slots = ((1L to 5L).map((_, "small")) ++
      (101L to 1100L).map((_, "hot"))).toDF("id", "bucket")
    val pairs = graft.operators.SkewGuard.boundedSelfJoinPairs(
        slots, "id", Seq("bucket"), "a", "b", cap = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val dense = pairs.filter(_._2 <= 5L)
    val star = pairs.filter(_._2 > 5L)
    assert(dense.length == 10)
    assert(star.length == 999, s"hot bucket emitted ${star.length} pairs")
    assert(star.forall(_._1 == 101L), "star pairs must anchor on the min id")
    assert(pairs.forall(p => p._1 < p._2))
  }

  test("minhash LSH reproduces brute-force ngram-jaccard pairs") {
    val brute = pairs("q45_ngram_jaccard")
    val lsh = pairs("q46_minhash_lsh")
    // LSH precision is exact (candidates are jaccard-verified); recall is
    // probabilistic but ≥ 0.999 at j ≥ 0.6 with 16 bands × 2 rows.
    assert(lsh.subsetOf(brute), s"LSH produced non-brute pairs: ${lsh -- brute}")
    assert((brute -- lsh).size <= math.max(1, brute.size / 20),
      s"LSH missed too many pairs: ${(brute -- lsh).size} of ${brute.size}")
    // Planted pairs (doc, doc+100000) must all be found.
    val planted = brute.filter { case (a, b) => b == a + 100000 }
    assert(planted.subsetOf(lsh), "LSH missed planted near-dup pairs")
  }

  test("embedding LSH near-dup exactly matches brute force") {
    // Sign projections are scale-invariant, so every cosine-1.0 planted
    // pair shares its bucket: recall on true near-dups is exactly 1.
    assert(pairs("q52_embedding_neardup_lsh") == pairs("q51_embedding_neardup"))
  }

  test("simhash finds the bulk of planted near-dup pairs") {
    // SimHash measures weighted bag-of-words similarity: appending 3 junk
    // tokens to a 10-token doc is a large multiset change, so short planted
    // docs legitimately fall outside hamming ≤ 8 (measured: 36 of 50 pairs
    // qualify on this corpus; the rest have hamming 10–23).
    val sim = pairs("q47_simhash")
    val planted = pairs("q45_ngram_jaccard")
      .filter { case (a, b) => b == a + 100000 }
    assert((planted intersect sim).size >= 25,
      s"simhash found only ${(planted intersect sim).size} planted pairs")
  }

  test("banded LSH candidate pairs grow sub-quadratically with corpus size") {
    // deterministic pseudo-random 64-dim corpus of size n
    def corpus(n: Int): DataFrame =
      spark.range(n).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)), k =>
          (pmod(xxhash64(col("id") * 64 + k), lit(2001)) - 1000)
            .cast("double") / 1000.0).as("v"))
    def candidates(n: Int): Long = {
      val bits = EmbeddingOps.lshAutoBits(n)
      val slots = corpus(n).select(col("vec_id"),
        explode(EmbeddingOps.lshBandSlots(col("v"), 8, bits)).as("slot"))
      slots.as("a").join(slots.as("b"),
          col("a.slot") === col("b.slot") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id"), col("b.vec_id"))
        .dropDuplicates().count()
    }
    val small = candidates(400)
    val big = candidates(4000)
    assert(small > 0)
    // a FIXED bucket space would scale pairs ~quadratically (100× here);
    // corpus-adaptive band width must stay far below that
    assert(big < 30 * small,
      s"candidate growth not sub-quadratic: $small -> $big")
  }

  test("ANN LSH top-k neighbors are true neighbors (subset sanity)") {
    val ann = SparkEntry.queries("q53_ann_lsh_topk")(spark, sf).collect()
    assert(ann.nonEmpty)
    // every ANN hit's cosine must be ≤ the true top-1 cosine of that query
    val brute = SparkEntry.queries("q50_cosine_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val top1 = ann.filter(_.getInt(1) == 1)
    assert(top1.nonEmpty)
  }
}
