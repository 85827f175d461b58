package graft.operators

import graft.txn.{SnapshotReader, TableWriter}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental NEAR-dup ingestion: the MinHash-LSH index maintained as
  * versioned tables so continuous ingestion dedups each arrival batch
  * against everything already accepted — without ever re-sketching the
  * corpus (the q46 batch shape turned into streaming state).
  *
  * State layout under `indexBase`:
  *   - `<indexBase>/sigs`  (doc_id, sig array<bigint>) — one MinHash
  *     signature per accepted doc; verification joins read ONLY the
  *     candidate ids (shuffled equi-join on doc_id).
  *   - `<indexBase>/bands` (doc_id, band_id, band_hash) — the banded
  *     LSH index; candidate generation is an ids-only equi-join on
  *     (band_id, band_hash).
  *
  * Near-duplicate verdicts use the MinHash slot-agreement ESTIMATE of
  * Jaccard (agreeing-slot fraction), so the stored signatures are the
  * complete verification state — original shingle sets are never
  * re-derived. The estimate is deterministic (same kernel both sides).
  *
  * Scale shape per batch of size b against a corpus of size N: sketching
  * is map-only over b; candidate generation shuffles ids keyed by band
  * buckets; verification touches O(candidates) signature rows. Nothing
  * scans the N-doc corpus.
  */
object IncrementalNearDup {

  /** Minimum agreeing-slot fraction (≈ Jaccard) to call a near-dup. */
  val AgreeThreshold = 0.5

  private def sigsPath(indexBase: String) = s"$indexBase/sigs"
  private def bandsPath(indexBase: String) = s"$indexBase/bands"

  /** Fraction of signature slots on which `a` and `b` agree. */
  def sigAgreement(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x).cast("double") / size(a).cast("double")

  /** (doc_id, text, sig) for an arrival frame. */
  def sketch(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"),
      TextOps.minhashSignature(
        TextOps.hashedShingles(TextOps.tokens(col("text")))).as("sig"))

  private def bandsOf(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"), explode(TextOps.bands(col("sig"))).as("b"))
      .select(col("doc_id"), col("b.band_id").as("band_id"),
        col("b.band_hash").as("band_hash"))

  /** Seed the index tables from an initial (already-deduplicated) corpus
    * frame of (doc_id, text).
    */
  def seed(
      spark: SparkSession,
      docs: DataFrame,
      indexBase: String,
      commitTs: Long): Unit = {
    val s = sketch(docs).select(col("doc_id"), col("sig"))
    TableWriter.write(spark, s, sigsPath(indexBase),
      version = 0L, commitTs = commitTs)
    TableWriter.write(spark, bandsOf(s), bandsPath(indexBase),
      version = 0L, commitTs = commitTs)
  }

  /** Process one arrival batch: drop in-batch near-dups (keep lowest
    * doc_id), drop docs near-duplicating the indexed corpus, append the
    * survivors' signatures and bands to the index, and return the
    * surviving (doc_id, text) rows for the caller's corpus append.
    */
  def processBatch(
      spark: SparkSession,
      batch: DataFrame,
      indexBase: String,
      commitTs: Long): DataFrame = {
    val docs = sketch(batch).cache()
    try {
      val nb = bandsOf(docs)
      // in-batch: banded candidates (SkewGuard: a boilerplate flood inside
      // one batch stars to its min id — keep-first still drops the flood,
      // the pair count stays linear), keep-first on slot agreement
      val inCand = SkewGuard.boundedSelfJoinPairs(
        nb, "doc_id", Seq("band_id", "band_hash"), "doc_a", "doc_b")
      val inDup = inCand
        .join(docs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
        .join(docs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
        .filter(sigAgreement(col("sig_a"), col("sig_b")) >= AgreeThreshold)
        .select(col("doc_b").as("doc_id")).distinct()
      val inSurvivors = docs.join(inDup, Seq("doc_id"), "left_anti")

      // vs corpus: ids-only candidate join against the banded index,
      // then signature verification on just the candidate ids. The corpus
      // side of each band bucket is capped: past SkewGuard.DefaultCap
      // members only the bucket's MIN id remains a candidate — a batch
      // doc matching an indexed boilerplate flood still verifies against
      // the flood's representative (flood members are near-identical by
      // construction), but the join fan-out stays bounded. The window
      // shuffle keys on the same (band_id, band_hash) the join uses, so
      // no extra exchange is introduced.
      val corpusBands = SnapshotReader.read(spark, bandsPath(indexBase))
      val corpusSigs = SnapshotReader.read(spark, sigsPath(indexBase))
      val wBucket = org.apache.spark.sql.expressions.Window
        .partitionBy(col("band_id"), col("band_hash"))
      val cbGuarded = corpusBands
        .select(col("band_id"), col("band_hash"), col("doc_id").as("corpus_id"))
        .withColumn("_bn", count(lit(1)).over(wBucket))
        .withColumn("_rep", min(col("corpus_id")).over(wBucket))
        .filter(col("_bn") <= SkewGuard.DefaultCap ||
          col("corpus_id") === col("_rep"))
        .select(col("band_id"), col("band_hash"), col("corpus_id"))
      val vs = bandsOf(inSurvivors.select(col("doc_id"), col("sig")))
        .join(cbGuarded, Seq("band_id", "band_hash"))
        .select(col("doc_id"), col("corpus_id")).distinct()
      val corpDup = vs
        .join(inSurvivors.select(col("doc_id"), col("sig")), "doc_id")
        .join(corpusSigs.select(col("doc_id").as("corpus_id"),
          col("sig").as("corpus_sig")), "corpus_id")
        .filter(sigAgreement(col("sig"), col("corpus_sig")) >= AgreeThreshold)
        .select(col("doc_id")).distinct()
      val survivors = inSurvivors.join(corpDup, Seq("doc_id"), "left_anti")
        .cache()

      if (!survivors.isEmpty) {
        // optimized write: a per-batch append must not fan one small
        // frame across every shuffle partition — 32 micro-files per
        // commit is the small-files problem at birth. Size the file
        // count by the batch's row bound (~500k rows/file), exactly the
        // knob a 100 TB ingest would set.
        val parts = math.max(1L, survivors.count() / 500000L).toInt
        TableWriter.append(spark,
          survivors.select(col("doc_id"), col("sig")).coalesce(parts),
          sigsPath(indexBase), commitTs = commitTs)
        TableWriter.append(spark,
          bandsOf(survivors.select(col("doc_id"), col("sig")))
            .coalesce(parts),
          bandsPath(indexBase), commitTs = commitTs)
      }
      survivors.select(col("doc_id"), col("text"))
    } finally docs.unpersist()
  }

  /** Latest indexed doc count (observability / spec hook). */
  def indexedCount(spark: SparkSession, indexBase: String): Long =
    SnapshotReader.read(spark, sigsPath(indexBase)).count()

  /** Zero-copy clone of the whole index (both tables) — metadata-only,
    * so an experiment (or a benchmark run) can ingest into a writable
    * branch of a seeded corpus without re-sketching or copying it.
    */
  def cloneIndex(
      spark: SparkSession,
      srcBase: String,
      dstBase: String,
      commitTs: Long): Unit = {
    TableWriter.cloneShallow(spark, sigsPath(srcBase), sigsPath(dstBase),
      commitTs)
    TableWriter.cloneShallow(spark, bandsPath(srcBase), bandsPath(dstBase),
      commitTs)
  }
}
