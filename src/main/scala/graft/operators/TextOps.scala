package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the LLM-data-pipeline operators
  * (SURVEY.md §2.9): tokenization, shingling, stopword profiling, quality
  * metrics, fingerprints, and the derived dup-planted corpora used to
  * verify dedup operators end-to-end.
  *
  * Everything here stays inside Catalyst expressions (split / transform /
  * filter / aggregate higher-order functions) — no UDFs, no driver
  * materialization — so whole-stage codegen applies and the same pipeline
  * scales to arbitrarily many documents partitioned by doc_id.
  */
object TextOps {

  /** Whitespace tokenizer — the oracle-portable definition. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Distinct word-trigram shingles of the token stream. */
  def shingles(toks: Column): Column =
    array_distinct(
      transform(sequence(lit(0), size(toks) - 3),
        i => concat_ws(" ", element_at(toks, i + 1),
          element_at(toks, i + 2), element_at(toks, i + 3))))

  /** English-stopword hits (vocabulary-matched to the synthetic corpus). */
  def stopwordHits(toks: Column): Column =
    size(filter(toks, t => t === "the" || t === "a" || t === "of" ||
      t === "and" || t === "to" || t === "in"))

  /** Normalized text: collapsed whitespace, lowercased — fingerprint input. */
  def normText(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** MD5 fingerprint of normalized text (portable to DuckDB's md5()). */
  def fingerprint(text: Column): Column =
    md5(normText(text).cast("binary"))

  // ----------------------------------------------------------------------
  // Dup-planted corpora (deterministic, reproducible in DuckDB SQL): the
  // source documents table plus mutated/exact copies of a fixed subset, so
  // near-dup/exact-dup operators have known-positive pairs to find.
  // ----------------------------------------------------------------------

  /** documents ∪ near-dup copies (doc_id+100000, 3 junk tokens appended)
    * of every 10th doc. Word-trigram Jaccard(original, copy) ≈ (n-2)/(n+1)
    * for n tokens ⇒ ≥ 0.72 at the corpus minimum of 10 tokens.
    */
  def nearDupCorpus(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    d.select(col("doc_id"), col("text")).unionAll(
      d.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" zq zq zq")).as("text")))
  }

  /** documents ∪ byte-exact copies (doc_id+200000) of every 7th doc. */
  def exactDupCorpus(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    d.select(col("doc_id"), col("text")).unionAll(
      d.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 200000).as("doc_id"), col("text")))
  }

  /** SQL mirror of [[nearDupCorpus]] for DuckDB oracles. */
  val nearDupCorpusSql: String =
    """SELECT doc_id, text FROM documents
      |UNION ALL
      |SELECT doc_id + 100000 AS doc_id, text || ' zq zq zq' AS text
      |FROM documents WHERE doc_id % 10 = 0""".stripMargin

  /** SQL mirror of [[exactDupCorpus]] for DuckDB oracles. */
  val exactDupCorpusSql: String =
    """SELECT doc_id, text FROM documents
      |UNION ALL
      |SELECT doc_id + 200000 AS doc_id, text
      |FROM documents WHERE doc_id % 7 = 0""".stripMargin

  // ----------------------------------------------------------------------
  // MinHash + LSH banding (the 100 TB near-dup path: candidate generation
  // is linear in corpus size × signature width; no O(n²) pair scan).
  // ----------------------------------------------------------------------

  val NumHashes = 32
  val NumBands = 16 // r = 2 rows/band ⇒ P(candidate | j=0.6) ≈ 0.999

  /** Distinct 64-bit shingle hashes — the compact set representation the
    * candidate joins and Jaccard verification run on (longs shuffle and
    * compare an order of magnitude cheaper than shingle strings; a 64-bit
    * collision across a corpus-wide shingle vocabulary is ~1e-9).
    * Compiled kernel (graft.functions.ShingleHashesExpr) straight from
    * the token array — one pass, one hash per token.
    */
  def hashedShingles(toks: Column, k: Int = 3): Column =
    graft.functions.SketchExprs.shingle_hashes(toks, k)

  /** Interpreted-transform variant kept for reference/tests. */
  def shingleHashes(shingleCol: Column): Column =
    array_distinct(transform(shingleCol, sh => xxhash64(sh)))

  /** 32-wide MinHash signature over the distinct shingle strings —
    * compiled kernel (graft.functions.MinHashSigExpr): one base hash per
    * shingle + 32 cheap remixes, in a tight loop.
    */
  def minhashSignature(shingleStrings: Column): Column =
    graft.functions.SketchExprs.minhash_sig(shingleStrings, NumHashes)

  /** Explode a signature into (band_id, band_hash) rows for bucket join. */
  def bands(sig: Column): Column =
    transform(sequence(lit(0), lit(NumBands - 1)),
      b => struct(b.as("band_id"),
        xxhash64(element_at(sig, b * 2 + 1),
          element_at(sig, b * 2 + 2)).as("band_hash")))

  /** Band split at an EXPLICIT band count (rows/band = NumHashes ÷
    * numBands) — the (bands, rows) knob of the MinHash S-curve that
    * q385's sensitivity sweep tunes; [[bands]] is the production
    * 16 × 2 point of this family.
    */
  def bandsAt(sig: Column, numBands: Int): Column = {
    require(NumHashes % numBands == 0,
      s"$numBands bands must divide $NumHashes hashes")
    val r = NumHashes / numBands
    transform(sequence(lit(0), lit(numBands - 1)),
      b => struct(b.as("band_id"),
        xxhash64(slice(sig, b * r + 1, lit(r))).as("band_hash")))
  }

  /** Exact Jaccard between two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - size(array_intersect(a, b))).cast("double")
  }

  // ----------------------------------------------------------------------
  // SimHash (64-bit) — complements MinHash for token-multiset similarity.
  // The fingerprint is ONE packed long: candidate pairs join on 16-bit
  // pigeonhole blocks (hamming ≤ 3 guarantees a shared block; larger
  // hamming is found best-effort through collisions), and verification is
  // a single codegen'd bit_count(a^b) — no per-pair array work.
  // ----------------------------------------------------------------------

  /** Packed 64-bit SimHash of the token array — compiled kernel
    * (graft.functions.SimHash64Expr): majority vote per bit over token
    * hashes in a tight loop.
    */
  def simhash64(toks: Column): Column =
    graft.functions.SketchExprs.simhash_64(toks)

  /** The 4 16-bit pigeonhole blocks of a packed simhash. */
  def simhashBlocks64(sig: Column): Column =
    transform(sequence(lit(0), lit(3)), blk =>
      call_function("shiftright", sig, blk * 16).bitwiseAND(0xffffL))

  /** Hamming distance between packed simhashes — codegen'd popcount. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
