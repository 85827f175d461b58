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

  /** 32-wide MinHash signature over the distinct shingle set. */
  def minhashSignature(shingleCol: Column): Column =
    transform(sequence(lit(0), lit(NumHashes - 1)),
      seed => array_min(transform(shingleCol,
        sh => xxhash64(sh, seed))))

  /** Explode a signature into (band_id, band_hash) rows for bucket join. */
  def bands(sig: Column): Column =
    transform(sequence(lit(0), lit(NumBands - 1)),
      b => struct(b.as("band_id"),
        xxhash64(element_at(sig, b * 2 + 1),
          element_at(sig, b * 2 + 2)).as("band_hash")))

  /** Exact Jaccard between two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - size(array_intersect(a, b))).cast("double")
  }

  // ----------------------------------------------------------------------
  // SimHash (64-bit) — complements MinHash for token-multiset similarity.
  // ----------------------------------------------------------------------

  /** Per-token 64 bit-votes: +1 where the token hash has the bit set,
    * -1 where not; summed per document and thresholded into a sign bit.
    * Returns the 64-bit simhash packed as 4×16-bit block values so that
    * near-dup candidate search can pigeonhole-join on block equality
    * (hamming ≤ 3 ⇒ at least one of 4 blocks identical).
    */
  def simhashBlocks(toks: Column): Column = {
    val votes = aggregate(
      transform(toks, t => transform(sequence(lit(0), lit(63)),
        b => when(call_function("shiftright", xxhash64(t), b)
          .bitwiseAND(1) === 1, 1).otherwise(-1))),
      transform(sequence(lit(0), lit(63)), _ => lit(0)),
      (acc, x) => zip_with(acc, x, (a, b) => a + b))
    val bits = transform(votes, v => when(v > 0, 1L).otherwise(0L))
    transform(sequence(lit(0), lit(3)), blk =>
      aggregate(sequence(lit(0), lit(15)),
        lit(0L),
        (acc, i) => acc * 2 + element_at(bits, blk * 16 + i + 1)))
  }

  /** Hamming distance between two 4×16-bit block arrays. */
  def hammingFromBlocks(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y))),
      lit(0), (acc, x) => acc + x)
}
