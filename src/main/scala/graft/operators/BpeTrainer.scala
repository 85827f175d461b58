package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Learned-merge BPE training — the canonical distributed
  * tokenizer-build loop (Sennrich et al., the algorithm behind every
  * production BPE/wordpiece vocab): k rounds of
  *
  *   1. count adjacent symbol pairs WEIGHTED BY WORD FREQUENCY —
  *      one hash aggregate over the vocab-sized word table;
  *   2. pick the most frequent pair (deterministic tiebreak: count
  *      desc, then pair lexicographic) — a 1-row collect;
  *   3. merge every occurrence greedily left-to-right — map-only.
  *
  * Scale shape: the CORPUS is scanned exactly once (to build the
  * (word, freq) table — classic BPE trains on word frequencies, not
  * running text); every round then touches only the vocab-sized frame:
  * ONE shuffle (the pair-count aggregate), one broadcastable top-1, one
  * codegen'd string `replace`. A 100 TB corpus trains at
  * |vocab| × rounds cost after its single scan.
  *
  * Symbol encoding: each symbol wraps in parens — "abc" starts as
  * `(a)(b)(c)` and merging (a,b) rewrites `(a)(b)` → `(ab)`. Plain
  * left-to-right non-overlapping string replace on this form IS the
  * greedy BPE merge: shared-boundary false matches are impossible
  * (a pair pattern must start at a symbol boundary) and consecutive
  * occurrences merge independently (`(a)(a)(a)(a)` → `(aa)(aa)`).
  * The input alphabet is restricted to lowercase a–z so the delimiters
  * can never collide with symbol text — and the SAME encoding is
  * expressible in ANSI SQL (`replace`/`regexp_replace`), which is what
  * lets a DuckDB oracle replay the trainer round for round.
  */
object BpeTrainer {

  /** One merge decision. */
  final case class Merge(round: Int, x: String, y: String, count: Long)

  /** The (word, freq) table of `text`: lowercase alpha runs, length
    * 2–20 (singletons carry no pairs; longer runs are noise), wrapped
    * into the `(a)(b)(c)` symbol form.
    */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(lower(col(textCol)), "[^a-z]+")).as("w"))
      .filter(length(col("w")).between(2, 20))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .select(regexp_replace(col("w"), "(.)", "($1)").as("s"), col("f"))

  /** Adjacent-pair counts of the CURRENT symbolization — the one
    * shuffle of a training round.
    */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .select(col("f"), expr(
        "split(substring(s, 2, length(s) - 2), '\\\\)\\\\(')").as("sy"))
      .filter(size(col("sy")) >= 2)
      .select(col("f"), explode(expr(
        "transform(sequence(1, size(sy) - 1), " +
          "i -> struct(sy[i-1] AS x, sy[i] AS y))")).as("p"))
      .groupBy(col("p.x").as("x"), col("p.y").as("y"))
      .agg(sum(col("f")).as("c"))

  /** Train `rounds` merges over the word table; returns the merge
    * ledger and the final symbolization. Each round persists its
    * re-tokenized table and drops the previous one — round r never
    * re-runs rounds 1..r−1's replaces.
    */
  def train(words0: DataFrame, rounds: Int): (Seq[Merge], DataFrame) = {
    var words = words0.persist()
    val merges = Seq.newBuilder[Merge]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = pairCounts(words)
        .orderBy(col("c").desc, col("x"), col("y"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (x, y, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(r, x, y, c)
        val next = words
          .withColumn("s", regexp_replace(col("s"),
            lit(java.util.regex.Pattern.quote(s"($x)($y)")),
            lit(java.util.regex.Matcher.quoteReplacement(s"($x$y)"))))
          .persist()
        next.count() // materialize before dropping the parent
        words.unpersist()
        words = next
      }
      r += 1
    }
    (merges.result(), words)
  }

  /** Tokenize with an ALREADY-LEARNED ledger — the inference half of
    * the trainer: each merge applies in ledger order as the same greedy
    * left-to-right replace, entirely MAP-ONLY (k codegen'd string
    * replaces fused into one projection; no shuffle, no collect) — the
    * 100 TB corpus-encode pass a trained vocab exists for. `words` must
    * carry the `(a)(b)(c)` form in column `s`; other columns pass
    * through untouched.
    */
  def applyMerges(words: DataFrame, merges: Seq[Merge]): DataFrame =
    merges.foldLeft(words) { (df, m) =>
      df.withColumn("s", regexp_replace(col("s"),
        lit(java.util.regex.Pattern.quote(s"(${m.x})(${m.y})")),
        lit(java.util.regex.Matcher.quoteReplacement(s"(${m.x}${m.y})"))))
    }
}
