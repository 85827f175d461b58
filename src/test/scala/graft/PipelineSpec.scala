package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the wave-4 pipeline operators (q79–q84).
  * Value-level equality is the DuckDB oracle's job; these pin the
  * properties a user relies on: conservation, determinism, coverage.
  */
class PipelineSpec extends AnyFunSuite {
  import SparkTestSession._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q79: dup_frac is (n_bigrams - n_distinct) / n_bigrams and flags agree") {
    val bad = q("q79_repetition_filter")
      .filter(
        abs(col("dup_frac") -
          (col("n_bigrams") - col("n_distinct")).cast("double") /
            col("n_bigrams")) > 1e-12 ||
          (col("flagged") =!= (col("dup_frac") >= 0.02)))
      .count()
    assert(bad == 0)
  }

  test("q79: covers every document exactly once") {
    val docs = Tables.load(spark, sf, "documents").count()
    val out = q("q79_repetition_filter")
    assert(out.count() == docs)
    assert(out.select("doc_id").distinct().count() == docs)
  }

  test("q80: dropped chunks equal total minus distinct chunk texts") {
    val agg = q("q80_chunk_dedup")
      .agg(sum("n_chunks").as("total"), sum("n_dropped").as("dropped"))
      .head()
    val chunks = Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        graft.operators.TextOps.tokens(col("text")).as("t"))
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0), size(col("t")) - 1, lit(10))).as("s"))
      .select(concat_ws(" ", slice(col("t"), col("s") + 1, lit(10))).as("chunk"))
    assert(agg.getLong(0) == chunks.count())
    assert(agg.getLong(0) - agg.getLong(1) == chunks.distinct().count())
  }

  test("q81: packing conserves tokens per source and bins are contiguous") {
    val out = q("q81_sequence_pack").cache()
    try {
      val perSource = out.groupBy("source")
        .agg(sum("seq_tokens").as("packed"),
          max("seq_id").as("max_seq"),
          count(lit(1)).as("n_seqs"))
      val truth = Tables.load(spark, sf, "documents")
        .groupBy("source")
        .agg(sum(size(graft.operators.TextOps.tokens(col("text"))))
          .as("actual"))
      // conservation: every token lands in exactly one bin
      assert(perSource.join(truth, "source")
        .filter(col("packed") =!= col("actual")).count() == 0)
      // bins 0..max_seq all present (cumulative cuts can't skip a bin)
      assert(perSource.filter(col("n_seqs") =!= col("max_seq") + 1)
        .count() == 0)
    } finally out.unpersist()
  }

  test("q82: kept within totals; rates land near their targets") {
    val rows = q("q82_mixture_sample").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (total, kept) = (r.getAs[Long]("total"), r.getAs[Long]("kept"))
      assert(kept >= 0 && kept <= total)
    }
    val en = rows.find(_.getAs[String]("lang") == "en").get
    assert(math.abs(en.getAs[Double]("kept_frac") - 0.9) < 0.1)
  }

  test("q83: a permutation — every doc once, positions contiguous per shard") {
    val out = q("q83_export_shuffle").cache()
    try {
      val docs = Tables.load(spark, sf, "documents").count()
      assert(out.count() == docs)
      assert(out.select("doc_id").distinct().count() == docs)
      val bad = out.groupBy("shard")
        .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"))
        .filter(col("mx") =!= col("n") || col("mn") =!= 1)
      assert(bad.count() == 0)
    } finally out.unpersist()
  }

  test("q86: fertility is 1.0 on pure word soup, > 1.0 on planted contacts") {
    val out = q("q86_bpe_tokens").cache()
    try {
      assert(out.filter(col("doc_id") % 5 =!= 0 &&
        col("fertility") =!= 1.0).count() == 0)
      assert(out.filter(col("doc_id") % 5 === 0 &&
        col("fertility") <= 1.0).count() == 0)
    } finally out.unpersist()
  }

  test("sampling and shuffling are deterministic: re-runs are identical") {
    // the selling point of hash-based membership over RNG — a re-run of
    // the same pipeline on the same data yields byte-identical splits
    for (name <- Seq("q82_mixture_sample", "q83_export_shuffle",
        "q81_sequence_pack")) {
      val a = q(name).collect().toSeq
      val b = q(name).collect().toSeq
      assert(a == b, s"$name must be deterministic across runs")
    }
  }

  test("q84: every benchmark doc self-flags; planted copies are caught") {
    val out = q("q84_decontaminate").cache()
    try {
      val flagged = out.select("doc_id").collect().map(_.getLong(0)).toSet
      val benchIds = Tables.load(spark, sf, "documents")
        .filter(col("doc_id") % 13 === 3)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(benchIds.subsetOf(flagged))
      // byte-exact copies of benchmark docs (id%91==42 → copied at +200000)
      val copies = benchIds.filter(_ % 7 == 0).map(_ + 200000L)
      assert(copies.nonEmpty && copies.subsetOf(flagged))
    } finally out.unpersist()
  }
}
