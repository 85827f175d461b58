package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-vector operators (SURVEY.md §2.9 similarity search): cosine
  * math over ArrayType columns via higher-order functions (codegen'd, no
  * UDFs), plus a sign-random-projection LSH bucketing that keeps
  * near-duplicate detection and ANN search linear at scale — candidate
  * pairs are generated per-bucket, never via an O(n²) cross join.
  */
object EmbeddingOps {

  /** list<float> → array<double> for deterministic double-precision math. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Codegen'd dot product (graft.functions.DotProduct) — sequential
    * left-to-right accumulation, same order as the interpreted
    * formulation and DuckDB's, so oracle determinism is preserved.
    */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExprs.dot(a, b)

  def norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Sign-random-projection bucket id over `bits` pseudo-random
    * hyperplanes. Hyperplane j's k-th component is ±1 derived from
    * xxhash64(j*1024 + k) — deterministic, seedable, and computed inline in
    * Catalyst so the whole bucketing stays in codegen. Positive scaling of
    * a vector never changes its signs, so exact/scaled duplicates always
    * land in the same bucket (recall 1.0 for them by construction).
    */
  def lshBucket(v: Column, bits: Int): Column =
    aggregate(
      transform(sequence(lit(0), lit(bits - 1)), j => {
        val signedSum = aggregate(
          zip_with(v, sequence(lit(0), size(v) - 1), (x, k) =>
            when(xxhash64(j * 1024 + k).bitwiseAND(1) === 1, x).otherwise(-x)),
          lit(0.0), (acc, x) => acc + x)
        when(signedSum > 0, 1L).otherwise(0L)
      }),
      lit(0L), (acc, bit) => acc * 2 + bit)

  /** embeddings ∪ positively-scaled copies (vec_id+100000, ×1.01) of every
    * 10th vector — cosine-1.0 planted near-dups, mirrored in SQL below.
    */
  def nearDupCorpus(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    e.unionAll(
      Tables.load(spark, dir, "embeddings")
        .filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 100000).as("vec_id"),
          transform(toDouble(col("embedding")), x => x * 1.01).as("v")))
  }

  /** SQL mirror of [[nearDupCorpus]] for DuckDB oracles. */
  val nearDupCorpusSql: String =
    """SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      |UNION ALL
      |SELECT vec_id + 100000 AS vec_id,
      |  list_transform(CAST(embedding AS DOUBLE[]), x -> x * 1.01) AS v
      |FROM embeddings WHERE vec_id % 10 = 0""".stripMargin
}
