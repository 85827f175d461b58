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

  /** list<float> → array<double> for deterministic double-precision math.
    * Native element-wise Cast (codegen'd) — NOT transform(_.cast), whose
    * interpreted lambda costs ~µs/element (see perf playbook).
    */
  def toDouble(v: Column): Column = v.cast("array<double>")

  /** Codegen'd dot product (graft.functions.DotProduct) — sequential
    * left-to-right accumulation, same order as the interpreted
    * formulation and DuckDB's, so oracle determinism is preserved.
    */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExprs.dot(a, b)

  def norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Banded multi-table sign-LSH slots (compiled kernel — see
    * [[graft.functions.VectorExprs.signLshBands]]): `tables` bands of
    * `bits` hyperplanes, element t = (t << 32) | bucket. Candidates share
    * ANY slot. Scale-invariant: scaled duplicates collide in every band.
    */
  def lshBandSlots(v: Column, tables: Int, bits: Int): Column =
    graft.functions.VectorExprs.signLshBands(v, tables, bits)

  /** Corpus-adaptive band width: bits so that expected bucket occupancy
    * ≈ `occupancy` (bucket count grows linearly with n, so per-bucket
    * pair generation stays ~O(occupancy²·n/occupancy) = O(n) instead of
    * the O(n²/2^bits) a FIXED bucket space degrades to at scale).
    */
  def lshAutoBits(n: Long, occupancy: Int = 32): Int = {
    val raw = math.ceil(
      math.log(math.max(1.0, n.toDouble / occupancy)) / math.log(2.0)).toInt
    math.min(24, math.max(4, raw))
  }

  /** Symmetric int8 scalar quantization: per-vector scale = max|x|/127,
    * stored as (array<tinyint>, scale float) — 4× smaller at rest and on
    * the shuffle than float32, ~8× vs the double math frame; the dot of
    * two quantized vectors times both scales approximates the true dot
    * (SimilaritySpec measures the recall cost).
    */
  def quantize(v: Column): Column = {
    val scale = greatest(aggregate(v, lit(0.0d),
      (acc, x) => greatest(acc, abs(x))), lit(1e-12)) / 127.0d
    struct(
      transform(v, x => round(x / scale).cast("tinyint")).as("q"),
      scale.cast("float").as("scale"))
  }

  /** Approximate cosine from two quantized vectors: the per-vector
    * scales cancel in cosine, so this is the plain cosine of the int8
    * codes (native array cast feeds the compiled dot kernel; storage and
    * shuffle stay int8). The rounding is the only approximation.
    */
  def quantizedCosine(a: Column, b: Column): Column = {
    val da = a.getField("q").cast("array<double>")
    val db = b.getField("q").cast("array<double>")
    dot(da, db) / (sqrt(dot(da, da)) * sqrt(dot(db, db)))
  }

  /** Approximate dot: here the scales DO matter. */
  def quantizedDot(a: Column, b: Column): Column =
    dot(a.getField("q").cast("array<double>"),
      b.getField("q").cast("array<double>")) *
      a.getField("scale") * b.getField("scale")

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
