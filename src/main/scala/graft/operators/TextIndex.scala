package graft.operators

import graft.txn.{TableWriter, TxnLog}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PERSISTED shingle inverted index — the reusable, incrementally
  * maintained sibling of q149's per-query index: postings
  * (shingle-hash, doc_id) live in a graft table, so retrieval queries
  * join the index instead of re-shingling the corpus, and new documents
  * refresh the index by APPENDING only their own postings. At 100 TB
  * the difference is "shingle the whole corpus per query" versus "one
  * build + per-batch appends + an index-sized join per query" — the
  * [[graft.txn.BloomIndex]] economics applied to text retrieval.
  *
  * The refresh high-water is the index's own max(doc_id), answered
  * from per-file parquet stats by the DSv2 aggregate pushdown — no
  * data file opens to decide what is new. Shingles are 64-bit hashes
  * (q149's accepted premise: injective in practice; oracles recompute
  * with string shingles).
  */
object TextIndex {

  /** Reserved shingle hash marking a document with NO shingles (fewer
    * than 3 tokens): without it such a doc never enters the index, the
    * max(doc_id) high-water never passes it, and every refresh re-sees
    * it as new — an empty append per refresh, forever. Retrieval
    * filters the marker out, so it can never manufacture similarity.
    */
  val EmptyDocMarker: Long = Long.MinValue

  /** Distinct (doc_id, s) postings of a document frame; shingle-less
    * documents contribute their [[EmptyDocMarker]] row so the index
    * records them.
    */
  def postings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(concat(
        TextOps.hashedShingles(TextOps.tokens(col("text"))),
        when(size(TextOps.hashedShingles(TextOps.tokens(col("text")))) === 0,
          array(lit(EmptyDocMarker))).otherwise(array()))).as("s"))
      .distinct()

  /** Build the index table at `indexPath` (version 0) over `docs`. */
  def build(spark: SparkSession, docs: DataFrame, indexPath: String): Unit =
    TableWriter.write(spark, postings(docs), indexPath,
      version = 0L, commitTs = 1000L)

  /** Append postings of documents NEWER than the indexed high-water
    * (max doc_id already in the index — a stats-only aggregate).
    * Returns the number of newly indexed documents.
    */
  def refresh(spark: SparkSession, docs: DataFrame, indexPath: String): Long = {
    val hw = load(spark, indexPath).agg(max(col("doc_id"))).head() match {
      case r if r.isNullAt(0) => Long.MinValue
      case r                  => r.getLong(0)
    }
    val fresh = docs.filter(col("doc_id") > hw)
    val n = fresh.count()
    if (n > 0)
      TableWriter.append(spark, postings(fresh), indexPath,
        commitTs = System.currentTimeMillis())
    n
  }

  def load(spark: SparkSession, indexPath: String): DataFrame =
    spark.read.format("graft").option("tablePath", indexPath).load()

  /** Top-`k` similar documents per query doc, by shared distinct
    * shingles, through the PERSISTED index: the document-frequency cap
    * (SkewGuard economics: a stopword shingle must not fan out
    * quadratically) filters postings BEFORE the probe join, and only
    * the query docs' postings sit on the build side.
    */
  def similar(
      spark: SparkSession,
      indexPath: String,
      queryDocs: DataFrame, // (doc_id)
      dfCap: Int = 100,
      k: Int = 3): DataFrame = {
    val inv = load(spark, indexPath)
      .filter(col("s") =!= EmptyDocMarker)
    val keep = inv.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap).select(col("s"))
    val kept = inv.join(keep, "s")
    val qPost = kept.join(queryDocs.select(col("doc_id")), "doc_id")
      .select(col("doc_id").as("q_doc"), col("s"))
    val pairs = qPost
      .join(kept, "s")
      .filter(col("doc_id") =!= col("q_doc"))
      .groupBy(col("q_doc"), col("doc_id").as("match_doc"))
      .agg(count(lit(1)).as("shared"))
    val w = Window.partitionBy(col("q_doc"))
      .orderBy(col("shared").desc, col("match_doc"))
    pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_doc"), col("match_doc"), col("shared"))
  }

  /** Committed index versions (fixture guards). */
  def versions(spark: SparkSession, indexPath: String): Seq[Long] =
    new TxnLog(indexPath, spark.sessionState.newHadoopConf()).versions()
}
