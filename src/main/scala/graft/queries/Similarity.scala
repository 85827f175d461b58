package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.EmbeddingOps._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity-search operator inventory (SURVEY.md §2.9) over the
  * embeddings table. Brute-force cosine is the SQL-verifiable baseline;
  * sign-random-projection LSH is the linear-at-scale path (Spark-only,
  * cross-checked against brute force in ScalaTest).
  *
  * Oracle outputs are rank-only (query_id, rank, neighbor_id) — ranking is
  * robust to last-ulp float differences between engines, unlike raw cosine
  * values.
  */
object Similarity {

  def defs: Seq[QueryDef] = Seq(
    // Brute-force cosine top-k: 20 query vectors × full table, top-5 each.
    QueryDef.sqlBacked(
      "q50_cosine_topk",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT * FROM e WHERE vec_id < 20),
        |s AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
        |        list_cosine_similarity(q.v, e.v) AS cos
        |      FROM q CROSS JOIN e WHERE q.vec_id <> e.vec_id),
        |r AS (SELECT query_id, neighbor_id,
        |        ROW_NUMBER() OVER (PARTITION BY query_id
        |          ORDER BY cos DESC, neighbor_id) AS rnk
        |      FROM s)
        |SELECT query_id, CAST(rnk AS INT) AS rnk, neighbor_id
        |FROM r WHERE rnk <= 5
        |ORDER BY query_id, rnk""".stripMargin) { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
        .withColumn("nrm", norm(col("v")))
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))
      broadcast(q).join(e, col("query_id") =!= col("vec_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          cosine(col("qv"), col("v"), col("qn"), col("nrm")).as("cos"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("query_id"), col("rnk"), col("neighbor_id"))
        .orderBy(col("query_id"), col("rnk"))
    },

    // Embedding-cosine near-dup, brute-force-complete baseline over the
    // planted corpus (scaled copies have cosine 1.0; the data's true max
    // cross-pair cosine is ≈0.51, so the 0.95 cut is unambiguous).
    QueryDef.sqlBacked(
      "q51_embedding_neardup",
      s"""WITH corpus AS ($nearDupCorpusSql)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
         |FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
         |WHERE list_cosine_similarity(a.v, b.v) >= 0.95
         |ORDER BY vec_a, vec_b""".stripMargin) { (s, dir) =>
      val c = nearDupCorpus(s, dir).withColumn("nrm", norm(col("v")))
      c.as("a").join(c.as("b"), col("a.vec_id") < col("b.vec_id"))
        .filter(cosine(col("a.v"), col("b.v"), col("a.nrm"), col("b.nrm")) >= 0.95)
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
        .orderBy(col("vec_a"), col("vec_b"))
    },

    // LSH-bucketed near-dup — the scale path: positively-scaled duplicates
    // provably share the bucket (sign projections are scale-invariant), so
    // recall on true near-dups is 1.0 while candidate generation is
    // per-bucket, not O(n²). Spark-only; spec asserts parity with q51.
    QueryDef.sparkOnly("q52_embedding_neardup_lsh") { (s, dir) =>
      val c = nearDupCorpus(s, dir)
        .withColumn("nrm", norm(col("v")))
        .withColumn("bucket", lshBucket(col("v"), 6))
      c.as("a").join(c.as("b"),
          col("a.bucket") === col("b.bucket") &&
            col("a.vec_id") < col("b.vec_id"))
        .filter(cosine(col("a.v"), col("b.v"), col("a.nrm"), col("b.nrm")) >= 0.95)
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
        .orderBy(col("vec_a"), col("vec_b"))
    },

    // IVF ANN top-k: coarse k-means quantizer (16 cells, fixed seed),
    // queries probe their 4 nearest cells — scans ~25% of the corpus per
    // query instead of 100%, the standard IVF recall/cost trade. On real
    // clustered embeddings recall concentrates sharply; on this synthetic
    // near-orthogonal data it tracks the scanned fraction (measured in
    // SimilaritySpec). Spark-only.
    QueryDef.sparkOnly("q54_ann_ivf_topk") { (s, dir) =>
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector
      val e = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
        .withColumn("nrm", norm(col("v")))
        .withColumn("features", array_to_vector(col("v")))
      val model = new KMeans().setK(16).setSeed(42)
        .setFeaturesCol("features").setPredictionCol("cell")
        .fit(e)
      val assigned = model.transform(e)
        .select(col("vec_id"), col("v"), col("nrm"), col("cell"))
      // cell centroids as a broadcastable frame
      val centroids = s.createDataFrame(
        model.clusterCenters.zipWithIndex.map { case (c, i) =>
          (i, c.toArray)
        }.toSeq).toDF("cell", "cv")
      val q = assigned.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
      // rank cells per query by centroid distance, probe the top 4
      val byDist = Window.partitionBy(col("query_id"))
        .orderBy(col("cdist"), col("cell"))
      val probed = broadcast(q).join(broadcast(centroids))
        .withColumn("cdist", -dot(col("qv"), col("cv")))
        .withColumn("cell_rank", row_number().over(byDist))
        .filter(col("cell_rank") <= 4)
        .select(col("query_id"), col("qv"), col("qn"), col("cell"))
      val byCos = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))
      probed.join(assigned, Seq("cell"))
        .filter(col("query_id") =!= col("vec_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          cosine(col("qv"), col("v"), col("qn"), col("nrm")).as("cos"))
        .withColumn("rnk", row_number().over(byCos))
        .filter(col("rnk") <= 5)
        .select(col("query_id"), col("rnk"), col("neighbor_id"), col("cos"))
        .orderBy(col("query_id"), col("rnk"))
    },

    // LSH-bucketed ANN top-k — approximate neighbors from the query's own
    // bucket only. Spark-only (approximation has no SQL-exact oracle).
    QueryDef.sparkOnly("q53_ann_lsh_topk") { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
        .withColumn("nrm", norm(col("v")))
        .withColumn("bucket", lshBucket(col("v"), 6))
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("nrm").as("qn"), col("bucket").as("qbucket"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))
      broadcast(q).join(e,
          col("qbucket") === col("bucket") && col("query_id") =!= col("vec_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          cosine(col("qv"), col("v"), col("qn"), col("nrm")).as("cos"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("query_id"), col("rnk"), col("neighbor_id"), col("cos"))
        .orderBy(col("query_id"), col("rnk"))
    }
  )
}
