package graft.tools
import org.apache.spark.sql.SparkSession
object BenchQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    for (q <- Seq("q46_minhash_lsh", "q47_simhash", "q45_ngram_jaccard", "q50_cosine_topk", "q51_embedding_neardup")) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, dir).count()
      println(f"[benchq] $q: ${(System.nanoTime()-t0)/1e9}%.1f s ($n rows)")
    }
    spark.stop()
  }
}
