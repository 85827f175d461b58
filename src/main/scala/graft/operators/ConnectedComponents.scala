package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected pair list (doc_a, doc_b) →
  * (id, comp) with comp = min id in the component.
  *
  * Hybrid execution, the shape production dedup uses:
  *  - pair sets up to [[SmallGraphThreshold]] union-find on the driver
  *    (the pair list is OUTPUT-scale data — near-dup pairs, not the
  *    corpus — so this is a bounded collect, like IvfIndex's bounded
  *    sample, not a driver loop over table rows);
  *  - larger graphs run distributed min-label propagation, a driver
  *    loop of ≤ maxIter JOIN+MIN rounds (the Pregel shape: iteration
  *    count is component diameter, not data size).
  */
object ConnectedComponents {

  val SmallGraphThreshold = 1000000L

  def components(
      pairs: DataFrame,
      maxIter: Int = 10,
      smallThreshold: Long = SmallGraphThreshold): DataFrame = {
    val spark = pairs.sparkSession
    val p = pairs.select(col(pairs.columns(0)).cast("long").as("a"),
      col(pairs.columns(1)).cast("long").as("b")).cache()
    if (p.count() <= smallThreshold) {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) {
          val nxt = parent.getOrElse(c, c); parent(c) = r; c = nxt
        }
        r
      }
      p.collect().foreach { row =>
        val (ra, rb) = (find(row.getLong(0)), find(row.getLong(1)))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = parent.keySet ++ parent.values
      val comp = nodes.toSeq.map(x => (x, find(x)))
      // min-id canonicalization (find roots are already mins by
      // union-by-min above, but normalize defensively)
      val minOf = comp.groupBy(_._2).map { case (r, xs) =>
        r -> xs.map(_._1).min
      }
      import spark.implicits._
      comp.map { case (id, r) => (id, math.min(minOf(r), r)) }
        .toDF("id", "comp")
    } else {
      val edges = p.unionAll(p.select(col("b").as("a"), col("a").as("b")))
        .cache()
      var labels = edges.select(col("a").as("id")).distinct()
        .withColumn("comp", col("id")).cache()
      var iter = 0
      var changed = 1L
      while (changed > 0 && iter < maxIter) {
        val prop = edges
          .join(labels.select(col("id").as("nbr"), col("comp").as("ncomp")),
            col("b") === col("nbr"))
          .groupBy(col("a").as("pid"))
          .agg(min(col("ncomp")).as("pcomp"))
        val next = labels.join(prop, col("id") === col("pid"), "left")
          .select(col("id"),
            least(col("comp"), coalesce(col("pcomp"), col("comp"))).as("comp"),
            (col("pcomp") < col("comp")).as("chg"))
          .cache()
        changed = next.filter(col("chg")).count()
        labels.unpersist()
        labels = next.select(col("id"), col("comp")).cache()
        iter += 1
      }
      labels
    }
  }
}
