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
  *  - larger graphs run distributed min-label propagation with POINTER
  *    JUMPING (comp ← comp(comp) shortcuts after every Pregel round), so
  *    rounds grow with log(diameter), not diameter — a million-hop
  *    duplicate chain (exactly what boilerplate corpora produce) resolves
  *    in ~tens of rounds, not a million.
  *
  * The distributed loop runs TO CONVERGENCE. `maxIter` is a loud-failure
  * guard, never a silent truncation: unconverged labels would split one
  * component into several and dedup would silently KEEP documents it
  * should drop, so exceeding the cap throws.
  */
object ConnectedComponents {

  val SmallGraphThreshold = 1000000L

  def components(
      pairs: DataFrame,
      maxIter: Int = 25,
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
      // localCheckpoint (not cache) per round: truncates the logical plan
      // so the lineage — and Catalyst analysis time — stays flat across
      // iterations instead of growing a join-tree per round
      val edges = p.unionAll(p.select(col("b").as("a"), col("a").as("b")))
        .localCheckpoint(true)
      var labels = edges.select(col("a").as("id")).distinct()
        .withColumn("comp", col("id")).localCheckpoint(true)
      var iter = 0
      var changed = 1L
      while (changed > 0) {
        if (iter >= maxIter)
          throw new IllegalStateException(
            s"connected components did not converge within $maxIter " +
              "rounds; with pointer jumping rounds grow with " +
              "log2(component diameter), so raise maxIter only for " +
              "astronomically deep graphs — do NOT ship unconverged labels")
        // Pregel step: comp ← min(comp, min over neighbours' comps)
        val prop = edges
          .join(labels.select(col("id").as("nbr"), col("comp").as("ncomp")),
            col("b") === col("nbr"))
          .groupBy(col("a").as("pid"))
          .agg(min(col("ncomp")).as("pcomp"))
        var next = labels.join(prop, col("id") === col("pid"), "left")
          .select(col("id"),
            least(col("comp"), coalesce(col("pcomp"), col("comp"))).as("comp"))
          .localCheckpoint(true)
        // pointer jumping ×2: comp ← min(comp, comp(comp)). comp values
        // are always node ids of the same component (invariant of both
        // steps), so the lookup is total and each application halves the
        // remaining label-chain depth.
        for (_ <- 1 to 2) {
          val j = next.select(col("id").as("jid"), col("comp").as("jcomp"))
          next = next.join(j, col("comp") === col("jid"), "left")
            .select(col("id"),
              least(col("comp"), coalesce(col("jcomp"), col("comp"))).as("comp"))
            .localCheckpoint(true)
        }
        // true fixpoint test: stop only when NOTHING moved this round
        changed = next
          .join(labels.select(col("id").as("oid"), col("comp").as("ocomp")),
            col("id") === col("oid"))
          .filter(col("comp") =!= col("ocomp")).count()
        labels.unpersist()
        labels = next
        iter += 1
      }
      labels
    }
  }
}
