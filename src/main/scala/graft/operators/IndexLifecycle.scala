package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generation-directory lifecycle shared by the incremental ANN indexes
  * ([[IvfIndex]], [[PqIndex]]).
  *
  * An index root holds numbered generation directories `g0, g1, …`; the
  * ACTIVE generation is the highest-numbered one that carries a `meta`
  * directory. A (re)build writes every artifact — centroids/codebooks,
  * the corpus-sized payload, meta LAST — into a hidden staging directory
  * and then renames it to `g<n+1>`: one atomic-on-HDFS/POSIX rename is
  * the only visibility point, so a crash at ANY earlier step leaves the
  * old generation serving and a reader can never observe a torn index
  * (the r15 at-least-once crash window, closed). Consumed-batch markers
  * are written into the staging dir BEFORE the rename, so keyed-replay
  * idempotence survives a crash on either side of the swap.
  *
  * Retention: the previous generation is kept (a long-running search that
  * resolved it mid-retrain finishes against immutable files); older
  * generations and orphaned staging dirs are pruned at the next commit —
  * the VACUUM-retention contract applied to the index sidecar.
  */
private[graft] object IndexGen {

  private val GenName = "g(\\d+)".r

  def fsOf(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  /** (gen number, path) of every generation dir under `root`. */
  def genDirs(fs: FileSystem, root: String): Seq[(Long, Path)] = {
    val rp = new Path(root)
    if (!fs.exists(rp)) Seq.empty
    else fs.listStatus(rp).toSeq.filter(_.isDirectory).flatMap { st =>
      st.getPath.getName match {
        case GenName(n) => Some((n.toLong, st.getPath))
        case _ => None
      }
    }
  }

  /** The active generation: highest gen number whose `meta` exists.
    * meta is written last within staging, so every committed gen has it;
    * the check additionally shields against a hand-truncated dir.
    */
  def resolve(fs: FileSystem, root: String): Option[Path] =
    genDirs(fs, root).sortBy(-_._1)
      .find { case (_, p) => fs.exists(new Path(p, "meta")) }
      .map(_._2)

  def resolveOrFail(fs: FileSystem, root: String): Path =
    resolve(fs, root).getOrElse(throw new IllegalStateException(
      s"no built index generation under $root — run build() first"))

  def isBuilt(fs: FileSystem, root: String): Boolean =
    resolve(fs, root).isDefined

  /** Fresh hidden staging dir for a build/retrain in flight. */
  def staging(root: String): String =
    s"$root/.staging_${java.util.UUID.randomUUID().toString.take(8)}"

  /** Atomically publish `staging` as the next generation, then prune:
    * keep the new and the previous generation, drop older gens and any
    * orphaned staging dirs (a crashed retrain's leftovers).
    */
  def commit(fs: FileSystem, root: String, staging: String): Path = {
    val next = genDirs(fs, root).map(_._1).maxOption.getOrElse(-1L) + 1
    val dest = new Path(root, s"g$next")
    fs.mkdirs(new Path(root))
    if (!fs.rename(new Path(staging), dest))
      throw new IllegalStateException(
        s"could not publish index generation $dest (concurrent retrain?)")
    // retention = the two highest COMPLETE generations (current +
    // previous, for long-running readers); a meta-less junk dir must
    // not displace the real previous gen from the keep set — it gets
    // deleted as the incomplete debris it is
    val all = genDirs(fs, root)
    val keep = all.filter { case (_, p) => fs.exists(new Path(p, "meta")) }
      .map(_._1).sorted.takeRight(2).toSet
    all.filterNot { case (n, _) => keep(n) }
      .foreach { case (_, p) => fs.delete(p, true) }
    fs.listStatus(new Path(root)).toSeq
      .filter(_.getPath.getName.startsWith(".staging_"))
      .foreach(st => fs.delete(st.getPath, true))
    dest
  }

  /** Overwrite `<genDir>/meta` through a tmp dir + rename: the bookkeeping
    * rewrite every non-retrain refresh does must not leave the index
    * meta-less if it crashes mid-write — the window shrinks from "during
    * a Spark write job" to "between two filesystem metadata ops".
    */
  def writeMetaAtomic(spark: SparkSession, genDir: String,
      df: DataFrame): Unit = {
    val tmp = new Path(s"$genDir/.meta_tmp")
    val dest = new Path(s"$genDir/meta")
    val fs = tmp.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(tmp, true)
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    fs.delete(dest, true)
    if (!fs.rename(tmp, dest))
      throw new IllegalStateException(s"could not publish index meta $dest")
  }
}

/** The keyed-batch overlay store under `<gen>/<name>`: one `b<id>`
  * subdirectory per keyed refresh batch, plus `merged_<n>` fold dirs
  * produced by [[compact]]. Folding bounds the small-files growth the
  * overlay would otherwise accumulate between (rare, drift-gated)
  * retrains, and its cost is the OVERLAYS' size only — the corpus-sized
  * base is never rewritten (the LSM-ish tier above the base, vs an
  * OPTIMIZE that would rewrite 100 TB to absorb a few GB of batches).
  *
  * Crash safety of a fold, step by step:
  *  1. the merged rows are written to a hidden tmp dir together with a
  *     `_folded` manifest naming every absorbed dir;
  *  2. the tmp dir renames to `merged_<n>` — from this instant readers
  *     see the merged rows AND (via the manifest that rode inside the
  *     rename) stop reading the absorbed dirs: no loss, no duplication;
  *  3. per absorbed keyed dir: consumed-marker write, THEN delete — a
  *     replay of a folded batch is a no-op through every crash point
  *     (marker present, or dir still present and excluded ⇒ replay
  *     overwrite is invisible).
  */
private[graft] object BatchOverlays {

  private val MergedName = "merged_(\\d+)".r
  private val FoldedManifest = "_folded"

  /** Names absorbed by any merged tier (rows live in the tier now). */
  def foldedNames(fs: FileSystem, overlays: String): Set[String] = {
    val op = new Path(overlays)
    if (!fs.exists(op)) return Set.empty
    fs.listStatus(op).toSeq
      .filter(st => st.isDirectory && MergedName.matches(st.getPath.getName))
      .flatMap { st =>
        val mf = new Path(st.getPath, FoldedManifest)
        if (!fs.exists(mf)) Seq.empty
        else {
          val in = fs.open(mf)
          try scala.io.Source.fromInputStream(in, "UTF-8")
            .getLines().filter(_.nonEmpty).toList
          finally in.close()
        }
      }.toSet
  }

  /** Dirs a reader should union: keyed batches and merged tiers, minus
    * anything a tier absorbed, minus hidden in-flight dirs.
    */
  def activeDirs(fs: FileSystem, overlays: String): Seq[Path] = {
    val op = new Path(overlays)
    if (!fs.exists(op)) return Seq.empty
    val folded = foldedNames(fs, overlays)
    fs.listStatus(op).toSeq.filter(_.isDirectory).map(_.getPath)
      .filterNot(p => p.getName.startsWith(".") || folded(p.getName))
      .sortBy(_.getName)
  }

  /** Union of the active overlay dirs (None when there are none), read
    * with the caller's explicit schema — no per-dir footer inference.
    */
  def readActive(spark: SparkSession, overlays: String,
      schema: org.apache.spark.sql.types.StructType): Option[DataFrame] = {
    val fs = new Path(overlays)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val dirs = activeDirs(fs, overlays)
    if (dirs.isEmpty) None
    else Some(dirs.map(d => spark.read.schema(schema).parquet(d.toString))
      .reduce(_ unionByName _))
  }

  def count(fs: FileSystem, overlays: String): Int =
    activeDirs(fs, overlays).size

  /** Fold every active dir into one `merged_<n>` tier (see the crash
    * protocol above). `clusterBy` re-clusters the merged rows on the
    * index's physical layout column (IVF's hive `cell=`) so the tier
    * keeps the same pruning properties as the base.
    */
  def compact(spark: SparkSession, genDir: String, name: String,
      schema: org.apache.spark.sql.types.StructType,
      clusterBy: Option[String]): Unit = {
    val overlays = s"$genDir/$name"
    val fs = new Path(overlays)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // finish any crashed fold's step 3 first: a dir already named in a
    // tier's manifest is reader-invisible but still on disk (crash
    // between the tier rename and the marker/delete loop) — complete
    // its marker-then-delete so it cannot sit as an excluded zombie
    // that a keyed replay would keep rewriting invisibly
    if (fs.exists(new Path(overlays))) {
      val folded = foldedNames(fs, overlays)
      fs.listStatus(new Path(overlays)).toSeq.filter(_.isDirectory)
        .map(_.getPath).filter(p => folded(p.getName)).foreach { p =>
          if (p.getName.startsWith("b"))
            fs.mkdirs(new Path(s"$genDir/consumed_batches/${p.getName}"))
          fs.delete(p, true)
        }
    }
    val active = activeDirs(fs, overlays)
    if (active.size <= 1) return
    val df = active.map(d => spark.read.schema(schema).parquet(d.toString))
      .reduce(_ unionByName _)
    val seq = (fs.listStatus(new Path(overlays)).toSeq
      .map(_.getPath.getName)
      .collect { case MergedName(n) => n.toLong } :+ -1L).max + 1
    val tmp = new Path(overlays,
      s".merged_tmp_${java.util.UUID.randomUUID().toString.take(8)}")
    fs.delete(tmp, true)
    val clustered = clusterBy match {
      case Some(c) => df.repartition(col(c))
      case None => df
    }
    val w = clustered.write.mode("overwrite")
    (clusterBy match {
      case Some(c) => w.partitionBy(c)
      case None => w
    }).parquet(tmp.toString)
    val mf = fs.create(new Path(tmp, FoldedManifest), true)
    try mf.write(active.map(_.getName).mkString("\n").getBytes("UTF-8"))
    finally mf.close()
    val dest = new Path(overlays, s"merged_$seq")
    if (!fs.rename(tmp, dest))
      throw new IllegalStateException(s"could not publish overlay tier $dest")
    active.foreach { d =>
      // keyed dirs get a consumed marker (their rows live in the tier;
      // a replay must be a no-op); merged tiers never replay
      if (d.getName.startsWith("b"))
        fs.mkdirs(new Path(s"$genDir/consumed_batches/${d.getName}"))
      fs.delete(d, true)
    }
  }
}
