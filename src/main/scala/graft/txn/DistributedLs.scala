package graft.txn

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.SerializableConfiguration

/** Distributed recursive parquet-file discovery shared by CONVERT and
  * COPY INTO: list the tree breadth-first, one cluster job per LEVEL,
  * re-parallelizing the discovered subdirectory frontier each round —
  * so a skewed lake (a million files under ONE top-level directory, or
  * a deep date-partition chain) still fans out, where a single
  * one-task-per-top-level-dir walk would serialize the whole subtree
  * through one task. Once the frontier is wide enough to keep the
  * cluster busy, the remainder walks recursively inside tasks (one job,
  * no more per-level barriers).
  *
  * Driver-side filesystem work is ZERO listStatus calls — every level
  * lists in tasks (the vacuum orphan-sweep placement, pinned by
  * RemoteFsSpec's counting mockfs); only entry metadata reaches the
  * driver, the same cardinality the resulting commit must hold anyway.
  */
private[graft] object DistributedLs {

  /** One discovered entry. For files, `uriStr`/`pathStr` are the fully
    * QUALIFIED forms (`pathStr` is the Hadoop Path rendering — no
    * percent-escaping — for re-opening; `uriStr` the URI rendering for
    * relativize/idempotence keys). Directories appear ONLY when the
    * `descend` predicate refused them (e.g. hive `col=value` dirs a
    * caller must surface rather than enter).
    */
  final case class Entry(
      isDir: Boolean,
      name: String,
      pathStr: String,
      uriStr: String,
      size: Long,
      mtime: Long)

  /** Frontier width at which per-level jobs stop and one recursive
    * in-task walk finishes the tree.
    */
  private val WideEnough = 64

  private def keep(name: String): Boolean =
    !name.startsWith("_") && !name.startsWith(".")

  /** All `.parquet` files under `root` (recursively) plus every
    * directory `descend` refused to enter. Hidden (`_`/`.`) names are
    * skipped at every level.
    */
  def parquetFiles(
      spark: SparkSession,
      conf: Configuration,
      root: String,
      descend: String => Boolean = _ => true): Seq[Entry] = {
    val serConf = new SerializableConfiguration(conf)
    val out = scala.collection.mutable.ArrayBuffer.empty[Entry]
    var frontier: Seq[String] = Seq(root)

    def statEntry(dfs: org.apache.hadoop.fs.FileSystem,
        st: org.apache.hadoop.fs.FileStatus): Entry = {
      val q = dfs.makeQualified(st.getPath)
      Entry(st.isDirectory, st.getPath.getName, q.toString,
        q.toUri.toString, st.getLen, st.getModificationTime)
    }

    // breadth-first: one job per level until the frontier is wide
    while (frontier.nonEmpty && frontier.size < WideEnough) {
      val level = spark.sparkContext
        .parallelize(frontier, math.max(1, frontier.size))
        .flatMap { d =>
          val p = new org.apache.hadoop.fs.Path(d)
          val dfs = p.getFileSystem(serConf.value)
          dfs.listStatus(p).iterator
            .filter(st => keep(st.getPath.getName))
            .map(st => statEntry(dfs, st))
        }.collect()
      frontier = level.collect {
        case e if e.isDir && descend(e.name) => e.pathStr
      }.toSeq
      out ++= level.iterator.filter(e =>
        (e.isDir && !descend(e.name)) ||
          (!e.isDir && e.name.endsWith(".parquet")))
    }

    // wide frontier: finish with one recursive walk task per directory
    if (frontier.nonEmpty)
      out ++= spark.sparkContext
        .parallelize(frontier, math.max(1, math.min(frontier.size, 64)))
        .flatMap { d =>
          val p = new org.apache.hadoop.fs.Path(d)
          val dfs = p.getFileSystem(serConf.value)
          val buf = scala.collection.mutable.ArrayBuffer.empty[Entry]
          def walk(x: org.apache.hadoop.fs.Path): Unit =
            dfs.listStatus(x).foreach { st =>
              val name = st.getPath.getName
              if (!keep(name)) ()
              else if (st.isDirectory) {
                if (descend(name)) walk(st.getPath)
                else buf += statEntry(dfs, st)
              } else if (name.endsWith(".parquet"))
                buf += statEntry(dfs, st)
            }
          walk(p)
          buf
        }.collect()

    out.toSeq
  }
}
