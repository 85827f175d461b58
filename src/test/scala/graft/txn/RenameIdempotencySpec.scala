package graft.txn

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** The staged-file move must be idempotent under Spark task
  * retry/speculation: a re-executed move task whose first attempt
  * already renamed some files sees rename() return false with dest
  * present and src gone — that is SUCCESS, not an abort. Without this,
  * one transient task failure after a partial move fails the whole
  * otherwise-successful commit and orphans the already-renamed files
  * in the table tree (r15 ADVICE item).
  */
class RenameIdempotencySpec extends AnyFunSuite {

  private def fsAnd(dir: java.nio.file.Path) = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val p = new Path(dir.toUri.toString)
    (p.getFileSystem(conf), p)
  }

  test("first attempt: rename happens and reports true") {
    val dir = java.nio.file.Files.createTempDirectory("ren_idem")
    val (fs, root) = fsAnd(dir)
    val src = new Path(root, "staged/part-0.parquet")
    val dest = new Path(root, "table/part-0.parquet")
    fs.mkdirs(src.getParent); fs.mkdirs(dest.getParent)
    val out = fs.create(src); out.write(Array[Byte](1, 2, 3)); out.close()
    assert(TableWriter.renameIdempotent(fs, src, dest))
    assert(fs.exists(dest) && !fs.exists(src))
  }

  test("retry attempt: dest present + src gone is success (false), " +
      "and the caller's size comes from dest") {
    val dir = java.nio.file.Files.createTempDirectory("ren_idem2")
    val (fs, root) = fsAnd(dir)
    val src = new Path(root, "staged/part-1.parquet")
    val dest = new Path(root, "table/part-1.parquet")
    fs.mkdirs(src.getParent); fs.mkdirs(dest.getParent)
    // simulate "attempt 1 already moved it": dest exists, src does not
    val out = fs.create(dest); out.write(Array[Byte](9, 9, 9, 9)); out.close()
    assert(!TableWriter.renameIdempotent(fs, src, dest))
    assert(fs.getFileStatus(dest).getLen == 4L)
  }

  test("a genuinely failed move (neither src nor dest) still throws") {
    val dir = java.nio.file.Files.createTempDirectory("ren_idem3")
    val (fs, root) = fsAnd(dir)
    val src = new Path(root, "staged/part-2.parquet")
    val dest = new Path(root, "table/part-2.parquet")
    fs.mkdirs(dest.getParent)
    // rename of a missing src returns false on HDFS-style filesystems
    // (→ our IllegalStateException) but throws FileNotFoundException on
    // RawLocalFileSystem — either way the move fails LOUDLY, never
    // silently succeeds
    val e = intercept[Exception](TableWriter.renameIdempotent(fs, src, dest))
    assert(e.isInstanceOf[IllegalStateException] ||
      e.isInstanceOf[java.io.FileNotFoundException])
  }
}
// NOTE deliberately untested: "src AND dest both exist" — POSIX rename
// (RawLocalFileSystem) overwrites dest and returns true, while HDFS-style
// filesystems return false; dest names are unique per (version, index,
// attemptId), so the only writer that can own dest is a prior attempt of
// the same move, making both behaviors equivalent here.
