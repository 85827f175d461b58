package graft

import graft.queries.Cdc
import graft.txn.{SnapshotReader, TxnLog}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** APPLY CHANGES replay invariants over the 6-version keyed CDC fixture
  * (inserts, a COW update emitting r+c pairs, a DV delete, two
  * consecutive insert-only versions):
  *
  *  - batch-boundary INVARIANCE: replaying one version per micro-batch
  *    and replaying the whole stream in one batch reach the same state;
  *  - keyed collapse: a single-batch keyed replay lands in exactly TWO
  *    commits (one keyed DV delete + one append) for six source versions;
  *  - full-row replay agrees (the fixture is duplicate-free) and batches
  *    consecutive insert-only versions into one commit.
  */
class ApplyChangesSpec extends AnyFunSuite {
  import SparkTestSession._

  private def replay(
      keyCols: Seq[String], versionsPerTrigger: Option[Int]): String = {
    val src = Cdc.buildKeyedFixture(spark, sf)
    val dst = java.nio.file.Files.createTempDirectory("ac_dst").toString
    new java.io.File(dst).delete()
    val reader = spark.readStream.format("graft.sources.GraftCdc")
      .option("tablePath", src)
      .option("startingVersion", "0")
      .option("includeHistory", "true")
    versionsPerTrigger.foreach(n =>
      reader.option("maxVersionsPerTrigger", n.toString))
    val q = reader.load()
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.streaming.ApplyChanges.applyBatch(spark, b, dst, keyCols)
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ac_ck").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    dst
  }

  private def state(dst: String): Seq[(Long, String, Long)] =
    SnapshotReader.read(spark, dst)
      .select(col("event_id"), col("event_type"), col("cents"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq.sorted

  private def commits(dst: String): Int =
    new TxnLog(dst, spark.sessionState.newHadoopConf()).versions().size

  test("keyed replay is batch-boundary invariant and collapses to 2 commits") {
    val oneShot = replay(Seq("event_id"), versionsPerTrigger = None)
    val perVersion = replay(Seq("event_id"), versionsPerTrigger = Some(1))
    val a = state(oneShot)
    assert(a.nonEmpty)
    assert(a == state(perVersion),
      "final state must not depend on micro-batch boundaries")
    // fresh target + single batch: the delete phase is skipped entirely
    // (nothing exists to delete) and six source versions collapse to ONE
    // append commit
    assert(commits(oneShot) == 1,
      s"six source versions must collapse to a single append, got " +
        s"${commits(oneShot)} commits")
    // sanity on content: deleted keys gone, updated keys bumped
    val byId = a.map(t => t._1 -> t._3).toMap
    assert(!byId.keySet.exists(id => id % 9 == 0 && id % 3 == 0),
      "v3's DV-deleted keys must not survive")
    assert(byId.keySet.filter(_ % 6 == 0).forall(id => byId(id) >= 1000L),
      "v2's update must be reflected")
  }

  test("full-row replay agrees and batches insert-only runs") {
    val keyed = replay(Seq("event_id"), versionsPerTrigger = None)
    val fullRow = replay(Seq.empty, versionsPerTrigger = None)
    assert(state(fullRow) == state(keyed))
    // v0,v1 batch; v2 delete; v2 inserts flush at v3; v3 delete;
    // v3(empty)+v4+v5 inserts batch -> 5 commits, not 7
    assert(commits(fullRow) == 5,
      s"insert-only runs must batch, got ${commits(fullRow)} commits")
  }
}
