package graft

import graft.txn._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Model-based randomized DML: a SEEDED 30-op sequence of append /
  * DV delete / COW update / compact / restore against one table,
  * checked against a plain in-memory model AFTER EVERY OP, then a
  * full time-travel audit replaying EVERY committed version against
  * the model's history. Any divergence between the txn-log machinery
  * (row ids, deletion vectors over mixed histories, compaction over DV
  * files, restores across restores) and sequential semantics fails
  * here with the op trace — the cross-feature interactions no
  * single-feature spec exercises. Versions are read back from the LOG
  * after every op (an op with nothing to do legitimately commits
  * nothing), so the model history is keyed by real version numbers.
  */
class ModelCheckSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("30 seeded random DML ops match the model at every version") {
    val rnd = new scala.util.Random(20260816L)
    val dir =
      java.nio.file.Files.createTempDirectory("model_t").toString + "/t"
    val log = new TxnLog(dir, spark.sessionState.newHadoopConf())
    var nextId = 0L
    def fresh(n: Int): Seq[(Long, Long)] =
      (0 until n).map { _ =>
        val i = nextId; nextId += 1; (i, rnd.nextInt(100).toLong)
      }
    var ts = 1000L
    val init = fresh(20)
    TableWriter.write(spark, init.toDF("id", "v"), dir,
      version = 0L, commitTs = ts)
    var model: Map[Long, Long] = init.toMap
    // model state BY REAL VERSION NUMBER (ops that no-op commit nothing)
    val history = scala.collection.mutable.LinkedHashMap[Long, Map[Long, Long]](
      0L -> model)
    def latest: Long = log.latestVersion().get
    def stateAt(ver: Option[Long]): Seq[(Long, Long)] =
      SnapshotReader.read(spark, dir, ver)
        .select(col("id"), col("v")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    def check(op: String): Unit = {
      history(latest) = model
      // Seq compare, not Map: a duplicated row (the classic DV/rewrite
      // bug class) must fail as a length mismatch, not collapse away
      assert(stateAt(None) == model.toSeq.sorted,
        s"divergence after v$latest ($op)")
    }
    (1 to 30).foreach { _ =>
      ts += 1000
      val v = latest
      rnd.nextInt(6) match {
        case 0 | 1 =>
          val rows = fresh(5 + rnd.nextInt(10))
          TableWriter.appendRebasing(spark, rows.toDF("id", "v"), dir,
            commitTs = ts)
          model = model ++ rows
          check(s"append(${rows.size})")
        case 2 =>
          val m = 3 + rnd.nextInt(5); val r = rnd.nextInt(m)
          DeletionVectors.deleteWhere(spark, dir,
            pmod(col("id"), lit(m.toLong)) === r.toLong,
            version = v + 1, commitTs = ts)
          model = model.filter { case (id, _) => id % m != r }
          check(s"dvDelete(%$m==$r)")
        case 3 =>
          val m = 3 + rnd.nextInt(5); val r = rnd.nextInt(m)
          val add = rnd.nextInt(50).toLong
          TableWriter.updateWhere(spark, dir,
            pmod(col("id"), lit(m.toLong)) === r.toLong,
            Map("v" -> (col("v") + add)), version = v + 1, commitTs = ts)
          model = model.map { case (id, vv) =>
            id -> (if (id % m == r) vv + add else vv)
          }
          check(s"update(%$m==$r,+$add)")
        case 4 =>
          TableWriter.compact(spark, dir, version = v + 1, commitTs = ts,
            targetFiles = 2)
          check("compact")
        case 5 =>
          val versions = history.keys.toIndexedSeq
          val to = versions(rnd.nextInt(versions.size))
          TableWriter.restore(spark, dir, toVersion = to,
            version = v + 1, commitTs = ts)
          model = history(to)
          check(s"restore($to)")
      }
    }
    // full-history audit: EVERY committed version time-travels to the
    // model state recorded when it was the head
    history.foreach { case (ver, m) =>
      assert(stateAt(Some(ver)) == m.toSeq.sorted,
        s"time travel to v$ver diverged")
    }
  }

  test("25 seeded SQL row-level ops (merge-on-read default) match " +
      "the model") {
    val rnd = new scala.util.Random(77L)
    val wh = java.nio.file.Files.createTempDirectory("model_wh").toString
    spark.conf.set("spark.sql.catalog.mck",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.mck.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mck.default")
    spark.sql("DROP TABLE IF EXISTS mck.default.m")
    spark.sql("CREATE TABLE mck.default.m (id BIGINT, v BIGINT)")
    var nextId = 0L
    def fresh(n: Int): Seq[(Long, Long)] =
      (0 until n).map { _ =>
        val i = nextId; nextId += 1; (i, rnd.nextInt(100).toLong)
      }
    var model = Map.empty[Long, Long]
    def insert(rows: Seq[(Long, Long)]): Unit = {
      spark.sql("INSERT INTO mck.default.m VALUES " +
        rows.map { case (i, vv) => s"($i, $vv)" }.mkString(", "))
      model = model ++ rows
    }
    insert(fresh(15))
    def check(op: String): Unit = {
      val got = spark.sql("SELECT id, v FROM mck.default.m").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(got == model.toSeq.sorted, s"divergence after $op")
    }
    (1 to 25).foreach { _ =>
      rnd.nextInt(4) match {
        case 0 =>
          insert(fresh(3 + rnd.nextInt(5))); check("insert")
        case 1 =>
          val m = 3 + rnd.nextInt(4); val r = rnd.nextInt(m)
          spark.sql(s"DELETE FROM mck.default.m WHERE id % $m = $r")
          model = model.filter { case (id, _) => id % m != r }
          check(s"delete(%$m==$r)")
        case 2 =>
          val m = 3 + rnd.nextInt(4); val r = rnd.nextInt(m)
          val add = rnd.nextInt(50)
          spark.sql(
            s"UPDATE mck.default.m SET v = v + $add WHERE id % $m = $r")
          model = model.map { case (id, vv) =>
            id -> (if (id % m == r) vv + add else vv)
          }
          check(s"update(%$m==$r,+$add)")
        case 3 =>
          // MERGE: half the source updates (doubling v), half inserts
          val hits = model.keys.toSeq.sorted
            .take(2 + rnd.nextInt(3)).map(k => (k, model(k)))
          val news = fresh(2)
          val src = (hits ++ news)
            .map { case (i, vv) => s"($i, $vv)" }.mkString(", ")
          spark.sql(
            s"""MERGE INTO mck.default.m t
               |USING (SELECT * FROM VALUES $src AS x(id, v)) s
               |ON t.id = s.id
               |WHEN MATCHED THEN UPDATE SET v = t.v * 2
               |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)
               |""".stripMargin)
          model = model.map { case (id, vv) =>
            id -> (if (hits.exists(_._1 == id)) vv * 2 else vv)
          } ++ news
          check(s"merge(${hits.size}u+${news.size}i)")
      }
    }
    // the MoR default really engaged: some live file must carry a DV
    val t = new TxnLog(s"$wh/default/m",
      spark.sessionState.newHadoopConf())
    assert(t.snapshotLatest().files.exists(_.dv.isDefined) ||
      t.changes(0L).exists(_._2.exists {
        case a: AddFile => a.dv.isDefined
        case _ => false
      }), "expected deletion-vector commits under the MoR default")
  }

  test("20 seeded random DML ops under graft.optimizeWrite match the " +
      "model (the rebalance pass must not bend DML semantics)") {
    val rnd = new scala.util.Random(20260817L)
    val dir =
      java.nio.file.Files.createTempDirectory("model_ow").toString + "/t"
    val log = new TxnLog(dir, spark.sessionState.newHadoopConf())
    var nextId = 0L
    def fresh(n: Int): Seq[(Long, Long)] =
      (0 until n).map { _ =>
        val i = nextId; nextId += 1; (i, rnd.nextInt(100).toLong)
      }
    var ts = 1000L
    val init = fresh(20)
    TableWriter.write(spark, init.toDF("id", "v"), dir,
      version = 0L, commitTs = ts)
    TableWriter.setTableProperties(spark, dir,
      Map("graft.optimizeWrite" -> "true"), version = 1L, commitTs = 1500L)
    var model: Map[Long, Long] = init.toMap
    def latest: Long = log.latestVersion().get
    def state(): Seq[(Long, Long)] =
      SnapshotReader.read(spark, dir)
        .select(col("id"), col("v")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    def check(op: String): Unit =
      assert(state() == model.toSeq.sorted,
        s"divergence after v$latest ($op)")
    (1 to 20).foreach { _ =>
      ts += 1000
      val v = latest
      rnd.nextInt(5) match {
        case 0 | 1 =>
          // appends arrive as a many-sliver frame — exactly the shape
          // the rebalance bin-packs; content must be untouched
          val rows = fresh(5 + rnd.nextInt(10))
          TableWriter.appendRebasing(spark,
            rows.toDF("id", "v").repartition(8), dir, commitTs = ts)
          model = model ++ rows
          check(s"append(${rows.size})")
        case 2 =>
          val m = 3 + rnd.nextInt(5); val r = rnd.nextInt(m)
          DeletionVectors.deleteWhere(spark, dir,
            pmod(col("id"), lit(m.toLong)) === r.toLong,
            version = v + 1, commitTs = ts)
          model = model.filter { case (id, _) => id % m != r }
          check(s"dvDelete(%$m==$r)")
        case 3 =>
          val m = 3 + rnd.nextInt(5); val r = rnd.nextInt(m)
          val add = rnd.nextInt(50).toLong
          TableWriter.updateWhere(spark, dir,
            pmod(col("id"), lit(m.toLong)) === r.toLong,
            Map("v" -> (col("v") + add)), version = v + 1, commitTs = ts)
          model = model.map { case (id, vv) =>
            id -> (if (id % m == r) vv + add else vv)
          }
          check(s"update(%$m==$r,+$add)")
        case 4 =>
          TableWriter.compact(spark, dir, version = v + 1, commitTs = ts,
            targetFiles = 2)
          check("compact")
      }
    }
  }
}
