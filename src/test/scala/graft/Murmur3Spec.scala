package graft

import graft.functions.Murmur3X86
import org.scalatest.funsuite.AnyFunSuite

/** Pinned vectors for the reference-parity murmur3 x86 32 (seed 0 unless
  * stated). Cross-checked against an independent implementation and the
  * published smhasher vectors (seed-1 empty string = 0x514E28B7,
  * "abc" = 0xB3DD93FA).
  */
class Murmur3Spec extends AnyFunSuite {

  test("GraftExtensions exposes the kernels to SQL") {
    import SparkTestSession._
    graft.functions.GraftExtensions.install(spark)
    val r = spark.sql(
      """SELECT graft_murmur3('l_returnflag=R') AS h,
        |  graft_route('l_returnflag=R', 8) AS slot,
        |  graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d
        |""".stripMargin).collect()(0)
    assert(r.getInt(0) ==
      graft.functions.Murmur3X86.hashString("l_returnflag=R"))
    assert(r.getInt(1) ==
      graft.functions.Murmur3X86.partitionIndex("l_returnflag=R", 8))
    assert(r.getDouble(2) == 32.0)
    // the cluster path (spark.sql.extensions) uses the same builders
    assert(graft.functions.GraftExtensions.functions.map(_._1).toSet ==
      Set("graft_murmur3", "graft_route", "graft_dot",
        "graft_simhash", "graft_shingles", "graft_minhash"))
  }

  test("SQL sketch kernels agree with the DataFrame API") {
    import SparkTestSession._
    import org.apache.spark.sql.functions.col
    graft.functions.GraftExtensions.install(spark)
    val toks = "the quick brown fox jumps over the lazy dog".split(' ')
    val sqlRow = spark.sql(
      s"""SELECT graft_simhash(array(${toks.map("'" + _ + "'").mkString(",")})) AS sh,
         |  graft_minhash(graft_shingles(
         |    array(${toks.map("'" + _ + "'").mkString(",")}), 3), 32) AS mh
         |""".stripMargin).collect()(0)
    import spark.implicits._
    val dfRow = Seq(toks.toSeq).toDF("t")
      .select(
        graft.operators.TextOps.simhash64(col("t")).as("sh"),
        graft.operators.TextOps.minhashSignature(
          graft.operators.TextOps.hashedShingles(col("t"))).as("mh"))
      .collect()(0)
    assert(sqlRow.getLong(0) == dfRow.getLong(0))
    assert(sqlRow.getSeq[Long](1) == dfRow.getSeq[Long](1))
    // a non-literal shape parameter is a planning error, not silence
    intercept[Exception] {
      spark.sql("SELECT graft_shingles(array('a','b'), 1 + 2)").collect()
    }
  }

  test("published vectors") {
    assert(Murmur3X86.hashString("", 0) == 0)
    assert(Murmur3X86.hashString("", 1) == 0x514e28b7)
    assert(Murmur3X86.hashString("abc", 0) == 0xb3dd93fa)
  }

  test("pinned vectors (independent implementation)") {
    val expected = Map(
      "a" -> 1009084850,
      "ab" -> -1681926305,
      "abc" -> -1277324294,
      "abcd" -> 1139631978,
      "hello world" -> 1586663183,
      "l_returnflag=A" -> 2059156738,
      "l_returnflag=R" -> 982207208,
      "o_orderstatus=F,o_orderpriority=1-URGENT" -> 1694765989,
      "héllo" -> -1130389400)
    expected.foreach { case (s, h) =>
      assert(Murmur3X86.hashString(s) == h, s"vector '$s'")
    }
  }

  test("column expression matches the scala implementation (codegen path)") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val inputs = Seq("", "a", "l_returnflag=A", "héllo",
      "o_orderstatus=F,o_orderpriority=1-URGENT")
    val got = inputs.toDF("s")
      .select(Murmur3X86.murmur3_32(org.apache.spark.sql.functions.col("s")))
      .collect().map(_.getInt(0))
    assert(got.toSeq == inputs.map(Murmur3X86.hashString(_)))
  }

  test("route index is non-negative and matches reference formula") {
    val vals = Seq("l_returnflag=A", "l_returnflag=N", "l_returnflag=R", "")
    vals.foreach { v =>
      val idx = Murmur3X86.partitionIndex(v, 8)
      assert(idx >= 0 && idx < 8)
      assert(idx == (Murmur3X86.hashString(v) & Integer.MAX_VALUE) % 8)
    }
  }
}
