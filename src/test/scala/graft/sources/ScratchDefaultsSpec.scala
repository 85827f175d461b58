package graft.sources

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Scratch probe — delete before commit. */
class ScratchDefaultsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("probe: CREATE TABLE with DEFAULT + INSERT omitting the column") {
    val dir = java.nio.file.Files.createTempDirectory("defprobe").toString
    spark.conf.set("spark.sql.catalog.gdef", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdef.warehouse", dir)
    try {
      spark.sql(
        "CREATE TABLE gdef.default.t (id BIGINT, tag STRING DEFAULT 'x')")
      spark.sql("INSERT INTO gdef.default.t (id) VALUES (1)")
      spark.sql("INSERT INTO gdef.default.t VALUES (2, DEFAULT)")
      spark.sql("INSERT INTO gdef.default.t VALUES (3, 'y')")
      spark.table("gdef.default.t").orderBy("id").show()
      val got = spark.table("gdef.default.t").orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      println(s"GOT: $got")
      assert(got == Seq((1L, "x"), (2L, "x"), (3L, "y")))
    } finally {
      spark.conf.unset("spark.sql.catalog.gdef")
      spark.conf.unset("spark.sql.catalog.gdef.warehouse")
    }
  }
}
