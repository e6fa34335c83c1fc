package graft

import java.nio.file.Files
import graft.operators.Sinks

/** Partitioned sink: Hive-style layout, round-trip fidelity, and no
  * small-files explosion (≤1 file per partition directory after the
  * repartition).
  */
class SinksSpec extends SparkTestBase {

  test("writePartitioned round-trips and writes one file per partition dir") {
    val src = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val out = Files.createTempDirectory("graft_sink").toString
    Sinks.writePartitioned(src, out, Seq("l_returnflag"), sortCols = Seq("l_orderkey"))

    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.forall(_.startsWith("l_returnflag=")), dirs.mkString(", "))
    for (d <- dirs) {
      val files = new java.io.File(s"$out/$d").listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"$d has ${files.length} files")
    }
    val back = spark.read.parquet(out)
    assert(back.count() == src.count())
    // partition pruning: reading one partition touches one directory
    val one = back.filter(org.apache.spark.sql.functions.col("l_returnflag") === "R")
    assert(one.count() == src.filter("l_returnflag = 'R'").count())
  }
}
