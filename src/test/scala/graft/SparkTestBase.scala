package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole suite (session startup dominates
  * test wall time otherwise). Mirrors the harness confs: local[4], 4
  * shuffle partitions, UTC.
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  /** Deterministic multiset snapshot of a small DataFrame. */
  def rowsOf(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map {
      case null => "␀"
      case d: Double => d.toString
      case x => x.toString
    }.mkString("|")).toSeq.sorted
}
