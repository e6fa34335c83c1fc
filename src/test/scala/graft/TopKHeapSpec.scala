package graft

import org.apache.spark.sql.functions._
import graft.functions.TopKHeap

class TopKHeapSpec extends SparkTestBase {
  import spark.implicits._

  test("top-k heap agg is partition-shape independent and matches a window") {
    val rows = (1 to 2000).map { i =>
      (s"g${i % 3}", (i * 37 % 97).toDouble, i.toLong)
    }
    def run(parts: Int) =
      rows.toDF("g", "score", "id").repartition(parts)
        .groupBy(col("g"))
        .agg(TopKHeap.agg(4, col("score"), col("id"), col("id")).as("tk"))
        .select(col("g"), posexplode(col("tk")).as(Seq("pos", "e")))
        .select(col("g"), col("pos"), col("e.score"), col("e.tie"))
    val a = rowsOf(run(1))
    assert(a == rowsOf(run(17)))
    // window reference: same total order
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("score").desc, col("id").asc)
    val ref = rows.toDF("g", "score", "id")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)
      .select(col("g"), (col("rn") - 1).as("pos"), col("score"), col("id").as("tie"))
    assert(a == rowsOf(ref))
  }

  test("NaN scores rank first, matching Spark's ORDER BY score DESC") {
    // Regression: Ordering.by(e => (-e.score, ...)) sorted NaN last
    // (because -NaN is NaN), diverging from the window formulation.
    val rows = Seq(("a", Double.NaN, 1L), ("a", 5.0, 2L),
      ("a", Double.NaN, 3L), ("a", 7.0, 4L), ("a", 3.0, 5L))
    val heap = rows.toDF("g", "score", "id")
      .groupBy(col("g"))
      .agg(TopKHeap.agg(3, col("score"), col("id"), col("id")).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("g"), col("pos"), col("e.score"), col("e.tie"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("score").desc, col("id").asc)
    val ref = rows.toDF("g", "score", "id")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("g"), (col("rn") - 1).as("pos"), col("score"), col("id").as("tie"))
    assert(rowsOf(heap) == rowsOf(ref))
  }

  test("groups smaller than k emit all their rows, sorted") {
    val df = Seq(("a", 1.0, 1L), ("a", 3.0, 2L), ("b", 2.0, 3L)).toDF("g", "score", "id")
    val out = df.groupBy(col("g"))
      .agg(TopKHeap.agg(5, col("score"), col("id"), col("id")).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("g"), col("pos"), col("e.score"))
    assert(rowsOf(out) == Seq("a|0|3.0", "a|1|1.0", "b|0|2.0"))
  }
}
