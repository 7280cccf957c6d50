package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The distributed ntile must be bit-identical to Spark's window ntile on
  * every input shape: uneven n % k, n < k, heavy ties on the ranking key,
  * empty input, and k = 1. The window form is the executable spec. */
class GlobalNtileSpec extends AnyFunSuite with SparkFixture {

  private def check(rows: Seq[(Long, Double)], k: Int): Unit = {
    val s = spark
    import s.implicits._
    val df = rows.toDF("doc_id", "ratio").repartition(3)
    val got = TextAnalysis.globalNtile(df, k, $"ratio", $"doc_id")
      .select($"doc_id", $"decile").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = df.withColumn("decile",
        ntile(k).over(Window.orderBy($"ratio", $"doc_id")))
      .select($"doc_id", $"decile").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == want, s"k=$k n=${rows.size}")
  }

  test("uneven buckets: n % k != 0") {
    val rnd = new scala.util.Random(7)
    check((1L to 23L).map(i => i -> rnd.nextDouble()), 10)
  }

  test("fewer rows than buckets: one row per bucket") {
    check(Seq(1L -> 0.5, 2L -> 0.1, 3L -> 0.9), 10)
  }

  test("heavy ties resolve by the doc_id tiebreak") {
    // all ratios equal: bucketing must follow doc_id order exactly
    check((1L to 17L).map(i => i -> 0.25), 4)
  }

  test("k = 1 puts everything in bucket 1 and exact multiples split evenly") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 20L).map(i => i -> rnd.nextDouble())
    check(rows, 1)
    check(rows, 5) // 20 % 5 == 0
  }

  test("empty input yields an empty frame with the decile column") {
    val s = spark
    import s.implicits._
    val out = TextAnalysis.globalNtile(
      Seq.empty[(Long, Double)].toDF("doc_id", "ratio"), 10, $"ratio", $"doc_id")
    assert(out.columns.contains("decile"))
    assert(out.count() == 0)
  }
}
