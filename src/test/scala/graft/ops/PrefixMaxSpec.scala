package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Q.prefixMax (the distributed running-max substrate behind q77's
  * event-time frontier) must be bit-identical to the single-window form —
  * `MAX(v) OVER (ORDER BY keys ROWS UNBOUNDED PRECEDING)` is the
  * executable spec — on every input shape: monotone, decreasing,
  * negative values, heavy duplicates, skewed partitioning, n smaller
  * than the partition count, and empty input. */
class PrefixMaxSpec extends AnyFunSuite with SparkFixture {

  private def check(rows: Seq[(Long, Long)]): Unit = {
    val s = spark
    import s.implicits._
    val df = rows.toDF("id", "v").repartition(5)
    val got = Q.prefixMax(df, Seq($"id".asc), "v")
      .select($"id", $"__pmax")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = Window.orderBy($"id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("m", max($"v").over(w))
      .select($"id", $"m")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, s"n=${rows.size}")
  }

  test("random values match the global-window running max") {
    val rnd = new scala.util.Random(7)
    check((1L to 101L).map(i => (i, rnd.nextInt(2000).toLong - 1000L)))
  }

  test("monotone increasing and strictly decreasing sequences") {
    check((1L to 40L).map(i => (i, i * 3)))
    check((1L to 40L).map(i => (i, 1000L - i * 7)))
  }

  test("heavy duplicates and negative plateaus") {
    check((1L to 60L).map(i => (i, (i % 4) - 2L)))
  }

  test("n smaller than the partition count; empty input") {
    check(Seq((1L, 5L), (2L, 3L)))
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id", "v")
    assert(Q.prefixMax(empty, Seq($"id"), "v").count() == 0L)
  }
}
