package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Q.rankedPrefix (the distributed rank/prefix-sum substrate shared by
  * q53/t48/t49) must be bit-identical to the single-window form —
  * `row_number() / SUM(...) OVER (ORDER BY keys ROWS UNBOUNDED
  * PRECEDING)` is the executable spec — on every input shape: heavy key
  * ties, negative weights, multiple weight columns, descending keys,
  * skewed partitioning, n smaller than the partition count, and empty
  * input. */
class RankedPrefixSpec extends AnyFunSuite with SparkFixture {

  private def check(rows: Seq[(Long, Long, Long)], desc: Boolean): Unit = {
    val s = spark
    import s.implicits._
    val df = rows.toDF("id", "w1", "w2").repartition(5)
    val keys = if (desc) Seq($"w1".desc, $"id".asc) else Seq($"w1".asc, $"id".asc)
    val (got, n, totals) = Q.rankedPrefix(df, keys, Seq("w1", "w2"))
    val gotMap = got.select($"id", $"__rank", $"__cum_w1", $"__cum_w2")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val w = Window.orderBy(keys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wantMap = df
      .withColumn("r", row_number().over(Window.orderBy(keys: _*)).cast("long"))
      .withColumn("c1", sum($"w1").over(w))
      .withColumn("c2", sum($"w2").over(w))
      .select($"id", $"r", $"c1", $"c2")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(gotMap == wantMap, s"desc=$desc n=${rows.size}")
    assert(n == rows.size.toLong)
    assert(totals("w1") == rows.map(_._2).sum)
    assert(totals("w2") == rows.map(_._3).sum)
  }

  test("random weights, ascending keys") {
    val rnd = new scala.util.Random(11)
    check((1L to 97L).map(i => (i, rnd.nextInt(1000).toLong,
      rnd.nextInt(50).toLong)), desc = false)
  }

  test("descending keys with heavy ties resolve by the id tiebreak") {
    check((1L to 40L).map(i => (i, (i % 3) * 10L, 1L)), desc = true)
  }

  test("negative weights: prefix sums stay exact") {
    val rnd = new scala.util.Random(5)
    check((1L to 31L).map(i =>
      (i, rnd.nextInt(200).toLong - 100L, -i)), desc = false)
  }

  test("fewer rows than partitions") {
    check(Seq((7L, 3L, 1L), (2L, 9L, 2L), (5L, 3L, 3L)), desc = false)
  }

  test("empty input: zero rows, zero totals") {
    val s = spark
    import s.implicits._
    val df = Seq.empty[(Long, Long)].toDF("id", "w1")
    val (got, n, totals) = Q.rankedPrefix(df, Seq($"id".asc), Seq("w1"))
    assert(got.count() == 0 && n == 0L && totals("w1") == 0L)
  }
}
