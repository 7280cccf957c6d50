package graft.functions

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Custom codegen expressions vs their interpreted HOF equivalents —
  * the results must be bit-identical (same sequential fold order). */
class ExpressionsSpec extends AnyFunSuite with SparkFixture {

  test("DotProduct equals the aggregate/zip_with fold, including null rows") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.1, -0.2), Array(0.3, 0.7)),
      (Array.empty[Double], Array.empty[Double]))
      .toDF("a", "b")
    val rows = df.select(
      DotProduct($"a", $"b").as("fast"),
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0),
        (acc, x) => acc + x).as("ref")).collect()
    rows.foreach(r => assert(
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1))))
    // null input -> null output
    val n = df.select(DotProduct(lit(null).cast("array<double>"), $"b"))
      .collect().head
    assert(n.isNullAt(0))
  }

  test("RollingHash equals the split/ascii fold") {
    val s = spark
    import s.implicits._
    val df = Seq("hello world", "", "a", "Zürich 🙂 mixed", "x y z").toDF("t")
    val rows = df.select(
      RollingHash($"t", 31L).as("fast"),
      aggregate(
        filter(split($"t", ""), ch => length(ch) > 0),
        lit(0L),
        (acc, ch) => (acc * 31L + ascii(ch)) % 1000000007L).as("ref"),
      $"t").collect()
    rows.foreach { r =>
      // the HOF form uses Spark's ascii() (first UTF-16 code unit), the
      // expression iterates code points — identical for BMP text, which
      // is what the oracles require; skip the emoji row for the HOF ref
      if (!r.getString(2).exists(Character.isSurrogate))
        assert(r.getLong(0) == r.getLong(1), s"mismatch for '${r.getString(2)}'")
    }
  }

  test("MinHashAgg equals the 64-min-column aggregation") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 17L), (1L, 9999L), (1L, 123456789L), (2L, 42L))
      .toDF("g", "h")
    val viaAgg = df.groupBy($"g").agg(MinHashAgg($"h", 64).as("sigs"))
      .orderBy($"g").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toVector))
    val sigCols = (0 until 64).map(j =>
      min(((lit(2L * j + 1)) * $"h" + lit(j.toLong)) % 1000000007L).as(s"s$j"))
    val viaCols = df.groupBy($"g").agg(sigCols.head, sigCols.tail: _*)
      .orderBy($"g").collect()
      .map(r => (r.getLong(0), (1 to 64).map(r.getLong(_)).toVector))
    assert(viaAgg.toSeq == viaCols.toSeq)
  }

  test("expressions survive whole-stage codegen over a real plan") {
    val s = spark
    import s.implicits._
    val df = s.range(1000)
      .select($"id", concat(lit("doc"), $"id").as("t"),
        array($"id".cast("double"), lit(2.0)).as("v"))
      .select(RollingHash($"t", 37L).as("h"), DotProduct($"v", $"v").as("d"))
      .agg(sum($"h"), sum($"d"))
    val row = df.collect().head
    assert(row.getLong(0) > 0)
    assert(row.getDouble(1) > 0)
  }
}
