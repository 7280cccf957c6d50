package graft.engine

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** PandasPort window transforms vs hand-computed pandas semantics. */
class PandasPortSpec extends AnyFunSuite with SparkFixture {

  test("orderHistory matches groupby().shift(±1)") {
    val s = spark
    import s.implicits._
    val orders = Seq(
      (1L, "2024-01-01"), (1L, "2024-01-05"), (1L, "2024-01-09"),
      (2L, "2024-02-01")).toDF("customer_id", "ordered_at")
    val out = PandasPort.orderHistory(orders)
      .orderBy("customer_id", "ordered_at")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)), Option(r.getString(3))))
    assert(out.toSeq == Seq(
      (1L, "2024-01-01", None, Some("2024-01-05")),
      (1L, "2024-01-05", Some("2024-01-01"), Some("2024-01-09")),
      (1L, "2024-01-09", Some("2024-01-05"), None),
      (2L, "2024-02-01", None, None)))
  }

  test("cumsumByGroup matches groupby().cumsum()") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 1, 10.0), (1L, 2, 5.0), (2L, 1, 3.0))
      .toDF("k", "ord", "v")
    val out = PandasPort.cumsumByGroup(df, "k", "ord", "v", "cum")
      .orderBy("k", "ord")
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(out.toSeq == Seq((1L, 10.0), (1L, 15.0), (2L, 3.0)))
  }
}
