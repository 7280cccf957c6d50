package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ports of the pandas idioms dbt Python models use, as window transforms
  * (SURVEY §2.F "Window/shift per key"): the reference's one Python model
  * (`customer_status_histories.py:17-18`) is
  * `df.groupby(k)[c].shift(±1)` — exactly `lag`/`lead` over a keyed
  * ordered window. A full-table pandas transform becomes a distributed
  * one-shuffle window pass; no `mapInPandas` needed for shift/cumsum
  * shapes. */
object PandasPort {

  /** `df.groupby(key)[col].shift(n)` — n>0 looks back (lag), n<0 looks
    * forward (lead), matching pandas sign conventions. */
  def shiftByGroup(df: DataFrame, key: String, orderCol: String,
      col_ : String, n: Int, as: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(orderCol))
    val shifted: Column =
      if (n >= 0) lag(col(col_), n).over(w) else lead(col(col_), -n).over(w)
    df.withColumn(as, shifted)
  }

  /** The reference Python model's exact shape: previous/next order
    * timestamp per customer. */
  def orderHistory(orders: DataFrame, key: String = "customer_id",
      ts: String = "ordered_at"): DataFrame =
    shiftByGroup(
      shiftByGroup(orders, key, ts, ts, 1, "previous_order_at"),
      key, ts, ts, -1, "next_order_at")

  /** `df.groupby(key)[col].cumsum()` over an ordering. */
  def cumsumByGroup(df: DataFrame, key: String, orderCol: String,
      col_ : String, as: String): DataFrame =
    df.withColumn(as, sum(col(col_)).over(
      Window.partitionBy(col(key)).orderBy(col(orderCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
}
