package graft.ops

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** The events-timestamp normalization seam: the driver's `ts` encoding
  * has shifted across rounds (nanos-long, TIMESTAMP_NTZ); every variant
  * must land on identical micro-precision TimestampType. */
class TablesSpec extends AnyFunSuite with SparkFixture {

  test("normalizeTs maps nanos-long, micros-long and NTZ to the same instant") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val us = 1704103200123456L // 2024-01-01T10:00:00.123456Z in micros
    val asNanos = Seq(us * 1000L).toDF("ts")
    val asMicros = Seq(us).toDF("ts")
    val asNtz = asMicros.select(
      timestamp_micros($"ts").cast("timestamp_ntz").as("ts"))
    def out(df: org.apache.spark.sql.DataFrame): (String, Long) = {
      val n = Tables.normalizeTs(df)
      assert(n.schema("ts").dataType.typeName == "timestamp")
      val r = n.select(unix_micros($"ts")).collect().head.getLong(0)
      (n.schema("ts").dataType.typeName, r)
    }
    assert(out(asNanos) == ("timestamp", us))
    assert(out(asMicros) == ("timestamp", us))
    assert(out(asNtz) == ("timestamp", us))
  }
}
