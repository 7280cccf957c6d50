package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

// temporary profiling harness — not part of the library
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", (2 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ops.Tables.load(spark, sfDir)
    val l = spark.table("lineitem")
    def time(name: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    import spark.implicits._
    def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 6))
    time("dec18_sums") {
      l.filter($"l_shipdate" <= to_timestamp(lit("2001-09-01 00:00:00")))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum(dec($"l_quantity")), sum(dec($"l_extendedprice")),
          sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount"))), count(lit(1)))
        .queryExecution.toRdd.count()
    }
    time("dbl_sums") {
      l.filter($"l_shipdate" <= to_timestamp(lit("2001-09-01 00:00:00")))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum($"l_quantity"), sum($"l_extendedprice"),
          sum($"l_extendedprice" * (lit(1) - $"l_discount")), count(lit(1)))
        .queryExecution.toRdd.count()
    }
    def dec8(c: org.apache.spark.sql.Column) = c.cast(DecimalType(8, 2))
    time("dec8_sums") {
      l.filter($"l_shipdate" <= to_timestamp(lit("2001-09-01 00:00:00")))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum(dec8($"l_quantity")), sum(dec8($"l_extendedprice")), count(lit(1)))
        .queryExecution.toRdd.count()
    }
    time("scan_only") {
      l.filter($"l_shipdate" <= to_timestamp(lit("2001-09-01 00:00:00")))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)))
        .queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
