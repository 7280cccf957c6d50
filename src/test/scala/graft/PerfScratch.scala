package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only micro-profiler for the dedup plans (not part of the library;
  * run with `sbt "Test/runMain graft.PerfScratch"`). */
object PerfScratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    ops.Tables.load(spark, dir)
    spark.range(1 << 20).groupBy(expr("id % 7")).count()
      .queryExecution.toRdd.count()

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.queryExecution.toRdd.count()
      println(f"[perf] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($n rows)")
    }

    val docs = ops.Tables.t(spark, dir, "documents")
    time("scan")(docs)
    val sh = docs
      .select($"doc_id", split($"text", " ").as("ws"))
      .filter(size($"ws") >= 3)
      .select($"doc_id", explode(array_distinct(expr(
        "transform(sequence(0, size(ws)-3), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))")))
        .as("s"))
    time("shingles")(sh)
    val shh = sh.withColumn("h", ops.TextAnalysis.rollingHash($"s"))
    time("shingles+hash")(shh)
    val sigCols = (0 until 64).map(j =>
      min(((lit(2L * j + 1)) * $"h" + lit(j.toLong)) % 1000000007L).as(s"sig$j"))
    time("sig64")(shh.groupBy($"doc_id").agg(sigCols.head, sigCols.tail: _*))
    val selfJoin = sh.as("x").join(sh.as("y"),
      col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
    time("selfjoin")(selfJoin)
    time("selfjoin+agg")(selfJoin
      .groupBy(col("x.doc_id"), col("y.doc_id")).agg(count(lit(1))))
    val selfJoinHinted = sh.as("x").hint("SHUFFLE_HASH").join(
      sh.as("y").hint("SHUFFLE_HASH"),
      col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
    time("selfjoin_shj")(selfJoinHinted)
    time("selfjoin_shj+agg")(selfJoinHinted
      .groupBy(col("x.doc_id"), col("y.doc_id")).agg(count(lit(1))))
    time("d01_first")(ops.Dedup.d01(spark, dir))
    time("d01_second")(ops.Dedup.d01(spark, dir))
    time("d02_full")(ops.Dedup.d02(spark, dir))
    time("d03_full")(ops.Dedup.d03(spark, dir))
    time("d04_full")(ops.Dedup.d04(spark, dir))
    spark.stop()
  }
}
