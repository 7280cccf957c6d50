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
    // t06 decomposition: where does ~1s go on 5000 rows?
    val bgs = docs
      .select($"doc_id", split($"text", " ").as("ws"))
      .filter(size($"ws") >= 2)
      .select($"doc_id", expr(
        "transform(sequence(0, size(ws)-2), i -> concat_ws(' ', ws[i], ws[i+1]))")
        .as("bgs"))
    time("t06_bigrams")(bgs)
    val scored = bgs.select($"doc_id",
      size($"bgs").cast("long").as("n_bigrams"),
      graft.functions.MaxSortedRun(array_sort($"bgs")).as("top_bigram_n"))
    time("t06_scored")(scored)
    time("t06_sorted")(scored.orderBy($"doc_id"))
    for (_ <- 1 to 2) time("t06_full")(ops.TextAnalysis.t06(spark, dir))
    for (_ <- 1 to 2) time("t12_full")(ops.TextAnalysis.t12(spark, dir))
    // checkpoint-before-sort: does materializing the narrow pipeline once
    // beat the range-sampler's re-execution of it?
    for (_ <- 1 to 2)
      time("t06_ckpt_sort")(scored.localCheckpoint().orderBy($"doc_id"))
    for (_ <- 1 to 2)
      time("t13_full")(ops.TextAnalysis.t13(spark, dir))
    val t13body = ops.Tables.t(spark, dir, "events")
      .select($"event_id",
        ops.TextAnalysis.scrubPii($"props").as("props_scrubbed"),
        ops.TextAnalysis.redactionCount($"props").as("n_redactions"))
    for (_ <- 1 to 2)
      time("t13_ckpt_sort")(t13body.localCheckpoint().orderBy($"event_id"))
    spark.stop()
  }
}
