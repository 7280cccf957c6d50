package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the inverted-index pair substrate. */
object PairScratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (2 * 1024 * 1024).toString)
      .config("spark.shuffle.compress", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        (4 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    Tables.load(spark, dir)
    spark.range(1 << 20).groupBy(expr("id % 7")).count()
      .queryExecution.toRdd.count()

    def time(name: String)(df: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[perf] $name%-28s min ${ts.min}%6.3f s (${ts.map(t => f"$t%.3f").mkString(", ")})")
    }

    // stage-by-stage (fresh lineage each timing — no cross-reuse)
    time("1 shingleArrays")(Dedup.shinglesOfDocs(Tables.t(spark, dir, "documents")))
    time("2 postings")(Dedup.postings(
      Dedup.shinglesOfDocs(Tables.t(spark, dir, "documents")), 1000L))
    time("3 pairStats")(Dedup.pairStats(
      Dedup.shinglesOfDocs(Tables.t(spark, dir, "documents"))))
    time("4 d02 full")(Dedup.d02(spark, dir))
    spark.stop()
  }
}
