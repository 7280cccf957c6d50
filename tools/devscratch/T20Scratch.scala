package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dev-only A/B profiler for the t20 plan (not part of the library;
  * run with `sbt "Test/runMain graft.T20Scratch"`). */
object T20Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (2 * 1024 * 1024).toString)
      .config("spark.shuffle.compress", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    ops.Tables.load(spark, dir)
    spark.range(1 << 20).groupBy(expr("id % 7")).count()
      .queryExecution.toRdd.count()

    def time(name: String)(df: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[perf] $name%-28s min ${ts.min}%6.3f s  (${ts.map(t => f"$t%.3f").mkString(", ")})")
    }

    def dbl(c: org.apache.spark.sql.Column) = c.cast("double")
    val big = DecimalType(38, 0)

    def narrowDocBg = ops.Tables.t(spark, dir, "documents")
      .select($"doc_id", split($"text", " ").as("ws"))
      .filter(size($"ws") >= 2)
      .select($"doc_id",
        explode(graft.functions.ShingleKernels.ngramCounts($"ws", 2)).as("gc"))
      .select($"doc_id", $"gc.g".as("bg"), $"gc.c".as("c"))

    time("docBg narrow")(narrowDocBg)

    def finish(joined: DataFrame): DataFrame =
      joined.groupBy($"doc_id")
        .agg(
          sum($"c").as("n_bigrams"),
          count(lit(1)).as("n_distinct_bigrams"),
          sum(when($"n_docs" === 1, 1L).otherwise(0L)).as("n_novel"),
          sum(($"c" * $"n_total").cast(big)).as("snum"),
          sum(($"c" * $"n_pref").cast(big)).as("sden"))
        .select($"doc_id", $"n_bigrams", $"n_distinct_bigrams", $"n_novel",
          (dbl($"n_novel") / $"n_distinct_bigrams").as("novelty_ratio"),
          round(dbl($"snum") / dbl($"sden"), 6).as("support_score"))
        .orderBy($"doc_id")

    // A: current shape — repartition + 2 lazy checkpoints
    def variantA: DataFrame = {
      val docBg = narrowDocBg.repartition($"bg").localCheckpoint(eager = false)
      val corpus = docBg.groupBy($"bg")
        .agg(sum($"c").as("n_total"), count(lit(1)).as("n_docs"))
        .withColumn("w1", substring_index($"bg", " ", 1))
        .localCheckpoint(eager = false)
      val prefix = corpus.groupBy($"w1").agg(sum($"n_total").as("n_pref"))
      finish(docBg.join(corpus, Seq("bg")).join(broadcast(prefix), Seq("w1")))
    }
    time("A repart+2ckpt")(variantA)

    // B: no checkpoints — recompute the narrow kernel on each consumer
    def variantB: DataFrame = {
      val docBg = narrowDocBg
      val corpus = docBg.groupBy($"bg")
        .agg(sum($"c").as("n_total"), count(lit(1)).as("n_docs"))
        .withColumn("w1", substring_index($"bg", " ", 1))
      val prefix = corpus.groupBy($"w1").agg(sum($"n_total").as("n_pref"))
      finish(docBg.join(corpus, Seq("bg")).join(broadcast(prefix), Seq("w1")))
    }
    time("B no-ckpt recompute")(variantB)

    // C: corpus checkpointed only (prefix + join reuse), docBg recomputed
    def variantC: DataFrame = {
      val docBg = narrowDocBg
      val corpus = docBg.groupBy($"bg")
        .agg(sum($"c").as("n_total"), count(lit(1)).as("n_docs"))
        .withColumn("w1", substring_index($"bg", " ", 1))
        .localCheckpoint(eager = false)
      val prefix = corpus.groupBy($"w1").agg(sum($"n_total").as("n_pref"))
      finish(docBg.join(corpus, Seq("bg")).join(broadcast(prefix), Seq("w1")))
    }
    time("C corpus-ckpt only")(variantC)

    // D: B with shuffle-hash join hint (skip both SMJ sorts)
    def variantD: DataFrame = {
      val docBg = narrowDocBg
      val corpus = docBg.groupBy($"bg")
        .agg(sum($"c").as("n_total"), count(lit(1)).as("n_docs"))
        .withColumn("w1", substring_index($"bg", " ", 1))
      val prefix = corpus.groupBy($"w1").agg(sum($"n_total").as("n_pref"))
      finish(docBg.hint("SHUFFLE_HASH").join(corpus, Seq("bg"))
        .join(broadcast(prefix), Seq("w1")))
    }
    time("D shuffle-hash join")(variantD)

    def fusedDocBg = ops.Tables.t(spark, dir, "documents")
      .select($"doc_id",
        explode(graft.functions.ShingleKernels.ngramCountsText($"text", 2)).as("gc"))
      .select($"doc_id", $"gc.g".as("bg"), $"gc.c".as("c"))

    println(s"[perf] scan partitions: ${ops.Tables.t(spark, dir, "documents").rdd.getNumPartitions}")
    time("fused docBg narrow")(fusedDocBg)

    def wideDocBg = ops.Tables.t(spark, dir, "documents")
      .repartition(32)
      .select($"doc_id",
        explode(graft.functions.ShingleKernels.ngramCountsText($"text", 2)).as("gc"))
      .select($"doc_id", $"gc.g".as("bg"), $"gc.c".as("c"))

    time("wide fused docBg")(wideDocBg)

    // E: fused kernel, D join shape
    def variantE(src: => DataFrame): DataFrame = {
      val docBg = src
      val corpus = docBg.groupBy($"bg")
        .agg(sum($"c").as("n_total"), count(lit(1)).as("n_docs"))
        .withColumn("w1", substring_index($"bg", " ", 1))
      val prefix = corpus.groupBy($"w1").agg(sum($"n_total").as("n_pref"))
      finish(docBg.join(corpus.hint("SHUFFLE_HASH"), Seq("bg"))
        .join(broadcast(prefix), Seq("w1")))
    }
    time("E fused corpus-hash")(variantE(fusedDocBg))
    time("F wide fused corpus-hash")(variantE(wideDocBg))

    // t12 shapes
    def t12old = ops.Tables.t(spark, dir, "documents")
      .select($"doc_id", split($"text", " ").as("ws"))
      .filter(size($"ws") >= 3)
      .select(explode(graft.functions.ShingleKernels.ngramCounts($"ws", 3)).as("gc"))
      .select($"gc.g".as("trigram"), $"gc.c".as("c"))
      .groupBy($"trigram")
      .agg(sum($"c").as("n"), count(lit(1)).as("n_docs"))
      .orderBy($"n".desc, $"trigram").limit(20)
    time("t12 current")(t12old)

    def t12fused = ops.Tables.t(spark, dir, "documents")
      .select(explode(graft.functions.ShingleKernels.ngramCountsText($"text", 3)).as("gc"))
      .select($"gc.g".as("trigram"), $"gc.c".as("c"))
      .groupBy($"trigram")
      .agg(sum($"c").as("n"), count(lit(1)).as("n_docs"))
      .orderBy($"n".desc, $"trigram").limit(20)
    time("t12 fused")(t12fused)

    def t12wide = ops.Tables.t(spark, dir, "documents")
      .repartition(32)
      .select(explode(graft.functions.ShingleKernels.ngramCountsText($"text", 3)).as("gc"))
      .select($"gc.g".as("trigram"), $"gc.c".as("c"))
      .groupBy($"trigram")
      .agg(sum($"c").as("n"), count(lit(1)).as("n_docs"))
      .orderBy($"n".desc, $"trigram").limit(20)
    time("t12 wide fused")(t12wide)

    spark.stop()
  }
}
