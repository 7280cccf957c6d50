package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 pair-substrate stress profiler (SURVEY §6): counts — not
  * times — how the d02 inverted-index and d03 LSH band-join candidate
  * spaces grow as the documents table scales 10x/40x/160x past sf0.1.
  * Timing comes from graft.Bench on the same dirs; this main answers the
  * structural question (linear vs quadratic candidate growth, and whether
  * the df≤1000 stop-shingle cut starts firing). Dev-only: lives in
  * tools/devscratch between runs, copied into src/main to execute.
  */
object StressProf {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq(
      "/root/testdata/sf0.1",
      "/tmp/scaledocs/n50000", "/tmp/scaledocs/n200000",
      "/tmp/scaledocs/n800000")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        (4 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    for (dir <- dirs) {
      val docs = Tables.t(spark, dir, "documents")
      val nDocs = docs.count()
      val arrs = Dedup.shinglesOfDocs(docs).localCheckpoint(eager = false)
      val nShingleInstances =
        arrs.select(sum(size($"arr"))).as[Long].head()
      // d02 substrate: the full posting-list index with the capped
      // collector, then the stop-shingle cut and pair enumeration
      val idx = Dedup.allPostings(arrs, Dedup.StopShingleDf)
        .localCheckpoint(eager = false)
      val idxStats = idx.select(
        count(lit(1)).as("n_postings"),
        sum(when(size($"ds") > Dedup.StopShingleDf, 1L).otherwise(0L))
          .as("n_hot"),
        max(size($"ds")).as("max_df"),
        sum(when(size($"ds") <= Dedup.StopShingleDf,
          expr("(CAST(size(ds) AS BIGINT) * (size(ds) - 1)) div 2"))
          .otherwise(0L)).as("cand_pairs_with_mult")).head()
      // distinct candidate pairs d02 actually aggregates over
      val d02Cands = Dedup.pairCounts(arrs, Dedup.StopShingleDf)
        .filter($"da" < $"db").count()
      // d03 substrate: LSH band-bucket join candidates, three variants —
      // the shipped 32x2 geometry, the steeper 16x4 geometry (d21's
      // middle sweep point), and 32x2 over the df-pruned shingle space
      // (hot boilerplate shingles removed from the sketch input)
      def bandCands(perDoc: org.apache.spark.sql.DataFrame, r: Int): Long = {
        val keys = (0 until 64 / r).map { b =>
          concat_ws(":",
            lit(b) +: (0 until r).map(k => element_at($"sigs", b * r + k + 1)): _*)
        }
        val bands = perDoc.select($"doc_id", explode(array(keys: _*)).as("key"))
        bands.as("a").hint("SHUFFLE_HASH")
          .join(bands.as("b").hint("SHUFFLE_HASH"),
            col("a.key") === col("b.key") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
          .distinct().count()
      }
      val perDoc = arrs.select($"doc_id",
        graft.functions.ShingleKernels.minHash64($"arr").as("sigs"))
      val d03Cands = bandCands(perDoc, 2)
      val d03R4Cands = bandCands(perDoc, 4)
      val hot = idx.filter(size($"ds") > Dedup.StopShingleDf)
        .select($"s").as[String].collect().sorted
      val prunedDoc = arrs.select($"doc_id",
        graft.functions.ShingleKernels.minHash64(
          array_except($"arr", lit(hot))).as("sigs"))
      val d03PrunedCands = bandCands(prunedDoc, 2)
      // d24 substrate: duplicated 10-gram types (df>=2)
      val g10 = docs.select($"doc_id",
          graft.functions.ShingleKernels.shinglesText($"text", 10).as("arr"))
        .filter(size($"arr") > 0)
        .select($"doc_id", explode($"arr").as("gram"))
      val d24Dup = g10.groupBy($"gram")
        .agg(countDistinct($"doc_id").as("df")).filter($"df" >= 2).count()
      println(s"""{"dir":"$dir","n_docs":$nDocs""" +
        s""","shingle_instances":$nShingleInstances""" +
        s""","n_postings":${idxStats.getLong(0)}""" +
        s""","n_hot_shingles":${idxStats.getLong(1)}""" +
        s""","max_df":${idxStats.getInt(2)}""" +
        s""","d02_cand_mult":${idxStats.getLong(3)}""" +
        s""","d02_cand_pairs":$d02Cands""" +
        s""","d03_cand_pairs":$d03Cands""" +
        s""","d03_r4_cand_pairs":$d03R4Cands""" +
        s""","d03_pruned_cand_pairs":$d03PrunedCands""" +
        s""","d24_dup_grams":$d24Dup}""")
      spark.sparkContext.getPersistentRDDs.values.foreach(
        _.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
