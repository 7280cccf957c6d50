package graft.ops

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB co-located-join story, CI-pinned: two tables bucketed by
  * the join key on the same bucket count join WITHOUT ANY EXCHANGE —
  * bucketing is how a production deployment of these operators
  * eliminates the fact-table shuffle for recurring joins (the write
  * pays the partitioning once; every subsequent join reads it back).
  * The same join over plain parquet shuffles both sides — asserted here
  * as the contrast, so a regression in either direction fails CI. */
class BucketedJoinSpec extends AnyFunSuite with SparkFixture {

  test("bucketed tables join with zero exchanges; plain parquet shuffles") {
    val s = spark
    import s.implicits._
    val big = (1L to 10000L).map(i => (i % 500, i)).toDF("k", "v")
    val dim = (0L until 500L).map(i => (i, s"d$i")).toDF("k", "name")
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      big.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("bj_big")
      dim.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("bj_dim")
      val bucketed = s.table("bj_big").join(s.table("bj_dim"), "k")
      bucketed.queryExecution.toRdd.count()
      val bp = bucketed.queryExecution.executedPlan.toString
      assert(!bp.contains("Exchange"),
        s"bucketed join must not shuffle:\n$bp")
      assert(bucketed.count() == 10000L)

      // contrast: the same data as plain (unbucketed) parquet shuffles
      big.write.mode("overwrite").saveAsTable("bj_big_plain")
      dim.write.mode("overwrite").saveAsTable("bj_dim_plain")
      val plain = s.table("bj_big_plain").join(s.table("bj_dim_plain"), "k")
      plain.queryExecution.toRdd.count()
      val pp = plain.queryExecution.executedPlan.toString
      assert(pp.contains("Exchange"),
        s"plain join unexpectedly shuffle-free (test is vacuous):\n$pp")
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      Seq("bj_big", "bj_dim", "bj_big_plain", "bj_dim_plain")
        .foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("bucket pruning: an equality filter on the bucket key reads one bucket") {
    val s = spark
    import s.implicits._
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // without an exchange-eliminating operator in the query, the planner
    // would fall back to a regular scan and skip bucket pruning
    val prevAuto = s.conf.get(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    s.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      (1L to 10000L).map(i => (i % 500, i)).toDF("k", "v")
        .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("bj_prune")
      val q = s.table("bj_prune").filter($"k" === 42L)
      // SelectedBucketsCount in the scan proves partition-level pruning:
      // 1 of 8 buckets is read, the rest are never opened
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("SelectedBucketsCount: 1 out of 8"),
        s"bucket pruning not applied:\n$p")
      assert(q.count() == 20L)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      s.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prevAuto)
      s.sql("DROP TABLE IF EXISTS bj_prune")
    }
  }
}
