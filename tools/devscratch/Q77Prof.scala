package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev-only stage profiler for q77 (not registered; run by hand). */
object Q77Prof {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime
    val r = f
    println(f"  $label: ${(System.nanoTime - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("q77prof").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    import spark.implicits._
    val s = spark
    // warm
    graft.ops.Temporal.q77(spark, dir).collect()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    for (_ <- 1 to 2) {
      val delays = Seq(60L, 600L, 3600L, 86400L)
      val ev = Tables.t(s, dir, "events")
        .select(($"user_id" % 8).as("part"),
          unix_micros($"ts").as("tsu"), $"event_id")
      val keys = Seq($"part".asc, $"tsu".asc, $"event_id".asc)
      val nPids = math.max(1, s.sparkContext.defaultParallelism)
      val ranged = t("repartitionByRange build") {
        ev.repartitionByRange(nPids, keys: _*)
          .withColumn("__pid", spark_partition_id())
          .localCheckpoint(eager = false)
      }
      val cells = t("cells collect") {
        ranged.groupBy($"__pid", $"part")
          .agg(count(lit(1)).as("n"))
          .orderBy($"__pid", $"part").collect()
      }
      var cum = 0L
      val pidOff = scala.collection.mutable.LinkedHashMap.empty[Int, Long]
      val partOff = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
      cells.foreach { r =>
        val pid = r.getInt(0); val part = r.getLong(1)
        if (!pidOff.contains(pid)) pidOff(pid) = cum
        if (!partOff.contains(part)) partOff(part) = cum
        cum += r.getLong(2)
      }
      val wPid = Window.partitionBy($"__pid").orderBy(keys: _*)
      val seqd = ranged
        .withColumn("seq",
          row_number().over(wPid).cast(org.apache.spark.sql.types.LongType)
            + element_at(typedLit(pidOff.toMap), $"__pid")
            - element_at(typedLit(partOff.toMap), $"part"))
        .select($"part", $"tsu", $"seq")
      val roundAgg = seqd.groupBy($"seq")
        .agg(sort_array(collect_list(struct($"part", $"tsu"))).as("evs"),
          max($"tsu").as("m"))
        .localCheckpoint(eager = false)
      t("roundAgg count") { roundAgg.count() }
      val rPrev = t("prefixMaxExclusive build") {
        Q.prefixMaxExclusive(roundAgg, Seq($"seq".asc), "m")
      }
      t("rPrev count") { rPrev.count() }
      val accInit = "struct(__pmax as cmax" +
        delays.map(d => s", 0L as c$d").mkString + ")"
      val accStep = "(acc, x) -> struct(greatest(acc.cmax, x.tsu) as cmax" +
        delays.map(d => s", acc.c$d + (case when greatest(acc.cmax, x.tsu)" +
          s" - x.tsu > ${d}000000L then 1L else 0L end) as c$d").mkString + ")"
      val perRound = rPrev.select(
        size($"evs").cast(org.apache.spark.sql.types.LongType).as("n"),
        expr(s"aggregate(evs, $accInit, $accStep)").as("cs"))
      val aggs = coalesce(sum($"n"), lit(0L)).as("n_events") +:
        delays.map(d =>
          coalesce(sum(col(s"cs.c$d")), lit(0L)).as(s"late_$d"))
      t("final agg") { perRound.agg(aggs.head, aggs.tail: _*).collect() }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      println("---")
    }
    spark.stop()
  }
}
