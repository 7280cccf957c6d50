package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.functions.{concat, lit, when}
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join handling, CI-pinned: a join keyed on a pathologically
  * skewed column is re-planned at runtime — the hot key's partition is
  * split across tasks (the `skew=true` sort-merge join) instead of
  * pinning one reducer. This is the runtime complement to the manual
  * salting ops (q21/q29) and the q44 skew meter: at 100 TB you salt
  * what you can predict and let AQE catch what you can't. */
class SkewJoinSpec extends AnyFunSuite with SparkFixture {

  test("AQE splits the hot key's partition in a skewed sort-merge join") {
    val s = spark
    import s.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB")
    val prev = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      // 99% of the left side lands on key 0; the right side is uniform
      val left = s.range(0, 200000L)
        .select(when($"id" % 100 === 0, $"id" % 50).otherwise(0L).as("k"),
          concat(lit("x"), $"id").as("pad"))
      val right = s.range(0, 50L).select($"id".as("k"), lit("dim").as("d"))
      val j = left.join(right, "k")
      j.queryExecution.toRdd.count()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$plan")
      assert(j.count() == 200000L)
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }
}
