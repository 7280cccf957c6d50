package graft.ops

// Dev-only scratch: enumerate registry queries whose physical plan contains
// an UNPARTITIONED WindowExec (single-partition global window). Used once to
// seed the PlanAuditSpec allowlist; kept for re-audits.
object WindowSweepScratch {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .appName("window-sweep")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    Q.registry.foreach { q =>
      try {
        val df = q.fn(spark, dir)
        val wins = df.queryExecution.sparkPlan.collectWithSubqueries {
          case w: org.apache.spark.sql.execution.window.WindowExec
              if w.partitionSpec.isEmpty => w
          case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
              if w.partitionSpec.isEmpty => w
        }
        if (wins.nonEmpty)
          println(s"HIT ${q.name} ${wins.size}")
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      } catch {
        case e: Throwable => println(s"ERR ${q.name}: ${e.getClass.getSimpleName} ${e.getMessage.take(100)}")
      }
    }
    println("SWEEP DONE")
    spark.stop()
  }
}
