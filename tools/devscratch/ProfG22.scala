package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TRANSIENT per-stage profiler for the g21/g22 floor adjudication
  * (VERDICT r13 item 2). Archived to tools/devscratch before commit.
  * Every stage frame is rebuilt FRESH per run — a memoized toRdd would
  * reuse prior runs' shuffle map outputs and time only the last stage. */
object ProfG22 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (2 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (128 * 1024).toString)
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    ops.Tables.load(spark, dir)
    spark.range(1 << 20).groupBy(expr("id % 7")).count()
      .queryExecution.toRdd.count()

    def time(name: String)(f: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f.queryExecution.toRdd.count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"STAGE $name%-28s min=${ts.map(_._1).min}%7.3f s  " +
        f"first=${ts.head._1}%7.3f  rows=${ts.head._2}")
    }

    def baskets = ops.Tables.t(spark, dir, "lineitem")
      .groupBy($"l_orderkey")
      .agg(sort_array(collect_set($"l_partkey".cast("long"))).as("parts"))
    def inst = baskets.select(explode(
        graft.functions.PairKernels.sortedPairs($"parts")).as("p"))
      .select($"p.da".as("da"), $"p.db".as("db"))
    def e = inst.groupBy($"da", $"db")
      .agg(count(lit(1)).as("support"))
      .filter($"support" >= ops.GraphOps.RaMinSupport)
      .select($"da", $"db")
    def sym = e.union(e.select($"db".as("da"), $"da".as("db")))
      .repartition($"da")
    def deg = sym.groupBy($"da").agg(count(lit(1)).as("d"))
    def mid = sym.join(deg.filter($"d" <= ops.GraphOps.RaMaxMiddleDegree),
        Seq("da"))
      .select($"da".as("z"), $"db".as("x"))
    def twoHop = mid.as("l").join(sym.as("r"),
      col("l.z") === col("r.da") && col("l.x") =!= col("r.db"))
      .select(col("l.x").as("x"), col("r.db").as("y"))
    def reach = twoHop.union(sym.select($"da".as("x"), $"db".as("y")))
      .distinct()
    def reachCnt = reach.groupBy($"x").agg(count(lit(1)).as("reach"))

    time("baskets")(baskets)
    time("inst_pairs")(inst)
    time("support_edges")(e)
    time("sym_repart")(sym)
    time("deg")(deg)
    time("mid")(mid)
    time("twohop_join")(twoHop)
    time("distinct")(reach)
    time("reach_counts")(reachCnt)
    time("g22_full")(ops.GraphOps.g22(spark, dir))
    time("g21_full")(ops.GraphOps.g21(spark, dir))

    // knob probes: is the residue per-stage scheduling overhead?
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    time("g22_parts8")(ops.GraphOps.g22(spark, dir))
    time("g21_parts8")(ops.GraphOps.g21(spark, dir))
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("g22_noaqe")(ops.GraphOps.g22(spark, dir))
    time("g21_noaqe")(ops.GraphOps.g21(spark, dir))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
