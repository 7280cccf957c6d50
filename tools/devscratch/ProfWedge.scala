package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TRANSIENT stress profiler for the wedge-family 10x gap (VERDICT r14
  * item 2): per-stage split at scale knobs, plus a packed-pair-key
  * variant of g22's distinct. Archived to tools/devscratch on commit. */
object ProfWedge {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/scaleli/n10x")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.files.maxPartitionBytes", (2 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (128 * 1024).toString)
      .config("spark.shuffle.compress", "true")
      .config("spark.shuffle.spill.compress", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        (4 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    ops.Tables.load(spark, dir)
    spark.range(1 << 20).groupBy(expr("id % 7")).count()
      .queryExecution.toRdd.count()

    def time(name: String)(f: => DataFrame): Unit = {
      val ts = (1 to 2).map { _ =>
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
      col("l.z") === col("r.da") && col("l.x") < col("r.db"))
      .select(col("l.x").as("x"), col("r.db").as("y"))
    def pairs = twoHop
      .union(sym.filter($"da" < $"db").select($"da".as("x"), $"db".as("y")))
      .distinct()

    // packed variant: one long key (x << 32 | y) through the distinct
    def twoHopP = mid.as("l").join(sym.as("r"),
      col("l.z") === col("r.da") && col("l.x") < col("r.db"))
      .select((shiftleft(col("l.x"), 32) + col("r.db")).as("p"))
    def pairsP = twoHopP
      .union(sym.filter($"da" < $"db")
        .select((shiftleft($"da", 32) + $"db").as("p")))
      .distinct()
    def g22p = pairsP
      .select(explode(array(shiftright($"p", 32),
        $"p".bitwiseAND(lit(0xffffffffL)))).as("x"))
      .groupBy($"x").agg(count(lit(1)).as("reach"))
      .groupBy($"reach").agg(count(lit(1)).as("n_nodes"))
      .orderBy($"reach")

    time("support_edges")(e)
    time("twohop_join")(twoHop)
    time("distinct_xy")(pairs)
    time("distinct_packed")(pairsP)
    time("g22_full")(ops.GraphOps.g22(spark, dir))
    time("g22_packed_full")(g22p)
    time("g21_full")(ops.GraphOps.g21(spark, dir))
    spark.stop()
  }
}
