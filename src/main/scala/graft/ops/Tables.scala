package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.LongType

/** Central registry of the driver-provided parquet tables.
  *
  * Registers each table as a temp view so both the DataFrame API and
  * `spark.sql` can reach them. View registration is idempotent and cheap
  * (schema-only read); data is only scanned when an action runs, and
  * Catalyst pushes filters/projections down to the parquet scan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Small dimension tables — always broadcast-joinable at any scale
    * factor (region=5, nation=25 rows regardless of SF). */
  val smallDims: Set[String] = Set("region", "nation")

  private val loaded = scala.collection.mutable.Set.empty[(Int, String)]

  /** Register all tables from `dir` as temp views (once per session+dir). */
  def load(spark: SparkSession, dir: String): Unit = synchronized {
    val key = (System.identityHashCode(spark), dir)
    if (!loaded.contains(key)) {
      all.foreach { t =>
        try read(spark, dir, t).createOrReplaceTempView(t)
        catch {
          case e: Throwable =>
            System.err.println(s"[tables] skipping $t: ${e.getMessage}")
        }
      }
      loaded += key
    }
  }

  /** Read one table, normalizing parquet TIMESTAMP(NANOS) columns (which
    * Spark 4 rejects natively) to micro-precision TimestampType via the
    * nanosAsLong legacy read + integer `div` (no double precision loss). */
  private def read(spark: SparkSession, dir: String, t: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val path = s"$dir/$t.parquet"
    if (t == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(path)
      raw.schema.find(f => f.name == "ts" && f.dataType == LongType) match {
        case Some(_) => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case None => raw
      }
    } else spark.read.parquet(path)
  }

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    load(spark, dir)
    spark.table(name)
  }
}
