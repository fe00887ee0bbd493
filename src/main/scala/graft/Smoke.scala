package graft

import org.apache.spark.sql.SparkSession

/** Local smoke entry mirroring the driver's `SparkEntry.entry` rows>0 check:
  * runs the flagship pipeline and prints row counts + the physical plan of
  * the violations query (for shuffle/pushdown inspection). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-smoke")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    if (args.contains("--explain")) df.explain("formatted")
    val n = df.count()
    println(s"[smoke] entry rows=$n (driver checks rows>0)")
    df.show(10, truncate = 120)
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
