package graft
import org.apache.spark.sql.SparkSession
object StressProbe {
  def main(args: Array[String]): Unit = {
    val n = 50000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-shuffle")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stage = "/tmp/graft_stress_50m"
    if (!new java.io.File(s"$stage/pages").exists()) {
      graft.testdata.PagesGen.pages(spark, n, "dirty").repartition(128)
        .write.mode("overwrite").parquet(s"$stage/pages")
      graft.testdata.PagesGen.expectedText(spark, n).repartition(128)
        .write.mode("overwrite").parquet(s"$stage/expected")
    }
    val t0 = System.nanoTime()
    val obs = org.apache.spark.sql.Observation()
    val res = graft.engine.PageValidator.validate(spark,
      spark.read.parquet(s"$stage/pages"),
      graft.testdata.PagesGen.langDim(spark),
      spark.read.parquet(s"$stage/expected"),
      htmlMaxBytes = 10000, observation = Some(obs))
    res.violations.persist()
    val nv = res.violations.count()
    val verdicts = res.verdicts.collect()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[stress] 50M docs: $sec%.1f s (${n / sec}%.0f docs/sec), " +
      s"violations=$nv, failing_parts=${verdicts.count(!_.getAs[Boolean]("pass"))}, " +
      s"observed_rows=${obs.get("n_rows")}")
    spark.stop()
  }
}
