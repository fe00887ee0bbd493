package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: dump one named SparkEntry query's full result as a single CSV
  * per scale factor — used to prove a rewritten query produces identical
  * output (diff old-code dump vs new-code dump). */
object QueryDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val outBase = args(1)
    val sfs = if (args.length > 2) args.drop(2).toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .appName("graft-qdump")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sfs.foreach { sf =>
      val tag = sf.split('/').last
      SparkEntry.queries(name)(spark, sf)
        .coalesce(1).write.mode("overwrite")
        .option("header", "true").csv(s"$outBase/$tag")
      println(s"[qdump] wrote $outBase/$tag")
    }
    spark.stop()
  }
}
