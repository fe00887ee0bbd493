package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev-only measurement harness (guide §1): per-query timings with the
  * noop sink under the SAME session config as graft.Bench, plus
  * `.explain("formatted")` dumps for the plan evidence in plans/r06/.
  * Bench.scala itself is frozen for the driver; extra benchmarks live here.
  *
  * Usage:
  *   runMain graft.BenchExtra [--reps N] [--explain outDir] [query ...]
  * With no query names, all SparkEntry.queries run (sorted).
  */
object BenchExtra {

  private def session(cpus: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchextra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-shuffle")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def timed(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    var reps = 5
    var explainDir: Option[String] = None
    val names = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--reps" => reps = args(i + 1).toInt; i += 2
        case "--explain" => explainDir = Some(args(i + 1)); i += 2
        case q => names += q; i += 1
      }
    }
    val spark = session(cpus)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.isEmpty || names.contains(n) }

    explainDir.foreach { dir =>
      new java.io.File(dir).mkdirs()
      selected.foreach { case (name, fn) =>
        val df = fn(spark, sfDir)
        // queryExecution.explainString == explain("formatted") output
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$dir/$name.txt"), txt)
        System.err.println(s"[explain] wrote $dir/$name.txt")
      }
    }

    val results = selected.map { case (name, fn) =>
      spark.sparkContext.setJobDescription(s"benchextra:$name")
      val ts = (1 to reps).map(_ => timed(noop(fn(spark, sfDir))))
      println(f"$name%-28s best=${ts.min}%7.3f  " +
        ts.map(t => f"$t%.3f").mkString("[", ", ", "]"))
      name -> ts.min
    }
    println(f"TOTAL best-of-$reps%d: ${results.map(_._2).sum}%.2f s over ${results.size} queries")
    spark.stop()
  }
}
