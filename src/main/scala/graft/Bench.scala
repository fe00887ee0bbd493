package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round benchmark. Prints ONE JSON line:
  *   {"metric":…, "value":…, "unit":…, "queries":{…}, "sf":…, "scaling":{…}}
  *
  * Two phases:
  *  1. per-query wall time over SPARK_GRAFT_SF_DIR (noop sink so every
  *     column is computed — count() would let Catalyst prune the work away);
  *  2. the BASELINE.md scaling experiment: the full page-validation pipeline
  *     (row rules + uniqueness + referential + text invariant + verdicts +
  *     observe()-stats) over SPARK_GRAFT_BENCH_DOCS synthetic pages, run at
  *     THREE parallelism levels (cpus/16, cpus/4, cpus) on the SAME parquet
  *     input, reporting efficiency for both N→4N pairs — see BENCH.md for
  *     why the low pair models cluster scaling and the high pair includes
  *     the single-box memory-bandwidth ceiling.
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // shuffle spill to tmpfs: the sandbox's /tmp block device serializes
      // shuffle I/O and masks core scaling; a real cluster has NVMe per node
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

  /** One full validation pass over the staged pages table. Column stats ride
    * along as observed metrics on the violations action (zero extra scan);
    * verdicts are derived from the persisted violations, so the whole
    * pipeline is ONE heavy job + one tiny aggregation. */
  private def validatePipeline(spark: SparkSession, dir: String): Unit = {
    val pages = spark.read.parquet(s"$dir/pages")
    val expected = spark.read.parquet(s"$dir/expected")
    val obs = org.apache.spark.sql.Observation()
    val res = graft.engine.PageValidator.validate(
      spark, pages, graft.testdata.PagesGen.langDim(spark), expected,
      htmlMaxBytes = 10000, observation = Some(obs),
      observeCols = Seq("url", "warc_ts", "text", "lang", "part_id"))
    res.violations.persist()
    noop(res.violations)
    noop(res.verdicts)
    require(obs.get("n_rows").asInstanceOf[Long] > 0)
    res.violations.unpersist()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "10000000").toLong
    val loN = math.max(cpus / 4, 1)

    // ---- phase 1: per-query timings over the driver tables --------------
    // best-of-N per query + a noise figure: the r3 round-over-round compare
    // was unreadable off single-shot numbers (the driver's own 3 pipeline
    // runs spread 7.0-13.8 s on this microVM) — reporting each query's best
    // of N back-to-back runs plus the median relative spread lets the next
    // verdict tell a regression from a cold cache
    var spark = session(cpus)
    val qreps = sys.env.getOrElse("SPARK_GRAFT_QUERY_REPS", "3").toInt
    val queryRuns: Seq[(String, Seq[Double])] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        name -> (1 to qreps).map { _ =>
          try timed(noop(fn(spark, sfDir)))
          catch { case _: Throwable => -1.0 }
        }
      }
    val queryTimes = queryRuns.map { case (n, ts) =>
      n -> (if (ts.exists(_ < 0)) -1.0 else ts.min)
    }
    val spreads = queryRuns
      .collect { case (_, ts) if ts.forall(_ >= 0) && ts.min > 0 =>
        (ts.max - ts.min) / ts.min }
      .sorted
    val noiseMedian = if (spreads.isEmpty) 0.0 else spreads(spreads.size / 2)
    val totalQuerySec = queryTimes.filter(_._2 >= 0).map(_._2).sum

    // ---- phase 2: docs/sec + N→4N scaling -------------------------------
    // stage input once (generation excluded from timing)
    val stage = s"/tmp/graft_bench_${benchDocs}"
    val pagesPath = new java.io.File(s"$stage/pages")
    if (!pagesPath.exists()) {
      graft.testdata.PagesGen.pages(spark, benchDocs, "dirty")
        .repartition(cpus * 2)
        .write.mode("overwrite").parquet(s"$stage/pages")
      graft.testdata.PagesGen.expectedText(spark, benchDocs)
        .repartition(cpus * 2)
        .write.mode("overwrite").parquet(s"$stage/expected")
    }
    validatePipeline(spark, stage) // warm-up (JIT + page cache), untimed
    spark.stop()

    // best-of-N to shed JIT/GC noise; runs alternate so drift can't bias one side
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    def measure(k: Int): Double = {
      System.gc() // drop the previous session's shuffle/cache garbage first
      spark = session(k)
      val ts = (1 to reps).map { i =>
        val t = timed(validatePipeline(spark, stage))
        System.err.println(f"[bench] local[$k] run $i: $t%.2f s")
        t
      }
      spark.stop()
      ts.min
    }
    // three levels give BOTH N→4N pairs: 2→8 shows the algorithmic scaling a
    // multi-node cluster would see; 8→32 additionally exposes this single
    // box's shared memory-bandwidth ceiling (cores compete for one bus —
    // on a real 4N-executor cluster each node brings its own).
    val levels = Seq(math.max(cpus / 16, 1), loN, cpus).distinct.sorted
    val secs = levels.map(k => k -> measure(k)).toMap
    def eff(a: Int, b: Int): Double = (secs(a) / secs(b)) / (b.toDouble / a)

    val dpsHi = benchDocs / secs(cpus)
    val qs = queryTimes.map { case (k, v) => s""""$k":${"%.3f".format(v)}""" }
      .mkString("{", ",", "}")
    val levelJson = levels.map(k =>
      s""""$k":{"sec":${"%.2f".format(secs(k))},"docs_per_sec":${"%.0f".format(benchDocs / secs(k))}}""")
      .mkString("{", ",", "}")
    val effJson = levels.sliding(2).map { case Seq(a, b) =>
      s""""${a}_to_$b":${"%.3f".format(eff(a, b))}""" }.mkString("{", ",", "}")
    val scaling =
      s"""{"docs":$benchDocs,"levels":$levelJson,"efficiency":$effJson,""" +
        s""""note":"2-to-8 reflects cluster-style scaling; 8-to-32 includes the single-box memory-bandwidth ceiling"}"""
    val json =
      s"""{"metric":"validated docs/sec (full page pipeline, local[$cpus])",""" +
        s""""value":${"%.0f".format(dpsHi)},"unit":"docs/sec",""" +
        s""""queries":$qs,"sf":"$sfDir",""" +
        s""""query_reps":$qreps,""" +
        s""""query_noise_median_rel_spread":${"%.3f".format(noiseMedian)},""" +
        s""""total_query_sec":${"%.2f".format(totalQuerySec)},""" +
        s""""scaling":$scaling}"""
    println(json)
    // also write to a file: sbt's "[info] " stdout prefix breaks the
    // driver's JSON-line parser (BENCH_r04 carried parsed:null)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/graft_bench.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
  }
}
