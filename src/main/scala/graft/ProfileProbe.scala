package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only decomposition probe (guide §1): splits each query's cost into
  * plan time (analysis+optimization+physical planning of the DataFrame) vs
  * action time, and breaks composite queries (ivf, hep_scaled, raw_yaml)
  * into their component jobs. Not part of the driver contract. */
object ProfileProbe {
  private def session(cpus: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/graft-shuffle")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()
  private def timed(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  /** `pipeline` mode: the full Bench phase-2 validate pass over the staged
    * 10M-doc table at local[8] and local[32] (best-of-2) plus the invariant
    * pass alone — the decomposition that drives the headline docs/sec. */
  private def pipelineMode(): Unit = {
    val stage = "/tmp/graft_bench_10000000"
    for (k <- Seq(8, 32)) {
      System.gc()
      val spark = session(k)
      val pages = spark.read.parquet(s"$stage/pages")
      val expected = spark.read.parquet(s"$stage/expected")
      val shaOnly = (1 to 2).map(_ => timed(noop(
        pages.select(col("url"), sha2(col("text").cast("binary"), 256))))).min
      println(f"[pipe] local[$k] sha256 alone:    $shaOnly%6.2f s")
      val dupsPlain = (1 to 2).map(_ => timed(noop(
        graft.engine.Passes.duplicates(pages, "url")))).min
      println(f"[pipe] local[$k] dups plain:      $dupsPlain%6.2f s")
      for ((tag, smj) <- Seq(("shj", false), ("smj", true))) {
        val inv = (1 to 2).map(_ => timed(noop(
          graft.engine.Passes.textInvariantViolations(
            pages.select(org.apache.spark.sql.functions.col("part_id"),
              org.apache.spark.sql.functions.col("url"),
              org.apache.spark.sql.functions.col("text")),
            "url", "text", expected, "text_sha256", carry = Seq("part_id"),
            preferSortMerge = smj)))).min
        println(f"[pipe] local[$k] invariant $tag: $inv%6.2f s")
      }
      val full = (1 to 2).map { _ =>
        timed {
          val obs = org.apache.spark.sql.Observation()
          val res = graft.engine.PageValidator.validate(spark, pages,
            graft.testdata.PagesGen.langDim(spark), expected, htmlMaxBytes = 10000,
            observation = Some(obs),
            observeCols = Seq("url", "warc_ts", "text", "lang", "part_id"))
          res.violations.persist()
          noop(res.violations)
          noop(res.verdicts)
          require(obs.get("n_rows").asInstanceOf[Long] > 0)
          res.violations.unpersist()
        }
      }.min
      println(f"[pipe] local[$k] full pipeline:   $full%6.2f s")
      spark.stop()
    }
  }

  /** `invplans <outDir>`: dump the text-invariant join plan with and
    * without the shuffled-hash hint (plan evidence for plans/r06). */
  private def invPlans(outDir: String): Unit = {
    val spark = session(8)
    new java.io.File(outDir).mkdirs()
    val stage = "/tmp/graft_bench_10000000"
    val pages = spark.read.parquet(s"$stage/pages")
      .select(col("part_id"), col("url"), col("text"))
    val expected = spark.read.parquet(s"$stage/expected")
    for ((tag, smj) <- Seq(("before", true), ("after", false))) {
      val df = graft.engine.Passes.textInvariantViolations(
        pages, "url", "text", expected, "text_sha256",
        carry = Seq("part_id"), preferSortMerge = smj)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/pipeline_invariant_$tag.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      System.err.println(s"[invplans] wrote $outDir/pipeline_invariant_$tag.txt")
    }
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("pipeline")) { pipelineMode(); return }
    if (args.headOption.contains("invplans")) { invPlans(args(1)); return }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = session(cpus)
    val reps = 3

    // ---- plan-vs-exec split for selected queries ------------------------
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "sub_verdicts", "raw_yaml_violations", "hep_violations", "lang_id_dim",
      "lang_id", "q1_agg_lineitem", "a5_unique_salted", "dedup_ngram",
      "dedup_embedding", "ann_topk", "knn_brute", "text_fingerprint")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val ts = (1 to reps).map { _ =>
        var planT = 0.0
        val total = timed {
          val df = fn(spark, sfDir)
          planT = timed(df.queryExecution.executedPlan)
          noop(df)
        }
        (planT, total)
      }
      val best = ts.minBy(_._2)
      println(f"[plan] $n%-26s plan=${best._1}%6.3f  total=${best._2}%6.3f")
    }

    // ---- hep_scaled_50k decomposition ----------------------------------
    val genOnly = (1 to reps).map(_ =>
      timed(noop(graft.testdata.HepGen.rows(spark, 50000)))).min
    println(f"[hep50k] generation only: $genOnly%6.3f")
    val full = (1 to reps).map(_ => timed(noop(
      graft.hep.HepDataRules.violations(graft.testdata.HepGen.rows(spark, 50000))
        .groupBy("phase").count()))).min
    println(f"[hep50k] full query:      $full%6.3f")

    // ---- raw_yaml decomposition ----------------------------------------
    import spark.implicits._
    val rawRows = (1 to reps).map(_ => timed(noop {
      spark.createDataset(graft.ingest.RawYamlFixtures.docs)
        .map { case (f, y) => graft.ingest.YamlIngest.parseDataFile(f, y) }.toDF()
    })).min
    println(f"[raw_yaml] parse only:    $rawRows%6.3f")

    // ---- ivf decomposition ---------------------------------------------
    {
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val tCount = (1 to reps).map(_ =>
        timed(e.select(col("vec_id")).count())).min
      println(f"[ivf] corpus count job:  $tCount%6.3f")
      val fit = graft.ops.Similarity.fitSample(e, "vec_id", "embedding", 131072)
      val tFitCollect = (1 to reps).map(_ => timed {
        fit.orderBy(xxhash64(to_json(col("v")))).limit(512)
          .select(col("v")).collect()
      }).min
      println(f"[ivf] seed collect job:  $tFitCollect%6.3f")
    }
    spark.stop()
  }
}
