package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.compile.ConstraintCompiler
import graft.engine.{PageValidator, Passes}
import graft.testdata.PagesGen

/** Scaling probe: times each validation sub-pass separately at two
  * parallelism levels to locate non-scaling components. Dev tool. */
object BenchProbe {
  private def session(cpus: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master(s"local[$cpus]")
      .appName(s"probe-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
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

  def main(args: Array[String]): Unit = {
    val stage = "/tmp/graft_bench_10000000"
    val reps = 3
    for (k <- Seq(8, 2, 8)) {
      System.gc()
      val spark = session(k)
      val pages = spark.read.parquet(s"$stage/pages")
      val expected = spark.read.parquet(s"$stage/expected")
      val spec = PageValidator.pageSpec(Nil, 10000L)
        .copy(rules = PageValidator.pageSpec(Nil, 10000L).rules
          .filterNot(_.id.startsWith("enum:")))
      val passes = Seq[(String, () => Unit)](
        "scan_all_cols" -> (() => noop(pages)),
        "scan_no_html" -> (() => noop(pages.drop("html"))),
        "row_rules" -> (() => noop(ConstraintCompiler.violations(spec, pages))),
        "dups_salted" -> (() => noop(Passes.duplicatesSalted(pages, "url"))),
        "ref_lang" -> (() => noop(Passes.referentialViolations(
          pages, "lang", PagesGen.langDim(spark), "lang"))),
        "invariant" -> (() => noop(Passes.textInvariantViolations(
          pages.select(col("part_id"), col("url"), col("text")), "url", "text",
          expected, "text_sha256", carry = Seq("part_id")))),
        "stats" -> (() => noop(Passes.columnStats(pages,
          Seq("url", "warc_ts", "text", "lang", "part_id")))))
      passes.foreach { case (name, f) =>
        val best = (1 to reps).map(_ => timed(f())).min
        println(f"[probe] local[$k] $name%-14s $best%7.2f s")
      }
      spark.stop()
    }
  }
}
