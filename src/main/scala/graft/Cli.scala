package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.{DriftPass, PageValidator}
import graft.report.Manifest
import graft.spec.SpecJson
import graft.testdata.PagesGen

/** CLI entry point — the analogue of the reference's `hepdata-validate`
  * (hepdata_validator/cli.py): validate a page table, print verdicts in the
  * reference's transcript shape ("X is valid." / "ERROR: X is invalid.",
  * then per-file "\t error - <message>" lines), exit 1 when invalid.
  *
  * Usage:
  *   graft.Cli --pages <parquet> [--expected <parquet>] [--spec <spec.json>]
  *             [--manifest <path> --snapshot <id>] [--drift <sqlExpr>]
  *             [--max-violations <n>] [--synthetic <n>:<profile>]
  */
object Cli {
  def main(args: Array[String]): Unit = {
    val code = run(args)
    if (code != 0) sys.exit(code)
  }

  /** Testable entry: returns the exit code instead of calling sys.exit. */
  def run(args: Array[String]): Int = {
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    // don't tear down a session we didn't create (in-process callers/tests)
    val ownSession = SparkSession.getActiveSession.isEmpty
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-validate")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val target = opts.getOrElse("pages", opts.getOrElse("synthetic", "20000:dirty"))
    val pages = opts.get("pages") match {
      case Some(p) => spark.read.parquet(p)
      case None =>
        val Array(n, profile) = target.split(":")
        PagesGen.pages(spark, n.toLong, profile)
    }
    val expected = opts.get("expected") match {
      case Some(p) => spark.read.parquet(p)
      case None => PagesGen.expectedText(spark,
        opts.get("pages").fold(target.split(":")(0).toLong)(_ => 0L))
    }

    val res = opts.get("spec") match {
      case Some(path) =>
        val spec = SpecJson.load(path)
        val violations = graft.compile.ConstraintCompiler.violations(spec, pages)
        val verdicts = graft.engine.Passes.verdicts(violations,
          spec.partitionColumn, pages.select(col(spec.partitionColumn)))
        (violations, verdicts)
      case None =>
        val r = PageValidator.validate(spark, pages,
          PagesGen.langDim(spark), expected)
        (r.violations, r.verdicts)
    }
    val (violations, verdicts) = res
    violations.persist()

    val verdictRows = verdicts.orderBy("part_id").collect()
    val allValid = verdictRows.forall(_.getAs[Boolean]("pass"))
    val name = opts.getOrElse("pages", s"synthetic:$target")
    if (allValid) println(s"$name is valid.")
    else println(s"ERROR: $name is invalid.")
    verdictRows.foreach { r =>
      val p = r.getInt(0); val n = r.getAs[Long]("n_violations")
      val status = if (r.getAs[Boolean]("pass")) "valid" else s"invalid ($n violations)"
      println(s"\t partition $p is $status")
    }
    val maxShow = opts.getOrElse("max-violations", "20").toInt
    violations.orderBy("part_id", "rule_seq").limit(maxShow).collect()
      .foreach { r =>
        println(s"\t ${r.getAs[String]("level")} - ${r.getAs[String]("message")}")
      }

    opts.get("manifest").foreach { mPath =>
      val snap = opts.getOrElse("snapshot", "1").toLong
      Manifest.record(spark, mPath, verdicts,
        pages.groupBy(col("part_id")).agg(count(lit(1)).as("docs")),
        snap, s"cli run target=$name")
      println(s"\t manifest: ${Manifest.read(spark, mPath).count()} rows at $mPath")
    }

    opts.get("drift").foreach { valueExpr =>
      DriftPass.detect(spark, pages, valueExpr).foreach { r =>
        val flag = if (r.ksDrifted || r.chi2Drifted) "DRIFT" else "ok"
        println(f"\t drift partition ${r.partId}: ks=${r.ksStat}%.4f " +
          f"chi2=${r.chi2Stat}%.1f -> $flag")
      }
    }

    violations.unpersist()
    if (ownSession) spark.stop()
    if (allValid) 0 else 1
  }
}
