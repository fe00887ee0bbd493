package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.compile.ConstraintCompiler
import graft.spec._

/** Guards on the physical plans — the properties that make the engine hold
  * at 100 TB: column pruning into the scan, filter pushdown, broadcast
  * anti-join selection, and correctness under join skew with AQE. */
class PlanHygieneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val pagesPath: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_plan").toString
    graft.testdata.PagesGen.pages(spark, 20000, "dirty")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("HepDataRules.violations is one scan: no exchange before the explode") {
    import spark.implicits._
    // parquet round-trip: a local Seq input would be constant-folded by
    // ConvertToLocalRelation and hide the real plan
    val dir = java.nio.file.Files.createTempDirectory("graft_hep_plan").toString
    graft.hep.HepFixtures.all.toDS().toDF()
      .write.mode("overwrite").parquet(dir)
    val plan = graft.hep.HepDataRules.violations(spark.read.parquet(dir))
      .queryExecution.executedPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val shuffles = plan.collect { case e: ShuffleExchangeLike => e }
    assert(shuffles.isEmpty,
      s"violations must be a pure per-row projection+explode:\n$plan")
    // the sequential check_error_values kernel must not knock the
    // projection out of whole-stage codegen (doGenCode via reference obj)
    val s = plan.toString
    val kernelLine = s.linesIterator.find(_.contains("check_error_values"))
    assert(kernelLine.exists(_.trim.stripPrefix("+- ").startsWith("*(")),
      kernelLine.getOrElse(s"kernel not found in plan:\n$s"))
  }

  test("verdicts cost ONE scan of the fact table (universe from the same aggregate)") {
    // r3 verdicts scanned twice: once for violations, once for the
    // distinct-file universe — at 10^12 docs the second full scan is real
    // money (round-3 verdict item 4)
    import spark.implicits._
    // count scans on the plan STRING: AQE wraps the tree and collect() on
    // AdaptiveSparkPlanExec does not traverse the input plan
    def nScans(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.toString.sliding("FileScan".length)
        .count(_ == "FileScan")
    val dir = java.nio.file.Files.createTempDirectory("graft_verd_plan").toString
    graft.hep.HepFixtures.all.toDS().toDF()
      .write.mode("overwrite").parquet(dir)
    val hepVerdicts = graft.hep.HepDataRules.verdicts(spark.read.parquet(dir))
    assert(nScans(hepVerdicts) === 1,
      s"hep verdicts must scan once:\n${hepVerdicts.queryExecution.executedPlan}")

    val docsSpec = TableSpec("pages", "part_id", Seq("url"),
      Seq(NotNull("url"), MatchesRegex("url", "^https?://"), NotNull("text")))
    val a7 = graft.engine.Passes.verdictsSingleScan(
      spark.read.parquet(pagesPath), "part_id",
      ConstraintCompiler.errorCount(docsSpec))
    assert(nScans(a7) === 1,
      s"single-scan verdicts must scan once:\n${a7.queryExecution.executedPlan}")
  }

  test("column pruning: a url-only spec never reads html/text from parquet") {
    val spec = TableSpec("pages", "part_id", Seq("url"),
      Seq(NotNull("url"), MatchesRegex("url", "^https?://")))
    val df = ConstraintCompiler.violations(spec, spark.read.parquet(pagesPath))
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("ReadSchema"))
    assert(!scan.contains("html"), scan)
    assert(!scan.contains("text"), scan)
    assert(scan.contains("url"))
  }

  test("filter pushdown: partition predicate reaches the parquet scan") {
    val df = spark.read.parquet(pagesPath).where(col("part_id") === 3)
      .select(col("url"))
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters") &&
      (scan.contains("IsNotNull(part_id)") || scan.contains("EqualTo(part_id,3)")), scan)
  }

  test("referential check plans as a broadcast LEFT ANTI hash join") {
    val plan = graft.engine.Passes.referentialViolations(
        spark.read.parquet(pagesPath), "lang",
        graft.testdata.PagesGen.langDim(spark), "lang")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan)
  }

  test("AQE skew-join: heavily skewed join stays correct with skew handling on") {
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      // 40% of the left side lands on one hot key
      val left = spark.range(200000).select(
        when(pmod(col("id"), lit(5)) < 2, lit("hot"))
          .otherwise(concat(lit("k"), pmod(col("id"), lit(1000)))).as("k"),
        col("id"))
      val right = (Seq("hot") ++ (0 until 1000).map("k" + _)).toDF("k")
        .withColumn("v", length(col("k")))
      val joined = left.join(right, Seq("k"))
      assert(joined.count() === 200000L)
      val hot = joined.where(col("k") === "hot").count()
      assert(hot === 80000L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
      prev.fold(spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes"))(
        v => spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", v))
    }
  }

  test("fused rule scan: one Project, no shuffle before the explode") {
    val spec = graft.engine.PageValidator.pageSpec(Nil, 10000)
    val plan = ConstraintCompiler.violations(spec, spark.read.parquet(pagesPath))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "row rules must not shuffle:\n" + plan)
    assert(plan.contains("Generate"))
  }
}
