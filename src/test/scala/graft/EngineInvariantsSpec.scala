package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.compile.ConstraintCompiler
import graft.engine.Passes
import graft.spec._

/** Engine invariants checked over seeded-random batched data (one Spark job
  * per property instead of one per ScalaCheck case — same coverage, 100×
  * faster). */
class EngineInvariantsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val rnd = new scala.util.Random(42)

  test("uniqueness: duplicates() matches an independent Scala mirror on random multisets") {
    import spark.implicits._
    val urls = Seq.fill(5000)(s"u${rnd.nextInt(2000)}")
    val got = Passes.duplicates(urls.toDF("url"), "url")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = urls.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 > 1).toMap
    assert(got === expected)
    // salted path agrees exactly
    val salted = Passes.duplicatesSalted(urls.toDF("url"), "url")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === expected)
  }

  test("verdicts are invariant under arbitrary repartitioning") {
    val pages = graft.testdata.PagesGen.pages(spark, 3000, "dirty")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.engine.PageValidator.validate(spark, df,
        graft.testdata.PagesGen.langDim(spark),
        graft.testdata.PagesGen.expectedText(spark, 3000),
        htmlMaxBytes = 10000)
        .verdicts.collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getBoolean(2))).sorted.toSeq
    assert(run(pages) === run(pages.repartition(7)))
    assert(run(pages) === run(pages.repartition(1)))
  }

  test("verdictsSingleScan ≡ verdicts-from-violations on random specs and data") {
    // the two formulations (one-scan per-row error counts vs aggregate over
    // materialized violations + distinct universe) must agree EXACTLY for
    // any spec/data — the driver's a7 query uses the former, the page
    // pipeline the latter
    import spark.implicits._
    val rows = Seq.fill(4000)((
      rnd.nextInt(20),
      if (rnd.nextBoolean()) s"https://h${rnd.nextInt(40)}.org/p" else
        (if (rnd.nextInt(5) == 0) null else s"ftp://x${rnd.nextInt(9)}"),
      if (rnd.nextInt(7) == 0) null else s"t${rnd.nextInt(200)}"))
      .toDF("part_id", "url", "text").repartition(9)
    val spec = TableSpec("t", "part_id", Seq("url"), Seq(
      NotNull("url"),
      MatchesRegex("url", "^https?://"),
      NotNull("text"),
      MaxLen("text", 3)))
    val fast = Passes.verdictsSingleScan(rows, "part_id",
        ConstraintCompiler.errorCount(spec))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getBoolean(2))).toSet
    val slow = Passes.verdicts(
        ConstraintCompiler.violations(spec, rows), "part_id",
        rows.select(col("part_id")))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(fast === slow)
    assert(fast.nonEmpty && fast.exists(!_._3) && fast.map(_._1).size === 20)
  }

  test("numeric-string rule matches a Scala mirror over a generated corpus") {
    import spark.implicits._
    val candidates = Seq("", "0", "12", "-3.5", "1e5", "2.3E-7", "50%", "0.0%",
      "-0.0%", "12%x", "x12", "1.2.3", "abc", "%", "  7 ", "+.5", "5.", ".",
      "inf", "-inf", "nan", "1-2", "7000 GeV") ++
      Seq.fill(100)(rnd.nextInt(4) match {
        case 0 => rnd.nextDouble().toString
        case 1 => rnd.nextInt(1000).toString + "%"
        case 2 => rnd.alphanumeric.take(5).mkString
        case 3 => rnd.nextInt(100).toString + "." + rnd.nextInt(100)
      })
    val df = candidates.toDF("v")
    val got = df.select(col("v"),
        coalesce(ConstraintCompiler.predicate(NumericString("v")), lit(false)).as("ok"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    def mirror(s: String): Boolean = {
      if (s.isEmpty) return true
      val stripped = s.stripSuffix("%")
      // Spark cast accepts Java-style parses incl. inf/nan; mirror via Java
      try { stripped.trim.toDouble; true }
      catch { case _: Exception =>
        stripped.trim.toLowerCase match {
          case "inf" | "+inf" | "-inf" | "infinity" | "+infinity" | "-infinity" | "nan" => true
          case _ => false
        }
      }
    }
    candidates.distinct.foreach { s =>
      assert(got(s) === mirror(s), s"mismatch for '$s'")
    }
  }

  test("violation output is deterministic across runs") {
    val pages = graft.testdata.PagesGen.pages(spark, 2000, "dirty")
    val spec = graft.engine.PageValidator.pageSpec(Nil, 10000)
    def fingerprint() = ConstraintCompiler.violations(spec, pages)
      .orderBy("part_id", "url", "rule_seq")
      .collect().map(_.toString).mkString("\n").hashCode
    assert(fingerprint() === fingerprint())
  }

  test("observe() collects column stats during the violations action (zero extra pass)") {
    val obs = org.apache.spark.sql.Observation("page_stats")
    val res = graft.engine.PageValidator.validate(spark,
      graft.testdata.PagesGen.pages(spark, 2000, "dirty"),
      graft.testdata.PagesGen.langDim(spark),
      graft.testdata.PagesGen.expectedText(spark, 2000),
      htmlMaxBytes = 10000, observation = Some(obs))
    res.violations.count() // the ONE action; metrics ride along
    val m = obs.get
    assert(m("n_rows") === 2000L)
    assert(m("url__nulls") === (0L until 2000L).count(_ % 1000 == 3).toLong)
    assert(m("lang__nulls") === 0L)
    assert(m("url__adist").asInstanceOf[Long] > 1800L)
  }

  test("kll_sketch via SparkSessionExtensions-style registry resolves in SQL") {
    graft.sketch.KllSketchAgg.register(spark)
    import spark.implicits._
    val bytes = spark.range(1000).selectExpr("cast(id as double) v")
      .selectExpr("kll_sketch(v) as sk").collect()(0).getAs[Array[Byte]](0)
    assert(graft.sketch.KllSketchAgg.heapify(bytes).getN === 1000L)
  }
}
