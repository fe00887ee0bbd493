package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.{DriftPass, PageValidator}
import graft.report.Manifest
import graft.sketch.KllSketchAgg
import org.apache.datasketches.kll.KllDoublesSketch

class DriftAndManifestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val N = 16000L

  test("KLL sketch aggregate: quantiles ~ exact, sketches merge") {
    import graft.testdata.PagesGen
    KllSketchAgg.register(spark)
    val df = spark.range(10000).selectExpr("cast(id as double) as v",
      "cast(id % 4 as int) as g")
    val rows = df.groupBy(col("g")).agg(expr("kll_sketch(v)").as("sk")).collect()
    assert(rows.length === 4)
    val merged = KllDoublesSketch.newHeapInstance(200)
    rows.foreach(r => merged.merge(KllSketchAgg.heapify(r.getAs[Array[Byte]]("sk"))))
    assert(merged.getN === 10000L)
    val med = merged.getQuantile(0.5,
      org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE)
    assert(math.abs(med - 5000.0) < 200.0)
  }

  test("drift pass: clean profile has no drifting partition") {
    val reports = DriftPass.detect(spark,
      graft.testdata.PagesGen.pages(spark, N, "clean"), "length(text)")
    assert(reports.size === graft.testdata.PagesGen.NumParts)
    assert(reports.forall(r => !r.ksDrifted), reports.mkString("\n"))
    assert(reports.forall(r => !r.chi2Drifted), reports.mkString("\n"))
  }

  test("drift pass: shifted partitions are detected by KS and chi2") {
    val reports = DriftPass.detect(spark,
      graft.testdata.PagesGen.pages(spark, N, "drift"), "length(text)")
    // upper-half partitions carry +40-word documents (PagesGen drift profile)
    val shifted = reports.filter(_.partId >= graft.testdata.PagesGen.NumParts / 2)
    assert(shifted.forall(_.ksDrifted), reports.mkString("\n"))
    assert(shifted.forall(_.chi2Drifted), reports.mkString("\n"))
    // the shift is enormous relative to the clean profile's statistics
    val cleanMax = DriftPass.detect(spark,
      graft.testdata.PagesGen.pages(spark, N, "clean"), "length(text)")
      .map(_.ksStat).max
    assert(shifted.map(_.ksStat).min > cleanMax * 3)
  }

  test("drift vs fixed baseline: only the shifted partitions flag") {
    val baseline = DriftPass.pooledBaseline(spark,
      graft.testdata.PagesGen.pages(spark, N, "clean"), "length(text)")
    val reports = DriftPass.detectAgainstBaseline(spark,
      graft.testdata.PagesGen.pages(spark, N, "drift"), "length(text)", baseline)
    val (shifted, unshifted) = reports.partition(
      _.partId >= graft.testdata.PagesGen.NumParts / 2)
    assert(shifted.forall(r => r.ksDrifted && r.chi2Drifted), reports.mkString("\n"))
    // unshifted partitions match the clean baseline — they must NOT flag
    assert(unshifted.forall(r => !r.ksDrifted), reports.mkString("\n"))
  }

  test("manifest: incremental run processes only pending partitions, resume is a no-op") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_manifest").toString + "/manifest"
    val pages = graft.testdata.PagesGen.pages(spark, 4000, "dirty")
    def process(df: org.apache.spark.sql.DataFrame) = {
      val res = PageValidator.validate(spark, df,
        graft.testdata.PagesGen.langDim(spark),
        graft.testdata.PagesGen.expectedText(spark, 4000), htmlMaxBytes = 10000)
      res.verdicts
    }
    // snapshot 1: everything pending
    val first = Manifest.runIncremental(spark, dir, pages, 1L, "sf=test run=1")(process)
    assert(first === (0 until graft.testdata.PagesGen.NumParts))
    // resume at same snapshot: nothing to do, process not invoked
    val second = Manifest.runIncremental(spark, dir, pages, 1L,
      "sf=test run=2")(_ => fail("process must not run on resume"))
    assert(second === Seq.empty)
    // snapshot 2 adds new partitions (wider repartitioning): only new ids run
    val pages2 = graft.testdata.PagesGen.pages(spark, 4000, "dirty", numParts = 12)
    val third = Manifest.runIncremental(spark, dir, pages2, 2L, "sf=test run=3")(process)
    assert(third === (8 until 12))
    // manifest rows carry lineage + metrics
    val m = Manifest.read(spark, dir)
    assert(m.count() === 12)
    assert(m.where("lineage = 'sf=test run=1'").count() === 8)
    val v = m.agg(sum("violations")).collect()(0).getLong(0)
    assert(v > 0)
  }
}
