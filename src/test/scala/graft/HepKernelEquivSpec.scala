package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.json4s._

import graft.hep.{HepDataRules, HepFixtures, HepRow, SchemaVersion}

/** Differential gate for the native HepDocKernel: the packed violation
  * arrays it produces must be BYTE-IDENTICAL (keys, messages, order,
  * unexpected-error fallback) to the original pure-Column tree
  * (HepDataRules.packedViolationsSpec) on every corpus we have, across
  * every published schema version. A mismatch here means the optimization
  * changed what a query computes — the one thing this round must not do. */
class HepKernelEquivSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private implicit val fmts: Formats = DefaultFormats

  private def packedPairs(df: DataFrame, v: SchemaVersion): (Seq[String], Seq[String]) = {
    def render(d: DataFrame): Seq[String] =
      d.select(col("file"), to_json(col("_v")).as("j"))
        .orderBy("file").collect()
        .map(r => s"${r.getString(0)} -> ${r.getString(1)}").toSeq
    (render(HepDataRules.packedViolations(df, v)),
      render(HepDataRules.packedViolationsSpec(df, v)))
  }

  private def assertEquiv(df: DataFrame, v: SchemaVersion, label: String): Unit = {
    val (kernel, spec) = packedPairs(df, v)
    assert(kernel.size === spec.size, s"$label@$v row count")
    kernel.zip(spec).zipWithIndex.foreach { case ((k, s), i) =>
      assert(k === s, s"$label@$v row $i")
    }
  }

  private val versions =
    Seq("0.1.0", "1.0.0", "1.0.1", "1.1.0", "1.1.1").map(SchemaVersion.parse)

  test("kernel == Column spec on the fixture corpus, all schema versions") {
    val df = spark.createDataset(HepFixtures.all)(
      graft.hep.HepModel.hepRowEncoder).toDF()
    versions.foreach(v => assertEquiv(df, v, "fixtures"))
  }

  test("kernel == Column spec on the synthetic 20k corpus") {
    val df = graft.testdata.HepGen.rows(spark, 20000)
    assertEquiv(df, SchemaVersion.Default, "hepgen")
  }

  test("kernel == Column spec on the raw-YAML ingested fixtures") {
    val rows = spark.createDataset(graft.ingest.RawYamlFixtures.docs)(
        graft.hep.HepModel.rawDocEncoder)
      .map { case (f, y) => graft.ingest.YamlIngest.parseDataFile(f, y) }(
        graft.hep.HepModel.hepRowEncoder).toDF()
    versions.foreach(v => assertEquiv(rows, v, "rawyaml"))
  }

  test("kernel == Column spec on the 300-doc reference corpus, all versions") {
    val lenient = new com.fasterxml.jackson.databind.ObjectMapper()
    lenient.enable(com.fasterxml.jackson.core.json.JsonReadFeature
      .ALLOW_NON_NUMERIC_NUMBERS.mappedFeature())
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/golden/datafile_conformance.jsonl"),
      "UTF-8")
    val rows = try src.getLines().map { line =>
      val j = org.json4s.jackson.JsonMethods.fromJsonNode(lenient.readTree(line))
      (j \ "row").extract[HepRow]
    }.toList finally src.close()
    assert(rows.size === 300)
    val df = spark.createDataset(rows)(graft.hep.HepModel.hepRowEncoder).toDF()
    versions.foreach(v => assertEquiv(df, v, "corpus300"))
  }
}
