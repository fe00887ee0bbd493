package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.json4s._

import graft.hep.{SubFile, SubFixtures, SubmissionRules, SchemaVersion}

/** Differential gate for the native SubDocKernel: packed violation arrays
  * must be byte-identical (keys, messages, order) to the pure-Column tree
  * (SubmissionRules.packedViolationsSpec) on the fixtures and the 240-case
  * reference corpus, across every published schema version. */
class SubKernelEquivSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private implicit val fmts: Formats = DefaultFormats

  private def assertEquiv(df: DataFrame, v: SchemaVersion, label: String): Unit = {
    def render(d: DataFrame): Seq[String] =
      d.select(col("file"), to_json(col("_v")).as("j"))
        .orderBy("file").collect()
        .map(r => s"${r.getString(0)} -> ${r.getString(1)}").toSeq
    val kernel = render(SubmissionRules.packedViolations(df, v))
    val spec = render(SubmissionRules.packedViolationsSpec(df, v))
    assert(kernel.size === spec.size, s"$label@$v row count")
    kernel.zip(spec).zipWithIndex.foreach { case ((k, s), i) =>
      assert(k === s, s"$label@$v row $i")
    }
  }

  private val versions =
    Seq("0.1.0", "1.0.0", "1.0.1", "1.1.0", "1.1.1").map(SchemaVersion.parse)

  test("kernel == Column spec on the submission fixtures, all versions") {
    val df = spark.createDataset(SubFixtures.all)(
      graft.hep.SubModel.subFileEncoder).toDF()
    versions.foreach(v => assertEquiv(df, v, "fixtures"))
  }

  test("kernel == Column spec on the 240-case reference corpus, all versions") {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/golden/submission_conformance.jsonl"),
      "UTF-8")
    val rows = try src.getLines().map { line =>
      val j = org.json4s.jackson.JsonMethods.parse(line)
      SubFile((j \ "file").extract[String],
        (j \ "docs").extract[List[graft.hep.SubDoc]])
    }.toList finally src.close()
    assert(rows.nonEmpty)
    val df = spark.createDataset(rows)(graft.hep.SubModel.subFileEncoder).toDF()
    versions.foreach(v => assertEquiv(df, v, "corpus"))
  }
}
