package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.hep.{SubFile, SubmissionRules}

/** Differential conformance replay for the submission-file rules: 240
  * seeded-random submission streams (tools/gen_submission_corpus.py, seed
  * 45) whose expected messages were produced by running the REFERENCE
  * SubmissionFileValidator, with the SubDoc row translation computed by the
  * generator itself (exact field names; raw tokens rendered Python-side) —
  * so a diff here is a semantics bug in SubmissionRules, not a fixture
  * translation bug. Covers: per-doc schema errors (name/keywords/data_file/
  * data_license incl. required+addProps+maxLength, DOI pattern/length/type/
  * uniqueness, recid integer/minimum/uniqueness), cmenergies first-failure
  * gating, the has-submission-doc check, duplicate name/data_file
  * collection cutoffs, None docs, and additional-info-vs-table dispatch. */
class SubmissionConformanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private implicit val fmts: Formats = DefaultFormats

  test("replays the reference-generated 240-stream corpus byte-exact") {
    import spark.implicits._
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/golden/submission_conformance.jsonl"),
      "UTF-8")
    val cases = try src.getLines().map { line =>
      val j = JsonMethods.parse(line)
      val file = (j \ "file").extract[String]
      val docs = (j \ "docs").extract[List[graft.hep.SubDoc]]
      (SubFile(file, docs), (j \ "messages").extract[List[String]])
    }.toList finally src.close()
    assert(cases.size === 240)

    // one Spark job for the whole corpus
    val got = SubmissionRules.violations(cases.map(_._1).toDS().toDF())
      .orderBy("file", "seq").collect()
      .map(r => r.getAs[String]("file") -> r.getAs[String]("message"))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

    var nMsgs = 0
    cases.foreach { case (sub, expected) =>
      nMsgs += expected.size
      assert(got.getOrElse(sub.file, Seq.empty) === expected, sub.file)
    }
    info(s"240 streams, $nMsgs reference messages replayed")
    assert(nMsgs > 600)
  }
}
