package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._

import graft.hep.{HepRow, SubDoc, SubFile}
import graft.ingest.YamlIngest

/** Raw-YAML ingestion differential: the corpus generators now emit the
  * original YAML text next to each Python-side row translation, so the
  * Scala ingester (PyYamlParse + YamlIngest) must reproduce the translated
  * rows EXACTLY from the raw bytes — 300 data-file docs and 240
  * submission streams. Row equality implies message equality: the
  * rows→messages path is pinned separately by
  * DataFileConformanceSpec/SubmissionConformanceSpec on the same rows. */
class YamlIngestConformanceSpec extends AnyFunSuite {
  private implicit val fmts: Formats = DefaultFormats

  private def lines(res: String): List[JValue] = {
    val lenient = new com.fasterxml.jackson.databind.ObjectMapper()
    lenient.enable(com.fasterxml.jackson.core.json.JsonReadFeature
      .ALLOW_NON_NUMERIC_NUMBERS.mappedFeature())
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream(res), "UTF-8")
    try src.getLines().map(l =>
      org.json4s.jackson.JsonMethods.fromJsonNode(lenient.readTree(l))).toList
    finally src.close()
  }

  test("300 data-file docs ingest from raw YAML to the exact corpus rows") {
    val cases = lines("/golden/datafile_conformance.jsonl")
    assert(cases.size === 300)
    val bad = cases.flatMap { j =>
      val file = (j \ "file").extract[String]
      val expected = (j \ "row").extract[HepRow]
      val raw = (j \ "yaml").extract[String]
      val got = YamlIngest.parseDataFile(file, raw)
      if (got == expected) None
      else Some((file, diff(got.toString, expected.toString)))
    }
    bad.take(5).foreach { case (f, d) => info(s"MISMATCH $f: $d") }
    assert(bad.isEmpty, s"${bad.size} of 300 docs mismatch")
  }

  test("240 submission streams ingest from raw YAML to the exact corpus docs") {
    val cases = lines("/golden/submission_conformance.jsonl")
    assert(cases.size === 240)
    val bad = cases.flatMap { j =>
      val file = (j \ "file").extract[String]
      val expected = (j \ "docs").extract[List[SubDoc]]
      val raw = (j \ "yaml").extract[String]
      val got = YamlIngest.parseSubmission(file, raw).docs.toList
      if (got == expected) None
      else Some((file, diff(got.toString, expected.toString)))
    }
    bad.take(5).foreach { case (f, d) => info(s"MISMATCH $f: $d") }
    assert(bad.isEmpty, s"${bad.size} of 240 streams mismatch")
  }

  private case class DocRow(docIdx: Int, name: Option[String],
      resources: Seq[String])

  test("80 single-YAML streams split from raw YAML to the exact corpus tables") {
    val cases = lines("/golden/singleyaml_conformance.jsonl")
    assert(cases.size === 80)
    val bad = cases.flatMap { j =>
      val file = (j \ "file").extract[String]
      val expSub = (j \ "sub").extract[SubFile]
      val expDocs = (j \ "docs").extract[List[DocRow]]
        .map(d => (d.docIdx, d.name.orNull, d.resources))
      val expHep = (j \ "hepRows").extract[List[HepRow]]
      val raw = (j \ "yaml").extract[String]
      val got = YamlIngest.splitSingleYaml(file, raw)
      val problems = List(
        (got.sub != expSub) -> "sub",
        (got.docs.toList != expDocs) -> "docs",
        (got.hepRows.toList != expHep) -> "hepRows"
      ).collect { case (true, m) => m }
      if (problems.isEmpty) None
      else Some((file, problems.mkString(",") +
        (if (got.sub != expSub) diff(got.sub.toString, expSub.toString) else "")))
    }
    bad.take(5).foreach { case (f, d) => info(s"MISMATCH $f: $d") }
    assert(bad.isEmpty, s"${bad.size} of 80 streams mismatch")
  }

  /** First point of divergence, for readable failure output. */
  private def diff(a: String, b: String): String = {
    val i = a.zip(b).indexWhere { case (x, y) => x != y }
    val at = if (i < 0) math.min(a.length, b.length) else i
    val s = math.max(0, at - 60)
    s"...got[${a.slice(s, at + 60)}] vs exp[${b.slice(s, at + 60)}]"
  }
}
