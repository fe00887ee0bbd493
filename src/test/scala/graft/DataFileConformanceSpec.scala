package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._

import graft.hep.{HepDataRules, HepRow}

/** Differential conformance replay for the data-file rules: 300
  * seeded-random documents (tools/gen_datafile_corpus.py, seed 46) whose
  * expected messages come from the live reference DataFileValidator, with
  * the HepRow translation computed by the generator (exact field names,
  * Python-side raw/repr rendering) — a diff is a semantics bug, not a
  * fixture translation bug. Exercises the full interplay: indep oneOf and
  * flat forms, var-level required/addProps, every error-mapping shape
  * (oneOf both ways, member types, bools, stale reuse, aborts), length
  * consistency, string ranges, inf bins, and phase suppression. */
class DataFileConformanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private implicit val fmts: Formats = DefaultFormats

  test("replays the reference-generated 300-doc corpus byte-exact") {
    import spark.implicits._
    // ±inf bin edges serialize as Python's non-standard Infinity tokens
    val lenient = new com.fasterxml.jackson.databind.ObjectMapper()
    lenient.enable(com.fasterxml.jackson.core.json.JsonReadFeature
      .ALLOW_NON_NUMERIC_NUMBERS.mappedFeature())
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/golden/datafile_conformance.jsonl"),
      "UTF-8")
    val cases = try src.getLines().map { line =>
      val j = org.json4s.jackson.JsonMethods.fromJsonNode(lenient.readTree(line))
      ((j \ "row").extract[HepRow], (j \ "messages").extract[List[String]])
    }.toList finally src.close()
    assert(cases.size === 300)

    val got = HepDataRules.violations(cases.map(_._1).toDS().toDF())
      .orderBy("file", "seq").collect()
      .map(r => r.getAs[String]("file") -> r.getAs[String]("message"))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

    var nMsgs = 0
    val bad = cases.flatMap { case (row, expected) =>
      nMsgs += expected.size
      val g = got.getOrElse(row.file, Seq.empty)
      if (g == expected) None else Some((row.file, g, expected))
    }
    bad.take(3).foreach { case (f, g, e) =>
      info(s"MISMATCH $f")
      g.zipAll(e, "<missing>", "<missing>").zipWithIndex.foreach {
        case ((a, b), i) if a != b =>
          info(s"  [$i] got: $a"); info(s"  [$i] exp: $b")
        case _ => ()
      }
    }
    assert(bad.isEmpty, s"${bad.size} of 300 docs mismatch")
    info(s"300 docs, $nMsgs reference messages replayed")
    assert(nMsgs > 1000)
  }
}
