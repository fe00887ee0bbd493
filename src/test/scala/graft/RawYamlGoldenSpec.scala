package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

/** The driver's `raw_yaml_violations` fixtures validated against the LIVE
  * reference's recorded messages (tools/gen_rawyaml_golden.py ran the
  * reference DataFileValidator over the same resource bytes): raw YAML →
  * executor-side ingest → rules must reproduce all 25 messages byte-exact,
  * including the "No data found in file." empty-document path. */
class RawYamlGoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private implicit val fmts: Formats = DefaultFormats

  test("raw-YAML fixture messages match the reference byte-exact") {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/golden/rawyaml_messages.jsonl"), "UTF-8")
    val expected = try src.getLines().map { l =>
      val j = JsonMethods.parse(l)
      (j \ "file").extract[String] -> (j \ "messages").extract[List[String]]
    }.toList finally src.close()
    assert(expected.size === 11)

    val got = SparkEntry.queries("raw_yaml_violations")(spark, "unused")
      .collect()
      .map(r => r.getAs[String]("file") -> r.getAs[String]("message"))
      .groupBy(_._1).view.mapValues(_.map(_._2).toList).toMap

    var nMsgs = 0
    val bad = expected.flatMap { case (f, exp) =>
      nMsgs += exp.size
      val g = got.getOrElse(f, Nil)
      if (g == exp) None else Some((f, g, exp))
    }
    bad.take(3).foreach { case (f, g, e) =>
      info(s"MISMATCH $f")
      g.zipAll(e, "<missing>", "<missing>").foreach {
        case (a, b) if a != b =>
          info(s"  got: ${a.take(250)}"); info(s"  exp: ${b.take(250)}")
        case _ => ()
      }
    }
    assert(bad.isEmpty, s"${bad.size} of 11 files mismatch")
    info(s"$nMsgs reference messages replayed through the raw-YAML path")
  }
}
