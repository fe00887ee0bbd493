package graft

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.hep.{HepDataRules, HepRow, SubDoc}
import graft.ingest._

/** Fresh-seed fuzz replayer for the raw-YAML ingestion chain — the
  * standing sweep companion to the pinned corpora:
  *
  *   python3 tools/gen_pyyaml_scalar_corpus.py 3000 <seed> > /tmp/s.jsonl
  *   sbt -batch "Test/runMain graft.IngestFuzzReplay scalars /tmp/s.jsonl"
  *   python3 tools/gen_datafile_corpus.py 1500 <seed> > /tmp/d.jsonl
  *   sbt -batch "Test/runMain graft.IngestFuzzReplay datafile /tmp/d.jsonl"
  *   python3 tools/gen_submission_corpus.py 800 <seed> > /tmp/u.jsonl
  *   sbt -batch "Test/runMain graft.IngestFuzzReplay submission /tmp/u.jsonl"
  *
  * scalars: kind/str/repr parity per token. datafile: raw YAML → HepRow
  * equality AND HepDataRules messages vs the live reference's.
  * submission: raw stream → SubDoc equality. Exits nonzero on divergence.
  */
object IngestFuzzReplay {
  private implicit val fmts: Formats = DefaultFormats

  def main(args: Array[String]): Unit = {
    val (kind, path) = (args(0), args(1))
    val lenient = new com.fasterxml.jackson.databind.ObjectMapper()
    lenient.enable(com.fasterxml.jackson.core.json.JsonReadFeature
      .ALLOW_NON_NUMERIC_NUMBERS.mappedFeature())
    val src = scala.io.Source.fromFile(path, "UTF-8")
    val cases = try src.getLines().map(l =>
      JsonMethods.fromJsonNode(lenient.readTree(l))).toList
    finally src.close()

    var bad = 0
    def report(what: String, detail: => String): Unit = {
      bad += 1
      if (bad <= 5) System.err.println(s"DIVERGENCE $what\n  $detail")
    }

    kind match {
      case "scalars" =>
        cases.foreach { j =>
          val token = (j \ "token").extract[String]
          val expKind = (j \ "kind").extract[String]
          val expStr = (j \ "str").extract[String]
          val got: Either[String, PyVal] =
            try PyYamlParse.load("k: " + token + "\n", "<unicode string>") match {
              case m: PMap => m.get("k").toRight("no k")
              case other => Left(s"root $other")
            } catch { case e: PyYamlError => Left("ERR:" + e.rendered) }
          (expKind, got) match {
            case ("ERR", Left(m)) if m == "ERR:" + expStr => ()
            case (_, Right(v)) if expKind != "ERR" &&
              v.pyStr == expStr && kindName(v) == expKind => ()
            case _ => report(s"token '$token'", s"expected $expKind '$expStr', got $got")
          }
        }
      case "datafile" =>
        val spark = TestSpark.spark
        import spark.implicits._
        val rows = cases.map { j =>
          val file = (j \ "file").extract[String]
          val expRow = (j \ "row").extract[HepRow]
          val raw = (j \ "yaml").extract[String]
          val got = YamlIngest.parseDataFile(file, raw)
          if (got != expRow) report(s"row $file", "ingested row differs")
          got
        }
        val gotMsgs = HepDataRules.violations(rows.toDS().toDF())
          .orderBy("file", "seq").collect()
          .map(r => r.getAs[String]("file") -> r.getAs[String]("message"))
          .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
        cases.foreach { j =>
          val file = (j \ "file").extract[String]
          val exp = (j \ "messages").extract[List[String]]
          val g = gotMsgs.getOrElse(file, Seq.empty)
          if (g != exp) report(s"messages $file",
            g.zipAll(exp, "<missing>", "<missing>")
              .collectFirst { case (a, b) if a != b => s"got $a\n  exp $b" }
              .getOrElse(""))
        }
      case "submission" =>
        cases.foreach { j =>
          val file = (j \ "file").extract[String]
          val expDocs = (j \ "docs").extract[List[SubDoc]]
          val raw = (j \ "yaml").extract[String]
          val got = YamlIngest.parseSubmission(file, raw).docs.toList
          if (got != expDocs) report(s"stream $file", "ingested docs differ")
        }
    }
    println(s"[ingest-fuzz] $kind: ${cases.size} cases, $bad divergences")
    if (bad > 0) sys.exit(1)
  }

  private def kindName(v: PyVal): String = v match {
    case PNone => "null"
    case _: PBool => "bool"
    case _: PInt => "int"
    case _: PFloat => "float"
    case _: PStr => "str"
    case d: PDate =>
      if (d.pyRepr.startsWith("datetime.datetime")) "datetime" else "date"
    case other => other.getClass.getSimpleName
  }
}
