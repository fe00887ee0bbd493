package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.ingest._

/** Differential replay of the 515-token scalar corpus
  * (tools/gen_pyyaml_scalar_corpus.py, seed 49): every token parsed as
  * `k: <token>` must construct the same Python kind and render the same
  * str()/repr() as the reference's YamlLoader — the YAML-1.1 resolver
  * quirks (`1.0e2` is a str, `010` is octal, `1:30` is 90, exponent needs
  * a sign) are exactly what HepModel's raw-token fields preserve. */
class PyYamlScalarSpec extends AnyFunSuite {
  private implicit val fmts: Formats = DefaultFormats

  private def kindOf(v: PyVal): String = v match {
    case PNone => "null"
    case _: PBool => "bool"
    case _: PInt => "int"
    case _: PFloat => "float"
    case _: PStr => "str"
    case d: PDate =>
      if (d.pyRepr.startsWith("datetime.datetime")) "datetime" else "date"
    case other => other.getClass.getSimpleName
  }

  test("515 scalar tokens resolve and render byte-identically") {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/golden/pyyaml_scalars.jsonl"), "UTF-8")
    val cases = try src.getLines().map { line =>
      val j = JsonMethods.parse(line)
      ((j \ "token").extract[String], (j \ "kind").extract[String],
        (j \ "str").extract[String], (j \ "repr").extractOpt[String])
    }.toList finally src.close()
    assert(cases.size === 515)

    val bad = cases.flatMap { case (token, kind, str, reprOpt) =>
      val got = try {
        PyYamlParse.load("k: " + token + "\n", "<unicode string>") match {
          case m: PMap => m.get("k") match {
            case Some(v) => Right(v)
            case None => Left("carrier-missing-k")
          }
          case other => Left(s"carrier-not-map: $other")
        }
      } catch {
        case e: PyYamlError => Left("ERR:" + e.rendered)
      }
      (kind, got) match {
        case ("ERR", Left(msg)) if msg == "ERR:" + str => None
        case ("ERR", other) => Some((token, s"expected ERR '$str', got $other"))
        case (_, Left(msg)) => Some((token, s"expected $kind, got error $msg"))
        case (_, Right(v)) =>
          if (kindOf(v) != kind)
            Some((token, s"kind: expected $kind, got ${kindOf(v)} (${v.pyRepr})"))
          else if (v.pyStr != str)
            Some((token, s"str: expected '$str', got '${v.pyStr}'"))
          else if (reprOpt.exists(_ != v.pyRepr))
            Some((token, s"repr: expected '${reprOpt.get}', got '${v.pyRepr}'"))
          else None
      }
    }
    bad.take(10).foreach { case (t, m) => info(s"MISMATCH '$t': $m") }
    assert(bad.isEmpty, s"${bad.size} of ${cases.size} tokens mismatch")
  }
}
