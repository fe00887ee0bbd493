package graft

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.spec.JsonSchema

/** Replayer for tools/fuzz_jsonschema.py output — the standing fuzz gate:
  *
  *   python3 tools/fuzz_jsonschema.py 6000 <seed> refheavy > /tmp/f.jsonl
  *   sbt -batch "Test/runMain graft.FuzzReplay /tmp/f.jsonl"
  *
  * Prints a summary line and any divergent cases (schema, doc, got vs
  * expected); exits nonzero on divergence so campaigns can be scripted.
  * Divergences get distilled into the pinned conformance corpus. */
object FuzzReplay {
  private implicit val fmts: Formats = DefaultFormats

  def main(args: Array[String]): Unit = {
    val path = args(0)
    val maxShow = if (args.length > 1) args(1).toInt else 5
    val src = scala.io.Source.fromFile(path, "UTF-8")
    var n = 0; var nMsgs = 0; var bad = 0
    try src.getLines().foreach { line =>
      val j = JsonMethods.parse(line)
      val expected = (j \ "messages").extract[List[String]]
      val got: Either[String, List[String]] =
        try Right(JsonSchema.validate(JsonSchema.compile(j \ "schema"), j \ "doc"))
        catch {
          case e: IllegalArgumentException => Left(s"COMPILE-REJECT: ${e.getMessage}")
          case e: StackOverflowError => Left("STACK-OVERFLOW")
        }
      n += 1; nMsgs += expected.size
      if (got != Right(expected)) {
        bad += 1
        if (bad <= maxShow) {
          System.err.println(s"DIVERGENCE case $n")
          System.err.println(
            "  schema: " + JsonMethods.compact(JsonMethods.render(j \ "schema")))
          System.err.println(
            "  doc:    " + JsonMethods.compact(JsonMethods.render(j \ "doc")))
          System.err.println(s"  got:    $got")
          System.err.println(s"  exp:    $expected")
        }
      }
    } finally src.close()
    println(s"[fuzz-replay] $n cases, $nMsgs expected messages, $bad divergences")
    if (bad > 0) sys.exit(1)
  }
}
