package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.json4s._

import graft.spec.JsonSchema

/** ScalaCheck properties for the compiled JSON-Schema evaluator: at 10^12
  * docs a single malformed document must never throw out of the expression,
  * and validity must be exactly "no errors". */
object JsonSchemaProps extends Properties("JsonSchema") {

  val leaf: Gen[JValue] = Gen.oneOf(
    Gen.alphaStr.map(JString(_)),
    Gen.choose(-1000000L, 1000000L).map(n => JInt(BigInt(n))),
    Gen.choose(-1e6, 1e6).map(JDouble(_)),
    Gen.oneOf(JBool(true), JBool(false), JNull),
    Gen.const(JDouble(Double.PositiveInfinity)),
    Gen.const(JDouble(Double.NaN)))

  def jvalue(depth: Int): Gen[JValue] =
    if (depth <= 0) leaf
    else Gen.frequency(
      4 -> leaf,
      2 -> Gen.listOfN(3, jvalue(depth - 1)).map(JArray(_)),
      2 -> (for {
        ks <- Gen.listOfN(3, Gen.oneOf("a", "b", "c", "value", "low", "type", "extra"))
        vs <- Gen.listOfN(3, jvalue(depth - 1))
      } yield JObject(ks.distinct.zip(vs).toList)))

  val schemas: Seq[JsonSchema.Compiled] = Seq(
    """{"type": "object", "properties": {"a": {"type": "integer", "minimum": 0},
       |"b": {"type": "array", "items": {"type": "string", "maxLength": 3},
       |"minItems": 1}}, "required": ["a"], "additionalProperties": false}""".stripMargin,
    """{"oneOf": [{"type": "object", "properties": {"value": {"type": ["string", "number"]}},
       |"required": ["value"], "additionalProperties": false},
       |{"type": "object", "properties": {"low": {"type": "number"},
       |"high": {"type": "number"}}, "required": ["low", "high"],
       |"additionalProperties": false}]}""".stripMargin,
    """{"anyOf": [{"enum": ["x", 1, true]}, {"type": "array",
       |"items": {"const": 5}, "uniqueItems": true},
       |{"type": "string", "pattern": "^[a-z]+$", "minLength": 2}]}""".stripMargin)
    .map(JsonSchema.compile)

  lazy val published: Seq[JsonSchema.Compiled] =
    Seq("0.1.0", "1.0.0", "1.0.1", "1.1.0", "1.1.1").map { v =>
      val in = getClass.getResourceAsStream(s"/hepdata_schemas/$v/data_schema.json")
      try JsonSchema.compile(new String(in.readAllBytes(), "UTF-8"))
      finally in.close()
    }

  property("never throws; validity == no errors; formatting total") =
    forAll(jvalue(3), Gen.choose(0, schemas.size - 1)) { (doc: JValue, si: Int) =>
      val s = schemas(si)
      val msgs = JsonSchema.validate(s, doc) // must not throw
      JsonSchema.errors(s, doc).foreach(JsonSchema.format)
      msgs.forall(_.nonEmpty) && (JsonSchema.isValid(s, doc) == msgs.isEmpty)
    }

  property("published HEPData schemas never throw on arbitrary docs") =
    forAll(jvalue(3)) { (doc: JValue) =>
      published.forall { s =>
        JsonSchema.validate(s, doc)
        true
      }
    }
}
