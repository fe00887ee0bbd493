package graft.spec

import org.json4s._
import org.json4s.jackson.JsonMethods

/** JSON (de)serialization of [[TableSpec]] — the engine's declarative spec
  * is a config artifact, the analogue of the reference's JSON Schema files
  * (versioned, reviewed, shipped separately from code). json4s ships with
  * Spark. Example:
  *
  * {{{
  * {"table":"pages","partitionColumn":"part_id","keyColumns":["url"],
  *  "rules":[
  *    {"type":"notNull","column":"url"},
  *    {"type":"regex","column":"url","pattern":"^https?://"},
  *    {"type":"enum","column":"lang","values":["en","de"]},
  *    {"type":"maxLength","column":"name","n":64},
  *    {"type":"minimum","column":"n_chars","min":1},
  *    {"type":"numericString","column":"sym"},
  *    {"type":"between","column":"warc_ts","lo":"timestamp'2024-01-01'","hi":"timestamp'2026-12-31'"},
  *    {"type":"notContains","column":"data_file","needle":"/"},
  *    {"type":"expr","id":"custom","column":"x","predicateSql":"x > 0","messageSql":"'x must be positive'"}]}
  * }}}
  */
object SpecJson {
  private implicit val fmts: Formats = DefaultFormats

  def parseRule(j: JValue): Rule = (j \ "type").extract[String] match {
    case "notNull" => NotNull((j \ "column").extract[String],
      (j \ "typeName").extractOrElse[String]("string"))
    case "regex" => MatchesRegex((j \ "column").extract[String],
      (j \ "pattern").extract[String])
    case "enum" => InSet((j \ "column").extract[String],
      (j \ "values").extract[Seq[String]])
    case "maxLength" => MaxLen((j \ "column").extract[String],
      (j \ "n").extract[Int])
    case "minimum" => MinValue((j \ "column").extract[String],
      (j \ "min").extract[Double])
    case "numericString" => NumericString((j \ "column").extract[String],
      (j \ "allowPercent").extractOrElse[Boolean](true))
    case "equals" => EqualsExpr((j \ "column").extract[String],
      (j \ "sqlExpr").extract[String], (j \ "exprLabel").extract[String])
    case "between" => Between((j \ "column").extract[String],
      (j \ "lo").extract[String], (j \ "hi").extract[String])
    case "notContains" => NotContains((j \ "column").extract[String],
      (j \ "needle").extract[String])
    case "expr" => ExprRule((j \ "id").extract[String],
      (j \ "column").extract[String],
      (j \ "predicateSql").extract[String],
      (j \ "messageSql").extract[String],
      (j \ "level").extractOrElse[String]("error"))
    case other => throw new IllegalArgumentException(s"unknown rule type: $other")
  }

  def parse(json: String): TableSpec = {
    val j = JsonMethods.parse(json)
    TableSpec(
      table = (j \ "table").extract[String],
      partitionColumn = (j \ "partitionColumn").extract[String],
      keyColumns = (j \ "keyColumns").extract[Seq[String]],
      rules = (j \ "rules").extract[Seq[JValue]].map(parseRule))
  }

  def load(path: String): TableSpec =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))

  def toJson(spec: TableSpec): String = {
    def ruleJ(r: Rule): JValue = r match {
      case NotNull(c, t) => JObject("type" -> JString("notNull"),
        "column" -> JString(c), "typeName" -> JString(t))
      case MatchesRegex(c, p) => JObject("type" -> JString("regex"),
        "column" -> JString(c), "pattern" -> JString(p))
      case InSet(c, vs) => JObject("type" -> JString("enum"),
        "column" -> JString(c), "values" -> JArray(vs.map(JString(_)).toList))
      case MaxLen(c, n) => JObject("type" -> JString("maxLength"),
        "column" -> JString(c), "n" -> JInt(n))
      case MinValue(c, m) => JObject("type" -> JString("minimum"),
        "column" -> JString(c), "min" -> JDouble(m))
      case NumericString(c, a) => JObject("type" -> JString("numericString"),
        "column" -> JString(c), "allowPercent" -> JBool(a))
      case EqualsExpr(c, e, l) => JObject("type" -> JString("equals"),
        "column" -> JString(c), "sqlExpr" -> JString(e), "exprLabel" -> JString(l))
      case Between(c, lo, hi) => JObject("type" -> JString("between"),
        "column" -> JString(c), "lo" -> JString(lo), "hi" -> JString(hi))
      case NotContains(c, n) => JObject("type" -> JString("notContains"),
        "column" -> JString(c), "needle" -> JString(n))
      case ExprRule(id, c, p, m, lvl) => JObject("type" -> JString("expr"),
        "id" -> JString(id), "column" -> JString(c),
        "predicateSql" -> JString(p), "messageSql" -> JString(m),
        "level" -> JString(lvl))
    }
    JsonMethods.compact(JsonMethods.render(JObject(
      "table" -> JString(spec.table),
      "partitionColumn" -> JString(spec.partitionColumn),
      "keyColumns" -> JArray(spec.keyColumns.map(JString(_)).toList),
      "rules" -> JArray(spec.rules.map(ruleJ).toList))))
  }
}
