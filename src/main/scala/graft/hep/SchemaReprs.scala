package graft.hep

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.spec.PyRepr

/** Python-repr constants of data-schema subsections, derived at class-load
  * from the PUBLISHED schema files (resources/hepdata_schemas/<version>/
  * data_schema.json — the reference freezes 0.1.0/1.0.0/1.0.1/1.1.0/1.1.1
  * under hepdata_validator/schemas/). jsonschema embeds these reprs verbatim
  * in its messages ("(expected: {...})"), and they differ structurally by
  * version: 0.1.0 carries 'id' keys and a flat value form, 1.0.x drops the
  * ids, 1.1.x switches independent values to oneOf. Deriving them from the
  * schema files (via [[graft.spec.PyRepr]]) instead of hand-embedding keeps
  * every version byte-consistent with the source of truth; a spec test pins
  * the derived 1.1.1 values against the previously hand-embedded constants. */
final case class SchemaReprs(
    indepArray: String, depArray: String,
    indepLow: String, indepHigh: String,
    indepValueItem: String, indepItem: String,
    depValueItem: String, depItem: String,
    errorLabel: String, errorItem: String, errorAsym: String,
    errorSym: String, errorAsymMinus: String, errorAsymPlus: String,
    indepHeader: String, indepHeaderName: String, indepHeaderUnits: String,
    depHeader: String, depHeaderName: String, depHeaderUnits: String,
    depQualifiers: String, depQualifierItem: String,
    depQualifierName: String, depQualifierValue: String,
    depQualifierUnits: String)

object SchemaReprs {

  private def schema(version: SchemaVersion): JValue = {
    val dir = s"${version.major}.${version.minor}.${version.patch}"
    val in = getClass.getResourceAsStream(s"/hepdata_schemas/$dir/data_schema.json")
    require(in != null, s"no published data schema for version $dir")
    try JsonMethods.parse(new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8))
    finally in.close()
  }

  private val cache =
    scala.collection.concurrent.TrieMap[SchemaVersion, SchemaReprs]()

  def forVersion(version: SchemaVersion): SchemaReprs =
    cache.getOrElseUpdate(version, {
      val s = schema(version)
      val indepItem = s \ "properties" \ "independent_variables" \ "items"
      val valueItem = indepItem \ "properties" \ "values" \ "items"
      val depItem = s \ "properties" \ "dependent_variables" \ "items"
      val depValueItem = depItem \ "properties" \ "values" \ "items"
      val errItem = depValueItem \ "properties" \ "errors" \ "items"
      val label = errItem \ "properties" \ "label"
      def flatProp(k: String): String =
        PyRepr.render(valueItem \ "properties" \ k)
      SchemaReprs(
        indepArray = PyRepr.render(s \ "properties" \ "independent_variables"),
        depArray = PyRepr.render(s \ "properties" \ "dependent_variables"),
        indepLow = if (version >= SchemaVersion.V110) "" else flatProp("low"),
        indepHigh = if (version >= SchemaVersion.V110) "" else flatProp("high"),
        indepValueItem = PyRepr.render(valueItem),
        indepItem = PyRepr.render(indepItem),
        depValueItem = PyRepr.render(depValueItem),
        depItem = PyRepr.render(depItem),
        errorLabel = PyRepr.render(label),
        errorItem = PyRepr.render(errItem),
        errorAsym = PyRepr.render(errItem \ "properties" \ "asymerror"),
        errorSym = PyRepr.render(errItem \ "properties" \ "symerror"),
        errorAsymMinus = PyRepr.render(
          errItem \ "properties" \ "asymerror" \ "properties" \ "minus"),
        errorAsymPlus = PyRepr.render(
          errItem \ "properties" \ "asymerror" \ "properties" \ "plus"),
        indepHeader = PyRepr.render(indepItem \ "properties" \ "header"),
        indepHeaderName = PyRepr.render(
          indepItem \ "properties" \ "header" \ "properties" \ "name"),
        indepHeaderUnits = PyRepr.render(
          indepItem \ "properties" \ "header" \ "properties" \ "units"),
        depHeader = PyRepr.render(depItem \ "properties" \ "header"),
        depHeaderName = PyRepr.render(
          depItem \ "properties" \ "header" \ "properties" \ "name"),
        depHeaderUnits = PyRepr.render(
          depItem \ "properties" \ "header" \ "properties" \ "units"),
        depQualifiers = PyRepr.render(depItem \ "properties" \ "qualifiers"),
        depQualifierItem = PyRepr.render(
          depItem \ "properties" \ "qualifiers" \ "items"),
        depQualifierName = PyRepr.render(
          depItem \ "properties" \ "qualifiers" \ "items" \ "properties" \ "name"),
        depQualifierValue = PyRepr.render(
          depItem \ "properties" \ "qualifiers" \ "items" \ "properties" \ "value"),
        depQualifierUnits = PyRepr.render(
          depItem \ "properties" \ "qualifiers" \ "items" \ "properties" \ "units"))
    })
}
