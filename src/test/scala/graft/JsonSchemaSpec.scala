package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s.jackson.JsonMethods

import graft.spec.{JsonSchema, PyRepr, SchemaLoader, SchemaNotFoundException,
  SchemaResolver, SchemaStore}

/** Custom/remote JSON-Schema layer, translating the reference's
  * test_schema_resolver.py, test_schema_downloader.py and the custom-schema
  * halves of test_data_validator.py (:164-241). Golden messages were
  * generated with the reference implementation (jsonschema 4.x semantics,
  * formatting per hepdata_validator/__init__.py:159-182). */
class JsonSchemaSpec extends AnyFunSuite {

  val refData = java.nio.file.Paths.get("/root/reference/testsuite/test_data")
  def refFile(name: String): String =
    new String(java.nio.file.Files.readAllBytes(refData.resolve(name)),
      java.nio.charset.StandardCharsets.UTF_8)

  lazy val customSchema = JsonSchema.compile(refFile("custom_data_schema.json"))

  // valid_file_custom.yaml as JSON (the YAML fixture's exact content)
  val validCustomDoc =
    """{"type": "different",
       |"some_variables": [{"header": {"name": "SQRT(S)", "units": "GEV"},
       |                    "values": [{"value": 7000}]}]}""".stripMargin

  test("PyRepr matches Python repr conventions") {
    assert(PyRepr.str("abc") === "'abc'")
    assert(PyRepr.str("it's") === "\"it's\"")
    assert(PyRepr.str("a\"b'c") === "'a\"b\\'c'")
    assert(PyRepr.double(7000.0) === "7000.0")
    assert(PyRepr.double(0.443) === "0.443")
    assert(PyRepr.render(JsonMethods.parse("""{"a": true, "b": null, "c": [1, 2.5]}"""))
      === "{'a': True, 'b': None, 'c': [1, 2.5]}")
  }

  test("valid_file_custom.yaml validates against custom_data_schema (ref :182-196)") {
    val doc = JsonMethods.parse(validCustomDoc)
    assert(JsonSchema.validate(customSchema, doc) === Nil)
  }

  test("mismatched docs reproduce the reference's jsonschema messages") {
    def msgs(json: String): List[String] =
      JsonSchema.validate(customSchema, JsonMethods.parse(json))

    assert(msgs("""{"type": "different", "name": "x"}""") ===
      List("'some_variables' is a required property"))

    assert(msgs("""{"type": "different",
        |"some_variables": [{"header": {"name": 123}, "values": []}]}""".stripMargin) ===
      List("123 is not of type 'string' in 'some_variables[0].header.name' " +
        "(expected: {'id': 'http://hepdata.org/submission/schema/data/independent_variables/0/header/name', 'type': 'string'})"))

    assert(msgs("""{"type": "different", "some_variables": [], "bogus": 1}""") ===
      List("Additional properties are not allowed ('bogus' was unexpected)"))

    assert(msgs("""{"type": "different",
        |"some_variables": [{"header": {"name": "a", "foo": 2},
        |                    "values": [{"value": 1, "zzz": true}]}]}""".stripMargin) ===
      List(
        "Additional properties are not allowed ('foo' was unexpected) in 'some_variables[0].header' " +
          "(expected: {'id': 'http://hepdata.org/submission/schema/data/independent_variables/0/header', 'type': 'object', " +
          "'properties': {'name': {'id': 'http://hepdata.org/submission/schema/data/independent_variables/0/header/name', 'type': 'string'}, " +
          "'units': {'id': 'http://hepdata.org/submission/schema/data/independent_variables/0/header/units', 'type': 'string'}}, " +
          "'additionalProperties': False, 'required': ['name']})",
        "Additional properties are not allowed ('zzz' was unexpected) in 'some_variables[0].values[0]' " +
          "(expected: {'id': 'http://hepdata.org/submission/schema/data/independent_variables/0/values/1', 'type': 'object', " +
          "'properties': {'value': {'id': 'http://hepdata.org/submission/schema/data/independent_variables/0/values/1/value', 'type': ['string', 'number']}, " +
          "'low': {'id': 'http://hepdata.org/submission/schema/data/independent_variables/0/values/1/value', 'type': 'number'}, " +
          "'high': {'id': 'http://hepdata.org/submission/schema/data/independent_variables/0/values/1/value', 'type': 'number'}}, " +
          "'additionalProperties': False})"))
  }

  test("pyhf workspace schema: valid + invalid fixtures byte-exact (ref remote tests)") {
    val schema = JsonSchema.compile(refFile("custom_remote_data_schema.json"))
    val valid = JsonMethods.parse(
      refFile("TestRemoteSubmission/valid_file_custom_remote.json"))
    assert(JsonSchema.validate(schema, valid) === Nil)

    val invalid = JsonMethods.parse(
      refFile("TestRemoteSubmission_invalid/invalid_file_custom_remote.json"))
    val expected = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(getClass.getResource(
          "/golden/pyhf_invalid_messages.txt").toURI)),
      java.nio.charset.StandardCharsets.UTF_8).split("\n\n").toList
    assert(JsonSchema.validate(schema, invalid) === expected)
  }

  // ---------------------------------------------------------------- resolver

  val base = "https://testing.com/test-project/schemas/1.0.0/"
  val registry = Map(
    base + "widget.json" ->
      """{"$schema": "http://json-schema.org/draft-06/schema#",
         |"type": "object",
         |"properties": {
         |  "part": {"$ref": "defs.json#/definitions/part"},
         |  "alt": {"description": "keep me", "$ref": "#/definitions/local"}},
         |"definitions": {"local": {"type": "number", "description": "win"}}}""".stripMargin,
    base + "defs.json" ->
      """{"definitions": {"part": {"type": "object", "required": ["id"],
         |  "properties": {"id": {"$ref": "leaf.json"}}}}}""".stripMargin,
    base + "leaf.json" -> """{"type": "integer"}""")

  test("resolver trailing slash normalization (test_schema_resolver.py:42-52)") {
    val r = new SchemaResolver("https://testing.com/test-project/schemas/1.0.0",
      SchemaLoader.mapFetcher(registry))
    assert(r.baseUri === base)
  }

  test("$ref inlining: relative files, JSON pointers, sibling update semantics") {
    val r = new SchemaResolver(base, SchemaLoader.mapFetcher(registry))
    val resolved = r.resolve("widget.json")
    assert(resolved === JsonMethods.parse(
      """{"$schema": "http://json-schema.org/draft-06/schema#",
         |"type": "object",
         |"properties": {
         |  "part": {"type": "object", "required": ["id"],
         |           "properties": {"id": {"type": "integer"}}},
         |  "alt": {"description": "win", "type": "number"}},
         |"definitions": {"local": {"type": "number", "description": "win"}}}""".stripMargin))
  }

  test("unresolvable schema raises (test_schema_resolver.py:72-80)") {
    val r = new SchemaResolver(base, SchemaLoader.mapFetcher(registry))
    intercept[SchemaNotFoundException](r.resolve("random_name.json"))
    intercept[SchemaNotFoundException](r.resolve("defs.json#/definitions/nope"))
  }

  test("store URL-shape assertions (test_schema_downloader.py:60-76)") {
    val fetch = SchemaLoader.mapFetcher(registry)
    Seq(
      "ftp://testing.com/project/schemas/1.0.0",
      "https://testing.com/project/schemas/v1",
      "https://testing.com/schemas/1.0.0",
      "https://testing.com/project/1.0.0",
      "https://testing.com/1.0.0").foreach { bad =>
      intercept[IllegalArgumentException](new SchemaStore(bad, fetch))
    }
    val ok = new SchemaStore("https://testing.com/test-project/schemas/1.0.0", fetch)
    assert(ok.getSchemaType("custom.json") ===
      "https://testing.com/test-project/schemas/1.0.0/custom.json")
    assert((ok.org, ok.project, ok.version) === ("testing.com", "test-project", "1.0.0"))
  }

  test("store save_locally skips existing unless overwrite (:114-148)") {
    val fetch = SchemaLoader.mapFetcher(registry)
    val store = new SchemaStore(base, fetch)
    val dir = java.nio.file.Files.createTempDirectory("graft_schemas")
    val one = JsonMethods.parse("""{"key_1": "value_1"}""")
    val two = JsonMethods.parse("""{"key_1": "new_value_1"}""")
    val p = store.saveLocally(dir, "dummy.json", one, overwrite = true)
    assert(java.nio.file.Files.isRegularFile(p))
    store.saveLocally(dir, "dummy.json", two, overwrite = false)
    assert(JsonMethods.parse(new String(java.nio.file.Files.readAllBytes(p))) === one)
    store.saveLocally(dir, "dummy.json", two, overwrite = true)
    assert(JsonMethods.parse(new String(java.nio.file.Files.readAllBytes(p))) === two)
  }

  test("loader caches by full URL across repeat loads (test_full_submission_validator.py:108-119)") {
    val loader = new SchemaLoader(SchemaLoader.mapFetcher(registry))
    loader.loadRemoteSchema(base + "widget.json")
    assert(loader.loadedSchemas.size === 1)
    assert(loader.isLoaded(base + "widget.json"))
    loader.loadRemoteSchema(base + "widget.json")
    assert(loader.loadedSchemas.size === 1)
    assert(!loader.resolvable(base + "nope.json"))
    assert(loader.resolvable(base + "leaf.json"))
  }

  test("loader falls back to native $ref compilation for RECURSIVE remote schemas") {
    // the inline resolver (reference-faithful dict.update walk) hits its
    // depth guard on ref cycles — exactly where the reference's own
    // schema_resolver.py would RecursionError; the loader then compiles
    // with the evaluator's native RefCells instead, matching jsonschema's
    // never-inlining validation path
    val recRegistry = registry ++ Map(
      base + "tree.json" ->
        """{"$defs": {"node": {"type": "object",
           |  "properties": {"v": {"type": "number"},
           |    "kids": {"type": "array", "items": {"$ref": "#/$defs/node"}}},
           |  "required": ["v"]}},
           |"$ref": "#/$defs/node"}""".stripMargin,
      // CROSS-document cycle: a <-> b
      base + "a.json" ->
        """{"properties": {"b": {"$ref": "b.json"}, "x": {"type": "number"}}}""",
      base + "b.json" ->
        """{"properties": {"a": {"$ref": "a.json"}, "y": {"type": "string"}}}""")
    val loader = new SchemaLoader(SchemaLoader.mapFetcher(recRegistry))
    val tree = loader.loadRemoteSchema(base + "tree.json")
    // behavior identical to compiling the same schema directly (which the
    // 880-case corpus pins against the live reference)
    assert(JsonSchema.validate(tree, JsonMethods.parse(
      """{"v": 1, "kids": [{"v": "bad"}, {"kids": []}]}""")) === List(
      "'bad' is not of type 'number' in 'kids[0].v' (expected: {'type': 'number'})",
      "'v' is a required property in 'kids[1]' (expected: " +
        "{'type': 'object', 'properties': {'v': {'type': 'number'}, " +
        "'kids': {'type': 'array', 'items': {'$ref': '#/$defs/node'}}}, " +
        "'required': ['v']})"))
    val a = loader.loadRemoteSchema(base + "a.json")
    assert(JsonSchema.validate(a, JsonMethods.parse(
      """{"b": {"a": {"x": "bad"}}}""")) === List(
      "'bad' is not of type 'number' in 'b.a.x' (expected: {'type': 'number'})"))
    // non-recursive schemas still take the reference-faithful inline path
    val widget = loader.loadRemoteSchema(base + "widget.json")
    assert(JsonSchema.validate(widget, JsonMethods.parse(
      """{"part": {"id": "notint"}}""")).nonEmpty)
  }

  // ------------------------------------------------------- spark dispatch

  test("per-doc type dispatch over a DataFrame (data_file_validator.py:117-132)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Seq(
      ("ok.yaml", validCustomDoc.replaceAll("\\n", " "), "different"),
      ("bad.yaml", """{"type": "different", "name": "x"}""", "different"),
      ("unknown.yaml", """{"a": 1}""", "undefined"),
      ("standard.yaml", """{"a": 1}""", null.asInstanceOf[String]))
      .toDF("file", "json", "schemaType")
    val out = graft.compile.CustomSchemas.violations(
        docs, "file", "json", "schemaType",
        Seq("different" -> customSchema))
      .orderBy("file", "seq").collect()
      .map(r => (r.getString(0), r.getString(2)))
    assert(out.toSeq === Seq(
      "bad.yaml" -> "'some_variables' is a required property",
      "unknown.yaml" -> "There is no schema defined for the 'undefined' data type."))
  }

  test("RECURSIVE schema evaluates distributed through JsonSchemaCheck (cyclic graph serialization)") {
    // the cyclic RefCell graph must survive the real task-serialization
    // path, not just a driver-side ObjectOutputStream round-trip — run the
    // Catalyst expression over a repartitioned DataFrame
    val spark = TestSpark.spark
    import spark.implicits._
    val rec = JsonSchema.compile(
      """{"$defs": {"node": {"type": "object",
        |  "properties": {"v": {"type": "number"},
        |    "kids": {"type": "array", "items": {"$ref": "#/$defs/node"}}},
        |  "required": ["v"]}},
        |"$ref": "#/$defs/node"}""".stripMargin)
    val docs = Seq(
      ("a.yaml", """{"v": 1, "kids": [{"v": 2}]}"""),
      ("b.yaml", """{"v": 1, "kids": [{"kids": []}]}"""),
      ("c.yaml", """{"v": "s"}"""))
      .toDF("file", "json").repartition(3)
    val out = graft.compile.CustomSchemas.violations(
        docs.withColumn("schemaType",
          org.apache.spark.sql.functions.lit("tree")),
        "file", "json", "schemaType", Seq("tree" -> rec))
      .orderBy("file", "seq").collect()
      .map(r => (r.getString(0), r.getString(2)))
    assert(out.toSeq === Seq(
      "b.yaml" -> ("'v' is a required property in 'kids[0]' (expected: " +
        "{'type': 'object', 'properties': {'v': {'type': 'number'}, " +
        "'kids': {'type': 'array', 'items': {'$ref': '#/$defs/node'}}}, " +
        "'required': ['v']})"),
      "c.yaml" -> ("'s' is not of type 'number' in 'v' (expected: " +
        "{'type': 'number'})")))
  }

  test("dispatch on the doc's own 'type' key (data_file_validator.py:123-125)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Seq(
      // valid_file_custom.yaml carries type: "different" in the doc itself
      ("ok.yaml", validCustomDoc.replaceAll("\\n", " ")),
      ("bad.yaml", """{"type": "different", "name": "x"}"""),
      ("unknown.yaml", """{"type": "histfactory", "a": 1}"""),
      ("standard.yaml", """{"a": 1}""")) // no type key -> standard path
      .toDF("file", "json")
    val out = graft.compile.CustomSchemas.violationsByDocType(
        docs, "file", "json", Seq("different" -> customSchema))
      .orderBy("file", "seq").collect()
      .map(r => (r.getString(0), r.getString(2)))
    assert(out.toSeq === Seq(
      "bad.yaml" -> "'some_variables' is a required property",
      "unknown.yaml" -> "There is no schema defined for the 'histfactory' data type."))
  }
}
