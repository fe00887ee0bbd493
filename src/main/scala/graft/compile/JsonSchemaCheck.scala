package graft.compile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.spec.JsonSchema

/** Validate a JSON document column against a driver-compiled JSON Schema
  * ([[graft.spec.JsonSchema.Compiled]]), returning the array of formatted
  * violation messages (empty array = valid).
  *
  * This is the custom-schema analogue of the fused rule scan: the schema is
  * compiled once on the driver and shipped inside the expression tree; each
  * row is parsed and walked in a single recursive pass on the executor —
  * no Python UDF, no jsonschema library, participates in whole-stage
  * codegen (kernel call through a reference object, like the signature
  * expressions). Ref: data_file_validator.py:117-134 dispatches per-doc to
  * `load_custom_schema(...)` + `_validate_json_against_schema`.
  */
case class JsonSchemaCheck(child: Expression, schema: JsonSchema.Compiled)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "json_schema_check"

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  def compute(s: UTF8String): ArrayData = {
    val msgs: Seq[String] =
      try {
        val doc = org.json4s.jackson.JsonMethods.parse(s.toString)
        JsonSchema.validate(schema, doc)
      } catch {
        case e: Exception =>
          Seq("There was a problem parsing the file.\n" + e.getMessage)
      }
    new GenericArrayData(msgs.map(UTF8String.fromString).toArray[Any])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("jsonSchemaCheck", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): JsonSchemaCheck =
    copy(child = c)
}

/** Per-document custom-schema dispatch: the engine-side translation of
  * `DataFileValidator.validate`'s `file_type` / `data['type']` branch
  * (data_file_validator.py:117-132): documents carrying a schema type are
  * validated against the registered schema for that type, unknown types get
  * the reference's `UnsupportedDataSchemaException` message. */
object CustomSchemas {

  def unsupportedMessage(tpe: Column): Column =
    concat(lit("There is no schema defined for the '"), tpe,
      lit("' data type."))

  /** Message-array column for a (json, type) pair given the registered
    * schema map: `when(type = t1, check_t1(json)) ... otherwise(unsupported)`.
    * A null type yields null (caller routes those docs to the standard
    * HEPData rules instead). */
  def messagesFor(json: Column, tpe: Column,
      schemas: Seq[(String, JsonSchema.Compiled)]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    val dispatched = schemas.foldRight(
        array(unsupportedMessage(tpe)): Column) { case ((t, compiled), rest) =>
      when(tpe === t, ColumnBridge.column(
          JsonSchemaCheck(ColumnBridge.expression(json), compiled)))
        .otherwise(rest)
    }
    when(tpe.isNull, lit(null).cast("array<string>")).otherwise(dispatched)
  }

  /** Dispatch on the document's OWN `type` key (data_file_validator.py:
    * 123-125: `elif 'type' in data: data_schema = load_custom_schema(
    * data['type'])`) — no explicit schemaType column needed; docs without a
    * `type` key get null (the standard-schema path). */
  def violationsByDocType(docs: DataFrame, fileCol: String, jsonCol: String,
      schemas: Seq[(String, JsonSchema.Compiled)]): DataFrame =
    violations(
      docs.withColumn("_docType", get_json_object(col(jsonCol), "$.type")),
      fileCol, jsonCol, "_docType", schemas)

  /** Violations of a (file, json, schemaType) documents table:
    * (file, seq, message) — one row per failed check, seq in jsonschema
    * iteration order. Docs with a null schemaType are passed through
    * untouched only if `keepNullType` (they belong to the standard-schema
    * path). */
  def violations(docs: DataFrame, fileCol: String, jsonCol: String,
      typeCol: String,
      schemas: Seq[(String, JsonSchema.Compiled)]): DataFrame = {
    docs
      .select(col(fileCol).as("file"),
        messagesFor(col(jsonCol), col(typeCol), schemas).as("msgs"))
      .where(col("msgs").isNotNull && size(col("msgs")) > 0)
      .select(col("file"), posexplode(col("msgs")))
      .select(col("file"), col("pos").cast("int").as("seq"),
        col("col").as("message"))
  }
}
