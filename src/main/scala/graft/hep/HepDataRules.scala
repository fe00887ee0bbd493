package graft.hep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-file validation (ref: hepdata_validator/data_file_validator.py) as a
  * SINGLE fused Catalyst projection per document row.
  *
  * Every check family builds an array of violation structs inside nested
  * `transform`/`filter` lambdas (whole-stage codegen'd, no UDFs); the arrays
  * are concatenated, `array_sort`ed by the reference's emission order and
  * fanned out with `posexplode` — only rows that actually have violations pay
  * the explode. At 10^12 rows this is one scan, no shuffle.
  *
  * Emission-order model (sort key = (phase, k1..k5)):
  *  - phase -1: empty document ("No data found in file.",
  *    data_file_validator.py:103-107)
  *  - phase 0: JSON-schema checks in instance order (jsonschema iter_errors;
  *    __init__.py:112-122): k1 = 0 indep / 1 dep, then var idx, value idx
  *    (9000 = var-level required, 9001 = additionalProperties; -10 header
  *    internals, -5 qualifiers), error idx; per-error k5 encodes the
  *    error-item schema's keyword order (0 sym type, 1 asym type, 2/3
  *    minus/plus member type, 4/5 asym required minus/plus, 6 asym
  *    addProps, 7 label type, 8 oneOf, 9 error addProps — emitted by
  *    [[ErrorValuesKernel]]'s schema pass).
  *  - phase 1: check_error_values (data_file_validator.py:224-284): dep var,
  *    value, error idx, sub (0 sym/plus invalid, 1 minus invalid, 5 empty);
  *    the all-zero check emits after a value's errors (k3=9999). This phase
  *    is SEQUENTIAL per document (stale error_plus/error_minus locals,
  *    mid-iteration aborts) and runs as [[ErrorValuesKernel]].
  *  - phase 2: check_length_values (:286-309).
  *  - phase 3: check_independent_variable_values (:165-222); under/overflow
  *    emit after a variable's values loop (k2=len).
  *
  * Exception-abort semantics are mirrored exactly: the three semantic checks
  * run in one `try` (:137-152), so a dep var without 'values' truncates
  * check_error_values at that var and suppresses phases 2-3 entirely;
  * a missing independent_variables key suppresses phase 2 output and phase 3;
  * an indep var without 'values' truncates phase 3 at that var.
  */
object HepDataRules {

  /** Python dict-reprs of schema subsections, embedded verbatim in messages
    * exactly as jsonschema does (ref: __init__.py:177-179; golden strings in
    * testsuite/test_data_validator.py:372-394). Derived from the public
    * schemas/1.1.1/data_schema.json. */
  val OneOfRepr: String =
    "{'oneOf': [{'type': 'object', 'properties': {'value': {'type': ['string', 'number']}}, 'required': ['value'], 'additionalProperties': False}, {'type': 'object', 'properties': {'value': {'type': 'number'}, 'low': {'type': 'number'}, 'high': {'type': 'number'}}, 'required': ['low', 'high'], 'additionalProperties': False}]}"

  val DepValueItemRepr: String =
    "{'type': 'object', 'properties': {'value': {'type': ['string', 'number']}, 'errors': {'type': 'array', 'items': {'type': 'object', 'properties': {'symerror': {'type': ['number', 'string']}, 'asymerror': {'type': 'object', 'properties': {'minus': {'type': ['number', 'string']}, 'plus': {'type': ['number', 'string']}}, 'required': ['minus', 'plus'], 'additionalProperties': False}, 'label': {'type': 'string'}}, 'oneOf': [{'required': ['symerror']}, {'required': ['asymerror']}], 'additionalProperties': False}}}, 'required': ['value'], 'additionalProperties': False}"

  val DepItemRepr: String =
    "{'type': 'object', 'properties': {'header': {'type': 'object', 'properties': {'name': {'type': 'string'}, 'units': {'type': 'string'}}, 'required': ['name'], 'additionalProperties': False}, 'qualifiers': {'type': 'array', 'items': {'type': 'object', 'properties': {'name': {'type': 'string'}, 'value': {'type': ['string', 'number']}, 'units': {'type': 'string'}}, 'required': ['name', 'value'], 'additionalProperties': False}}, 'values': " +
      "{'type': 'array', 'items': {'type': 'object', 'properties': {'value': {'type': ['string', 'number']}, 'errors': {'type': 'array', 'items': {'type': 'object', 'properties': {'symerror': {'type': ['number', 'string']}, 'asymerror': {'type': 'object', 'properties': {'minus': {'type': ['number', 'string']}, 'plus': {'type': ['number', 'string']}}, 'required': ['minus', 'plus'], 'additionalProperties': False}, 'label': {'type': 'string'}}, 'oneOf': [{'required': ['symerror']}, {'required': ['asymerror']}], 'additionalProperties': False}}}, 'required': ['value'], 'additionalProperties': False}}}, 'required': ['header', 'values'], 'additionalProperties': False}"

  val IndepItemRepr: String =
    "{'type': 'object', 'properties': {'header': {'type': 'object', 'properties': {'name': {'type': 'string'}, 'units': {'type': 'string'}}, 'required': ['name'], 'additionalProperties': False}, 'values': {'type': 'array', 'items': " +
      OneOfRepr + "}}, 'required': ['header', 'values'], 'additionalProperties': False}"

  /** ref: data_file_validator.py:177 */
  val RangeRe: String =
    "^[+-]?\\d+(\\.\\d*)?([eE][+-]?\\d+)?\\s*-\\s*[+-]?\\d+(\\.\\d*)?([eE][+-]?\\d+)?$"

  private def vio(phase: Int, k1: Column, k2: Column, k3: Column, k4: Column,
      k5: Column, msg: Column): Column =
    struct(lit(phase).as("phase"), k1.cast("int").as("k1"),
      k2.cast("int").as("k2"), k3.cast("int").as("k3"),
      k4.cast("int").as("k4"), k5.cast("int").as("k5"), msg.as("message"))

  private def optVio(cond: Column, v: Column): Column = when(cond, v)
  private def str(i: Column): Column = i.cast("string")
  private def nn(a: Column): Column = a.isNotNull

  private def addPropsText(extras: Column): Column =
    concat(lit("Additional properties are not allowed ("),
      array_join(transform(array_sort(extras),
        ek => concat(lit("'"), ek, lit("'"))), ", "),
      when(size(extras) === 1, lit(" was unexpected)"))
        .otherwise(lit(" were unexpected)")))

  /** Header-internal checks (shared indep/dep shape): type < name-type <
    * units-type < required-name < addProps, emitted at k3 = -10 so they
    * sort before the values errors (the item schemas list `header` first
    * in `properties`). `loc` = "<vars>[<i>].header". */
  private def headerErrs(hasHeader: Column, h: Column, k1: Int, idx: Column,
      loc: Column, hRepr: String, nameRepr: String,
      unitsRepr: String): Column = {
    def v5(k5: Int, msg: Column) =
      vio(0, lit(k1), idx, lit(-10), lit(k5), lit(0), msg)
    val inH = hasHeader && h.getField("isObj")
    filter(array(
      optVio(hasHeader && !h.getField("isObj"),
        v5(0, concat(h.getField("repr"), lit(" is not of type 'object' in '"),
          loc, lit(s"' (expected: $hRepr)")))),
      optVio(inH && h.getField("nameRepr").isNotNull,
        v5(1, concat(h.getField("nameRepr"),
          lit(" is not of type 'string' in '"), loc,
          lit(s".name' (expected: $nameRepr)")))),
      optVio(inH && h.getField("unitsRepr").isNotNull,
        v5(2, concat(h.getField("unitsRepr"),
          lit(" is not of type 'string' in '"), loc,
          lit(s".units' (expected: $unitsRepr)")))),
      optVio(inH && !h.getField("hasName"),
        v5(3, concat(lit("'name' is a required property in '"), loc,
          lit(s"' (expected: $hRepr)")))),
      optVio(inH && size(h.getField("extraKeys")) > 0,
        v5(4, concat(addPropsText(h.getField("extraKeys")), lit(" in '"),
          loc, lit(s"' (expected: $hRepr)"))))), nn(_))
  }

  // convert_to_float semantics (%-strip, Python-float-gated parse) now live
  // in ErrorValuesKernel — check_error_values is sequential per document
  // (stale error_plus/error_minus carry across iterations).
  private def isInf(c: Column): Column = abs(c) === lit(Double.PositiveInfinity)

  /** All violations for a Dataset[HepRow]-shaped DataFrame.
    * Output: (file, seq, phase, message, level) ordered per file. */
  def violations(df: DataFrame): DataFrame =
    violations(df, SchemaVersion.Default)

  /** Version-gated packed stage shared by [[violations]] and [[verdicts]]:
    * one row per input doc, `_v` = its sorted violation array (ref:
    * data_file_validator.py:136-142 — semantic checks only for major > 0;
    * independent-variable checks only ≥ 1.1.0).
    *
    * Runs as TWO native kernels ([[ErrorValuesKernel]] for the sequential
    * phase 1 + per-error schema pass, [[HepDocKernel]] for everything else
    * incl. the final sort and the unexpected-error fallback) so the whole
    * document projection stays in whole-stage codegen. The original
    * pure-Column tree is preserved verbatim as [[packedViolationsSpec]];
    * HepKernelEquivSpec asserts kernel == spec byte-for-byte across the
    * fixtures, the synthetic 50k corpus, the raw-YAML fixtures and every
    * published schema version. (The HOF tree was interpreted AND
    * CodegenFallback: ~1.4 s of hep_scaled_50k at sf0.1, ~10× the kernel.) */
  private[graft] def packedViolations(df: DataFrame, version: SchemaVersion): DataFrame =
    packedViolations(df, version, Nil)

  /** As above with extra pass-through columns (e.g. the streaming ingester's
    * tagged-union fields) carried next to `_v`. */
  private[graft] def packedViolations(df: DataFrame, version: SchemaVersion,
      carry: Seq[String]): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val reprs = SchemaReprs.forVersion(version)
    val kernelCfg = ErrorValuesKernel.ErrItemCfg(
      v1 = version.major > 0,
      errItemRepr = reprs.errorItem, errAsymRepr = reprs.errorAsym,
      labelRepr =
        if (version < SchemaVersion.V110) reprs.errorLabel
        else "{'type': 'string'}",
      symMemberRepr = reprs.errorSym,
      minusMemberRepr = reprs.errorAsymMinus,
      plusMemberRepr = reprs.errorAsymPlus)
    val ev = ColumnBridge.column(ErrorValuesKernel(
      ColumnBridge.expression(col("dep")), kernelCfg))
    val doc = struct(col("file"), col("emptyDoc"), col("hasIndep"),
      col("indep"), col("hasDep"), col("dep"),
      col("indepBadRepr"), col("depBadRepr"))
    df.select((col("file") +: carry.map(col)) :+
      ColumnBridge.column(HepDocKernel(
        ColumnBridge.expression(doc), ColumnBridge.expression(ev),
        HepDocKernel.cfgFor(version))).as("_v"): _*)
  }

  /** The original fused pure-Column formulation of [[packedViolations]] —
    * kept as the executable SPEC the kernel is differentially tested
    * against (HepKernelEquivSpec); not on any hot path. */
  private[graft] def packedViolationsSpec(df: DataFrame, version: SchemaVersion): DataFrame = {
    // structural deltas across the published schema versions (see
    // SchemaReprs): <1.1.0 uses the FLAT independent-value form (value:
    // string|number, low/high: number, additionalProperties false — no
    // oneOf), 0.1.0 additionally carries 'id' keys inside every subschema
    // repr, and dependent-variable header/values become required only at
    // 1.1.0. Semantic families are gated further below (ref:
    // data_file_validator.py:136-142).
    val pre110 = version < SchemaVersion.V110
    val v1 = version.major > 0 // 1.0+ error items carry oneOf + asym required
    val reprs = SchemaReprs.forVersion(version)
    val indepItemRepr = if (pre110) reprs.indepItem else IndepItemRepr
    val depValueItemRepr = if (pre110) reprs.depValueItem else DepValueItemRepr
    val labelRepr = if (pre110) reprs.errorLabel else "{'type': 'string'}"
    val errItemRepr = reprs.errorItem
    val errAsymRepr = reprs.errorAsym

    val emptyArr = filter(
      array(vio(-1, lit(0), lit(0), lit(0), lit(0), lit(0),
        lit("No data found in file."))),
      _ => col("emptyDoc"))

    // ---- phase 0: schema checks --------------------------------------
    // top-level required keys (all versions; the top-level schema carries
    // '$schema' so jsonschema appends no "(expected: ...)" suffix)
    val topReqArr = filter(array(
      optVio(!col("emptyDoc") && !col("hasIndep"),
        vio(0, lit(2), lit(0), lit(0), lit(0), lit(0),
          lit("'independent_variables' is a required property"))),
      optVio(!col("emptyDoc") && !col("hasDep"),
        vio(0, lit(2), lit(1), lit(0), lit(0), lit(0),
          lit("'dependent_variables' is a required property")))), nn(_))

    // key present but not an array (incl. the single-YAML split's None
    // defaults): jsonschema type error under properties.<key>, with the
    // ARRAY schema repr (version-derived) — sorts before that key's
    // per-variable errors (k2 = -100)
    val badArrayArr = filter(array(
      optVio(!col("emptyDoc") && col("indepBadRepr").isNotNull,
        vio(0, lit(0), lit(-100), lit(0), lit(0), lit(0),
          concat(col("indepBadRepr"),
            lit(" is not of type 'array' in 'independent_variables' (expected: " +
              reprs.indepArray + ")")))),
      optVio(!col("emptyDoc") && col("depBadRepr").isNotNull,
        vio(0, lit(1), lit(-100), lit(0), lit(0), lit(0),
          concat(col("depBadRepr"),
            lit(" is not of type 'array' in 'dependent_variables' (expected: " +
              reprs.depArray + ")"))))), nn(_))

    val indepSchemaArr = flatten(transform(col("indep"), (v, i) => {
      val valueErrs = if (!pre110) {
        filter(transform(v.getField("values"), (x, j) => {
          val schema1 = x.getField("hasValue") && !x.getField("hasLow") &&
            !x.getField("hasHigh") && size(x.getField("extraKeys")) === 0
          val schema2 = x.getField("hasLow") && x.getField("hasHigh") &&
            x.getField("lowIsNum") && x.getField("highIsNum") &&
            (!x.getField("hasValue") || !x.getField("valueIsString")) &&
            size(x.getField("extraKeys")) === 0
          optVio(!(schema1 || schema2),
            vio(0, lit(0), i, j, lit(-1), lit(0),
              concat(x.getField("instanceRepr"),
                lit(" is not valid under any of the given schemas in 'independent_variables["),
                str(i), lit("].values["), str(j),
                lit(s"]' (expected: $OneOfRepr)"))))
        }), nn(_))
      } else {
        // flat form: per-property type checks then additionalProperties,
        // in jsonschema's keyword order
        flatten(transform(v.getField("values"), (x, j) => {
          def typeErr(k5: Int, has: Column, isNum: Column, raw: Column,
              prop: String, repr: String) =
            optVio(has && !isNum,
              vio(0, lit(0), i, j, lit(-1), lit(k5),
                concat(lit("'"), raw,
                  lit("' is not of type 'number' in 'independent_variables["),
                  str(i), lit("].values["), str(j),
                  lit(s"].$prop' (expected: $repr)"))))
          val extras = x.getField("extraKeys")
          filter(array(
            typeErr(0, x.getField("hasLow"), x.getField("lowIsNum"),
              x.getField("lowRaw"), "low", reprs.indepLow),
            typeErr(1, x.getField("hasHigh"), x.getField("highIsNum"),
              x.getField("highRaw"), "high", reprs.indepHigh),
            optVio(size(extras) > 0,
              vio(0, lit(0), i, j, lit(-1), lit(2),
                concat(addPropsText(extras),
                  lit(" in 'independent_variables["), str(i), lit("].values["),
                  str(j), lit(s"]' (expected: ${reprs.indepValueItem})"))))), nn(_))
        }))
      }
      // var-level: required (header < values, all versions) then addProps
      val varLevel = filter(array(
        optVio(!v.getField("hasHeader"),
          vio(0, lit(0), i, lit(9000), lit(0), lit(0),
            concat(lit("'header' is a required property in 'independent_variables["),
              str(i), lit(s"]' (expected: $indepItemRepr)")))),
        optVio(!v.getField("hasValues"),
          vio(0, lit(0), i, lit(9000), lit(1), lit(0),
            concat(lit("'values' is a required property in 'independent_variables["),
              str(i), lit(s"]' (expected: $indepItemRepr)")))),
        optVio(size(v.getField("extraKeys")) > 0,
          vio(0, lit(0), i, lit(9001), lit(0), lit(0),
            concat(addPropsText(v.getField("extraKeys")),
              lit(" in 'independent_variables["), str(i),
              lit(s"]' (expected: $indepItemRepr)"))))), nn(_))
      val hdrErrs = headerErrs(v.getField("hasHeader"), v.getField("header"),
        0, i, concat(lit("independent_variables["), str(i), lit("].header")),
        reprs.indepHeader, reprs.indepHeaderName, reprs.indepHeaderUnits)
      concat(hdrErrs, valueErrs, varLevel)
    }))

    val depSchemaArr = flatten(transform(col("dep"), (dv, k) => {
      val nested = flatten(transform(dv.getField("values"), (x, i) => {
        // per-error-mapping schema checks are emitted by the NATIVE
        // ErrorValuesKernel schema pass (see its Scaladoc; ~10 interpreted
        // Column branches per error were the hottest lambda in the fused
        // projection) — only the per-VALUE checks remain here
        val extras = x.getField("extraKeys")
        filter(array(
          optVio(!x.getField("hasValue"),
            vio(0, lit(1), k, i, lit(9000), lit(0),
              concat(lit("'value' is a required property in 'dependent_variables["),
                str(k), lit("].values["), str(i),
                lit(s"]' (expected: $depValueItemRepr)")))),
          optVio(size(extras) > 0,
            vio(0, lit(1), k, i, lit(9001), lit(0),
              concat(addPropsText(extras),
                lit(" in 'dependent_variables["), str(k), lit("].values["),
                str(i), lit(s"]' (expected: $depValueItemRepr)"))))), nn(_))
      }))
      val depItemRepr = if (pre110) reprs.depItem else DepItemRepr
      val varLevel = filter(array(
        optVio(lit(!pre110) && !dv.getField("hasHeader"),
          vio(0, lit(1), k, lit(9000), lit(0), lit(0),
            concat(lit("'header' is a required property in 'dependent_variables["),
              str(k), lit(s"]' (expected: $DepItemRepr)")))),
        optVio(lit(!pre110) && !dv.getField("hasValues"),
          vio(0, lit(1), k, lit(9000), lit(1), lit(0),
            concat(lit("'values' is a required property in 'dependent_variables["),
              str(k), lit(s"]' (expected: $DepItemRepr)")))),
        optVio(size(dv.getField("extraKeys")) > 0,
          vio(0, lit(1), k, lit(9001), lit(0), lit(0),
            concat(addPropsText(dv.getField("extraKeys")),
              lit(" in 'dependent_variables["), str(k),
              lit(s"]' (expected: $depItemRepr)"))))), nn(_))
      val hdrErrs = headerErrs(dv.getField("hasHeader"), dv.getField("header"),
        1, k, concat(lit("dependent_variables["), str(k), lit("].header")),
        reprs.depHeader, reprs.depHeaderName, reprs.depHeaderUnits)
      // qualifiers (k3 = -5: after header, before values — `properties`
      // order is header < qualifiers < values). Per item: name-type <
      // value-type < units-type < required name < required value < addProps
      val qualLoc = (j: Column) => concat(lit("dependent_variables["),
        str(k), lit("].qualifiers["), str(j), lit("]"))
      val qualTypeErr = filter(array(
        optVio(dv.getField("hasQualifiers") &&
            dv.getField("qualifiersRepr").isNotNull,
          vio(0, lit(1), k, lit(-5), lit(-1), lit(0),
            concat(dv.getField("qualifiersRepr"),
              lit(" is not of type 'array' in 'dependent_variables["),
              str(k),
              lit(s"].qualifiers' (expected: ${reprs.depQualifiers})"))))), nn(_))
      val qualItemErrs = flatten(transform(dv.getField("qualifiers"), (q, j) => {
        def qv(k5: Int, msg: Column) = vio(0, lit(1), k, lit(-5), j, lit(k5), msg)
        filter(array(
          optVio(q.getField("nameRepr").isNotNull,
            qv(0, concat(q.getField("nameRepr"),
              lit(" is not of type 'string' in '"), qualLoc(j),
              lit(s".name' (expected: ${reprs.depQualifierName})")))),
          optVio(q.getField("valueRepr").isNotNull,
            qv(1, concat(q.getField("valueRepr"),
              lit(" is not of type 'string', 'number' in '"), qualLoc(j),
              lit(s".value' (expected: ${reprs.depQualifierValue})")))),
          optVio(q.getField("unitsRepr").isNotNull,
            qv(2, concat(q.getField("unitsRepr"),
              lit(" is not of type 'string' in '"), qualLoc(j),
              lit(s".units' (expected: ${reprs.depQualifierUnits})")))),
          optVio(!q.getField("hasName"),
            qv(3, concat(lit("'name' is a required property in '"),
              qualLoc(j), lit(s"' (expected: ${reprs.depQualifierItem})")))),
          optVio(!q.getField("hasValue"),
            qv(4, concat(lit("'value' is a required property in '"),
              qualLoc(j), lit(s"' (expected: ${reprs.depQualifierItem})")))),
          optVio(size(q.getField("extraKeys")) > 0,
            qv(5, concat(addPropsText(q.getField("extraKeys")), lit(" in '"),
              qualLoc(j),
              lit(s"' (expected: ${reprs.depQualifierItem})"))))), nn(_))
      }))
      concat(hdrErrs, qualTypeErr, qualItemErrs, nested, varLevel)
    }))

    // ---- phase 1 + semantic-check gating (exception-abort mirror) ----
    // check_error_values carries mutable state ACROSS errors/values/vars
    // (stale error_plus/error_minus locals) and can raise mid-iteration
    // (KeyError/NameError/TypeError) — sequential per document, so it runs
    // as a native one-pass kernel over the `dep` array (see
    // [[ErrorValuesKernel]]); `_ev.aborted` mirrors "an exception escaped
    // the semantic try block", which also suppresses phases 2-3. It is
    // referenced twice below (vios + aborted), the CollapseProject barrier
    // that keeps the kernel single-evaluated.
    val errSchemaArr = col("_ev").getField("schemaVios")
    val errValArr = col("_ev").getField("vios")
    val semAborted = !col("emptyDoc") &&
      (!col("hasDep") || col("depBadRepr").isNotNull ||
        col("_ev").getField("aborted"))
    // a non-array independent_variables raises inside the LENGTH check
    // (len()/iteration TypeError — probed live), so phase 1 messages
    // survive but phases 2-3 abort silently
    val lengthRan = col("hasDep") && !semAborted &&
      col("indepBadRepr").isNull
    val phase23Gate = lengthRan && col("hasIndep")

    // ---- phase 2: check_length_values --------------------------------
    val indepCounts = transform(
      filter(col("indep"), v => v.getField("hasValues")),
      v => size(v.getField("values")))
    val depCounts = transform(
      filter(col("dep"), v => v.getField("hasValues")),
      v => size(v.getField("values")))
    def listStr(c: Column): Column =
      concat(lit("["), array_join(transform(c, str(_)), ", "), lit("]"))
    val lengthArr = filter(array(
      optVio(phase23Gate &&
          size(array_distinct(concat(indepCounts, depCounts))) > 1,
        vio(2, lit(0), lit(0), lit(0), lit(0), lit(0),
          concat(lit("Inconsistent length of 'values' list: independent_variables "),
            listStr(indepCounts), lit(", dependent_variables "),
            listStr(depCounts)))),
      optVio(phase23Gate && size(indepCounts) > 0 && size(depCounts) === 0,
        vio(2, lit(0), lit(0), lit(0), lit(1), lit(0),
          concat(lit("Case of only independent_variables but no dependent_variables is not supported: independent_variables "),
            listStr(indepCounts), lit(", dependent_variables "),
            listStr(depCounts))))), nn(_))

    // ---- phase 3: check_independent_variable_values -------------------
    val firstBadIndep = array_position(
      transform(col("indep"), v => v.getField("hasValues")), false)
    val effIndep = when(!phase23Gate,
        slice(col("indep"), lit(1), lit(0)))
      .when(firstBadIndep === 0, col("indep"))
      .otherwise(slice(col("indep"), lit(1), (firstBadIndep - 1).cast("int")))
    val indepArr = flatten(transform(effIndep, (v, i) => {
      val vals = v.getField("values")
      val perVal = flatten(transform(vals, (x, j) => {
        val bothNum = x.getField("hasLow") && x.getField("hasHigh") &&
          x.getField("lowNum").isNotNull && x.getField("highNum").isNotNull
        filter(array(
          optVio(x.getField("hasValue") && x.getField("valueIsString") &&
              x.getField("valueRaw").contains("-") &&
              x.getField("valueRaw").rlike(RangeRe),
            vio(3, i, j, lit(0), lit(0), lit(0),
              concat(lit("independent_variable 'value' must not be a string range (use 'low' and 'high' to represent a range): '"),
                x.getField("valueRaw"), lit("' in 'independent_variables["),
                str(i), lit("].values["), str(j),
                lit("].value' (expected: {'type': 'number or string (not a range)'})")))),
          optVio(bothNum && isInf(x.getField("lowNum")) && isInf(x.getField("highNum")),
            vio(3, i, j, lit(1), lit(0), lit(0),
              concat(lit("independent_variable 'low' and 'high' must not both have infinite values: '"),
                x.getField("lowRaw"), lit("' and '"), x.getField("highRaw"),
                lit("' in 'independent_variables["), str(i), lit("].values["),
                str(j), lit("]'"))))), nn(_))
      }))
      def parseable(x: Column) = x.getField("hasLow") && x.getField("hasHigh") &&
        x.getField("lowNum").isNotNull && x.getField("highNum").isNotNull
      val underIds = array_distinct(transform(
        filter(vals, x => parseable(x) &&
          isInf(x.getField("lowNum")) && !isInf(x.getField("highNum"))),
        x => format_string("(%s, %.4e)", x.getField("lowRaw"), x.getField("highNum"))))
      val overIds = array_distinct(transform(
        filter(vals, x => parseable(x) &&
          isInf(x.getField("highNum")) && !isInf(x.getField("lowNum"))),
        x => format_string("(%.4e, %s)", x.getField("lowNum"), x.getField("highRaw"))))
      val ouArr = filter(array(
        optVio(size(underIds) > 1,
          vio(3, i, size(vals), lit(0), lit(0), lit(0),
            concat(lit("independent_variable must not have more than one underflow bin: "),
              array_join(underIds, ", "), lit(" in 'independent_variables["),
              str(i), lit("].values["), str(size(vals) - 1), lit("]'")))),
        optVio(size(overIds) > 1,
          vio(3, i, size(vals), lit(1), lit(0), lit(0),
            concat(lit("independent_variable must not have more than one overflow bin: "),
              array_join(overIds, ", "), lit(" in 'independent_variables["),
              str(i), lit("].values["), str(size(vals) - 1), lit("]'"))))), nn(_))
      concat(perVal, ouArr)
    }))

    val noV = slice(emptyArr, 1, 0) // typed empty array
    val all = concat(emptyArr, topReqArr, badArrayArr, indepSchemaArr, depSchemaArr,
      errSchemaArr, // per-error schema checks from the kernel's schema pass
      if (version.major > 0) errValArr else noV,
      if (version.major > 0) lengthArr else noV,
      if (version >= SchemaVersion.V110) indepArr else noV)

    // the reference wraps the semantic checks in one `try` and, when they
    // raise with NO other message recorded for the file, emits the
    // unexpected-error apology (data_file_validator.py:143-152). Raises in
    // our model: any check_error_values abort (KeyError on a dep var without
    // 'values' or an asymerror member, NameError on an unbound stale value —
    // see ErrorValuesKernel), 'independent_variables' missing when the
    // length check runs, or (≥1.1.0) an indep var without 'values' in
    // phase 3.
    val exceptionOccurred: Column =
      if (version.major == 0) lit(false)
      else semAborted ||
        (col("hasDep") && !semAborted && col("indepBadRepr").isNotNull) ||
        (lengthRan && !col("hasIndep")) ||
        (if (version >= SchemaVersion.V110)
          phase23Gate && firstBadIndep =!= 0 else lit(false))
    val unexpectedV = vio(4, lit(0), lit(0), lit(0), lit(0), lit(0),
      concat(lit("An unexpected error occurred whilst validating "),
        col("file"),
        lit(". Please contact info@hepdata.net if this issue recurs.")))

    // two-step select: `_v0` is referenced three times below, which is the
    // CollapseProject barrier keeping the big rule array single-evaluated;
    // `_ev` (the sequential check_error_values kernel) is likewise
    // referenced twice (vios + aborted) in this projection.
    val kernelCfg = ErrorValuesKernel.ErrItemCfg(
      v1 = v1,
      errItemRepr = errItemRepr, errAsymRepr = errAsymRepr,
      labelRepr = labelRepr,
      symMemberRepr = reprs.errorSym,
      minusMemberRepr = reprs.errorAsymMinus,
      plusMemberRepr = reprs.errorAsymPlus)
    df.withColumn("_ev", org.apache.spark.sql.graft.ColumnBridge.column(
        ErrorValuesKernel(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("dep")),
          kernelCfg)))
      .select(col("file"), array_sort(all).as("_v0"),
        exceptionOccurred.as("_exc"))
      .select(col("file"),
        when(col("_exc") && size(col("_v0")) === 0,
          array(unexpectedV)).otherwise(col("_v0")).as("_v"))
  }

  def violations(df: DataFrame, version: SchemaVersion): DataFrame =
    packedViolations(df, version)
      .where(size(col("_v")) > 0)
      .select(col("file"), posexplode(col("_v")))
      .select(col("file"), col("pos").as("seq"),
        col("col.phase").as("phase"), col("col.message").as("message"),
        lit("error").as("level"))

  /** Per-file verdict: valid ⇔ no violations (ref: __init__.py:124-132).
    * ONE scan: every doc row carries its violation COUNT out of the packed
    * projection, so the file universe and the per-file totals come from the
    * same aggregate — no second scan for the passing files (which the r3
    * shape paid via violations + a distinct-universe join). */
  def verdicts(df: DataFrame): DataFrame = verdicts(df, SchemaVersion.Default)

  def verdicts(df: DataFrame, version: SchemaVersion): DataFrame =
    packedViolations(df, version)
      .groupBy(col("file"))
      .agg(sum(size(col("_v")).cast("long")).as("n_violations"))
      .select(col("file"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))
}
