package graft.hep

/** Row model for HEPData-shaped nested tables (FIXTURES.md §3) — a direct
  * translation of `schemas/1.1.1/data_schema.json` with enough raw-token
  * metadata to reproduce the reference's byte-exact messages:
  *
  *  - `*Raw` fields carry the Python-str rendering of the original YAML
  *    scalar (e.g. `-.inf` → "-inf", `6000` → "6000", `0.443` → "0.443").
  *  - `*IsString`/`*IsNum` carry the original YAML type (the union
  *    string|number can't be recovered from a string carrier alone).
  *  - `lowNum`/`highNum` carry the plain Python `float()` of the raw value
  *    — STRINGS included ('-inf' is an infinite bin edge in the reference's
  *    check_independent_variable_values even though it fails the schema's
  *    number type); None when float() would raise (the reference skips the
  *    value via `except: continue`).
  *  - `instanceRepr` is the Python dict-repr of the original value mapping,
  *    used verbatim in `oneOf` failure messages
  *    (ref: hepdata_validator/__init__.py:174-179 message formatting).
  *  - `extraKeys` carries unknown YAML keys so `additionalProperties: false`
  *    violations are representable.
  */
final case class HepIndepVal(
    hasValue: Boolean, valueRaw: String, valueIsString: Boolean,
    hasLow: Boolean, lowRaw: String, lowIsNum: Boolean, lowNum: Option[Double],
    hasHigh: Boolean, highRaw: String, highIsNum: Boolean, highNum: Option[Double],
    instanceRepr: String, extraKeys: Seq[String])

/** Header internals (shared by indep/dep vars): `isObj=false` + `repr` for
  * a non-mapping header (type error, no recursion); `nameRepr`/`unitsRepr`
  * non-null when that member is not a string (Python repr for the message). */
final case class HepHeader(
    isObj: Boolean = true, repr: String = null,
    hasName: Boolean = true, nameRepr: String = null,
    hasUnits: Boolean = false, unitsRepr: String = null,
    extraKeys: Seq[String] = Nil)

/** One qualifier mapping ({name, value, units}; name+value required). */
final case class HepQualifier(
    hasName: Boolean = true, nameRepr: String = null,
    hasValue: Boolean = true, valueRepr: String = null,
    hasUnits: Boolean = false, unitsRepr: String = null,
    extraKeys: Seq[String] = Nil)

final case class HepIndepVar(
    headerName: String, hasValues: Boolean, values: Seq[HepIndepVal],
    hasHeader: Boolean = true, extraKeys: Seq[String] = Nil,
    header: HepHeader = HepHeader())

/** One error mapping. `hasPlus`/`hasMinus` model the asymerror sub-keys
  * (required by the 1.0+ schemas); `asymExtraKeys` unknown keys inside the
  * asymerror mapping; `instanceRepr` the Python dict-repr of the WHOLE error
  * mapping, embedded verbatim in `oneOf` failure messages — only error
  * mappings that can fail the oneOf (neither or both of symerror/asymerror
  * present) need it (ref: schemas/1.1.1/data_schema.json error items).
  *
  * `symRepr`/`asymRepr`/`plusRepr`/`minusRepr`: non-null when that member's
  * YAML value is NOT of its schema type (symerror/plus/minus not
  * number|string, asymerror not a mapping) — the Python repr of the bad
  * value, driving the jsonschema type-error message. Boolean members are
  * the special case: they fail the type check (draft bool≠number) but
  * Python float(True/False) SUCCEEDS as 1.0/0.0 in check_error_values, so
  * a bool carries repr "True"/"False" AND the same raw; any other bad type
  * carries a null raw (float()/subscripting raises → semantic abort). */
final case class HepErr(
    hasSym: Boolean, symRaw: String,
    hasAsym: Boolean, plusRaw: String, minusRaw: String,
    hasLabel: Boolean, labelRaw: String, labelIsString: Boolean,
    extraKeys: Seq[String],
    hasPlus: Boolean = true, hasMinus: Boolean = true,
    asymExtraKeys: Seq[String] = Nil, instanceRepr: String = null,
    symRepr: String = null, asymRepr: String = null,
    plusRepr: String = null, minusRepr: String = null)

final case class HepDepVal(
    hasValue: Boolean, valueRaw: String,
    hasErrors: Boolean, errors: Seq[HepErr], extraKeys: Seq[String])

final case class HepDepVar(
    headerName: String, hasHeader: Boolean, hasValues: Boolean,
    values: Seq[HepDepVal], extraKeys: Seq[String] = Nil,
    header: HepHeader = HepHeader(),
    hasQualifiers: Boolean = false,
    qualifiersRepr: String = null, // non-null: qualifiers not an array
    qualifiers: Seq[HepQualifier] = Nil)

/** One row per data-table document. `emptyDoc` mirrors a YAML file that
  * parses to nothing (ref: data_file_validator.py:103-107). */
/** `indepBadRepr`/`depBadRepr`: non-null when the key is PRESENT but its
  * value is not an array (incl. None — the single-YAML split writes both
  * keys with None defaults): Python repr for the jsonschema type error
  * "X is not of type 'array' in '<key>' (expected: ...)". */
final case class HepRow(
    file: String,
    emptyDoc: Boolean,
    hasIndep: Boolean, indep: Seq[HepIndepVar],
    hasDep: Boolean, dep: Seq[HepDepVar],
    indepBadRepr: String = null, depBadRepr: String = null)

object HepModel {
  /** Cached ExpressionEncoder for the (deeply nested) row type: deriving it
    * implicitly per query call pays ScalaReflection + serializer-tree
    * construction every time — a fixed per-QUERY planning cost that shows
    * up on every hep-family bench entry (guide §1: measure first; the
    * raw-YAML query spent ~0.3 s/run here). Encoders are immutable;
    * analysis resolves fresh copies, so sharing one instance is safe. */
  lazy val hepRowEncoder: org.apache.spark.sql.Encoder[HepRow] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(
      org.apache.spark.sql.Encoders.product[HepRow].asInstanceOf[
        org.apache.spark.sql.catalyst.encoders.AgnosticEncoder[HepRow]])

  /** Cached encoder for raw (name, yaml-text) doc pairs. */
  lazy val rawDocEncoder: org.apache.spark.sql.Encoder[(String, String)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(
      org.apache.spark.sql.Encoders.product[(String, String)].asInstanceOf[
        org.apache.spark.sql.catalyst.encoders.AgnosticEncoder[(String, String)]])

  // convenience constructors for fixtures/tests
  def sym(v: String, label: String = null, labelIsString: Boolean = true,
      extraKeys: Seq[String] = Nil): HepErr =
    HepErr(hasSym = true, symRaw = v, hasAsym = false, plusRaw = null,
      minusRaw = null, hasLabel = label != null, labelRaw = label,
      labelIsString = labelIsString, extraKeys = extraKeys)

  def asym(plus: String, minus: String, label: String = null,
      labelIsString: Boolean = true, asymExtraKeys: Seq[String] = Nil): HepErr =
    HepErr(hasSym = false, symRaw = null, hasAsym = true, plusRaw = plus,
      minusRaw = minus, hasLabel = label != null, labelRaw = label,
      labelIsString = labelIsString, extraKeys = Nil,
      asymExtraKeys = asymExtraKeys)

  /** An error mapping with NEITHER symerror nor asymerror (fails the 1.0+
    * oneOf). `instanceRepr` = Python repr of the original mapping. */
  def noneErr(instanceRepr: String, label: String = null,
      labelIsString: Boolean = true, extraKeys: Seq[String] = Nil): HepErr =
    HepErr(hasSym = false, symRaw = null, hasAsym = false, plusRaw = null,
      minusRaw = null, hasLabel = label != null, labelRaw = label,
      labelIsString = labelIsString, extraKeys = extraKeys,
      instanceRepr = instanceRepr)

  /** An error mapping with BOTH symerror and asymerror (fails the 1.0+
    * oneOf the other way: valid under each required-subschema). */
  def bothErr(symV: String, plus: String, minus: String,
      instanceRepr: String): HepErr =
    HepErr(hasSym = true, symRaw = symV, hasAsym = true, plusRaw = plus,
      minusRaw = minus, hasLabel = false, labelRaw = null,
      labelIsString = true, extraKeys = Nil, instanceRepr = instanceRepr)

  def dval(v: String, errs: Seq[HepErr] = null, extraKeys: Seq[String] = Nil): HepDepVal =
    HepDepVal(hasValue = v != null, valueRaw = v,
      hasErrors = errs != null, errors = Option(errs).getOrElse(Nil),
      extraKeys = extraKeys)

  def point(v: String, isString: Boolean): HepIndepVal =
    HepIndepVal(hasValue = true, valueRaw = v, valueIsString = isString,
      hasLow = false, lowRaw = null, lowIsNum = false, lowNum = None,
      hasHigh = false, highRaw = null, highIsNum = false, highNum = None,
      instanceRepr = if (isString) s"{'value': '$v'}" else s"{'value': $v}",
      extraKeys = Nil)

  def bin(lowRaw: String, lowNum: Option[Double], highRaw: String,
      highNum: Option[Double], isNum: Boolean = true): HepIndepVal =
    HepIndepVal(hasValue = false, valueRaw = null, valueIsString = false,
      hasLow = true, lowRaw = lowRaw, lowIsNum = isNum, lowNum = lowNum,
      hasHigh = true, highRaw = highRaw, highIsNum = isNum, highNum = highNum,
      instanceRepr =
        if (isNum) s"{'low': $lowRaw, 'high': $highRaw}"
        else s"{'low': '$lowRaw', 'high': '$highRaw'}",
      extraKeys = Nil)

  def indepVar(name: String, values: Seq[HepIndepVal]): HepIndepVar =
    HepIndepVar(name, hasValues = values != null,
      Option(values).getOrElse(Nil))

  def depVar(name: String, values: Seq[HepDepVal]): HepDepVar =
    HepDepVar(name, hasHeader = true, hasValues = values != null,
      Option(values).getOrElse(Nil))

  def row(file: String, indep: Seq[HepIndepVar], dep: Seq[HepDepVar]): HepRow =
    HepRow(file, emptyDoc = false,
      hasIndep = indep != null, Option(indep).getOrElse(Nil),
      hasDep = dep != null, Option(dep).getOrElse(Nil))

  def emptyRow(file: String): HepRow =
    HepRow(file, emptyDoc = true, hasIndep = false, Nil, hasDep = false, Nil)
}
