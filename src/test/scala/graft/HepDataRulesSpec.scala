package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.hep.{HepDataRules, HepFixtures, HepRow}

/** Golden-message tests: every line below is copied verbatim from the
  * reference suite (/root/reference/testsuite/test_data_validator.py) and
  * must byte-match our violation output rendered as "<level> - <message>". */
class HepDataRulesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def messagesFor(row: HepRow): Seq[String] = {
    import spark.implicits._
    HepDataRules.violations(Seq(row).toDS().toDF())
      .orderBy("seq").collect()
      .map(r => s"${r.getAs[String]("level")} - ${r.getAs[String]("message")}")
      .toSeq
  }

  def verdictFor(row: HepRow): Boolean = {
    import spark.implicits._
    HepDataRules.verdicts(Seq(row).toDS().toDF())
      .collect().head.getAs[Boolean]("pass")
  }

  test("valid_file.yaml passes with no messages") {
    assert(messagesFor(HepFixtures.validFile) === Seq.empty)
    assert(verdictFor(HepFixtures.validFile))
  }

  test("valid_data_with_percent.yaml passes") {
    assert(messagesFor(HepFixtures.percent) === Seq.empty)
  }

  test("invalid_file.yaml: 5 golden errors in order (test_data_validator.py:100-104)") {
    assert(messagesFor(HepFixtures.invalidFile) === Seq(
      "error - 0.443 is not of type 'string' in 'dependent_variables[0].values[1].errors[0].label' (expected: {'type': 'string'})",
      "error - Invalid error value 2.300e-003f: value must be a number (possibly ending in %) in 'dependent_variables.values[1].errors[2].symerror'",
      "error - asymerror plus and minus cannot both be empty in 'dependent_variables.values[1].errors[3].asymerror'",
      "error - symerror cannot be empty in 'dependent_variables.values[1].errors[4].symerror'",
      "error - Inconsistent length of 'values' list: independent_variables [1], dependent_variables [2]"))
  }

  test("empty_file.yaml (test_data_validator.py:118)") {
    assert(messagesFor(HepFixtures.emptyFile) ===
      Seq("error - No data found in file."))
  }

  test("file_with_zero_uncertainty.yaml (test_data_validator.py:317)") {
    assert(messagesFor(HepFixtures.zeroUncertainty) === Seq(
      "error - Uncertainties should not all be zero in 'dependent_variables.values[1].errors'"))
  }

  test("valid_data_with_zero_percent.yaml (test_data_validator.py:330)") {
    assert(messagesFor(HepFixtures.zeroPercent) === Seq(
      "error - Uncertainties should not all be zero in 'dependent_variables.values[0].errors'"))
  }

  test("file_with_inconsistent_values.yaml (test_data_validator.py:344)") {
    assert(messagesFor(HepFixtures.inconsistent) === Seq(
      "error - Inconsistent length of 'values' list: independent_variables [1], dependent_variables [2]"))
  }

  test("binning_average.yaml (test_data_validator.py:357)") {
    assert(messagesFor(HepFixtures.binningAverage) === Seq(
      "error - Case of only independent_variables but no dependent_variables is not supported: independent_variables [40, 40], dependent_variables []"))
  }

  test("invalid_missing_values.yaml (test_data_validator.py:394)") {
    assert(messagesFor(HepFixtures.missingValues) === Seq(
      "error - 'values' is a required property in 'dependent_variables[0]' (expected: {'type': 'object', 'properties': {'header': {'type': 'object', 'properties': {'name': {'type': 'string'}, 'units': {'type': 'string'}}, 'required': ['name'], 'additionalProperties': False}, 'qualifiers': {'type': 'array', 'items': {'type': 'object', 'properties': {'name': {'type': 'string'}, 'value': {'type': ['string', 'number']}, 'units': {'type': 'string'}}, 'required': ['name', 'value'], 'additionalProperties': False}}, 'values': {'type': 'array', 'items': {'type': 'object', 'properties': {'value': {'type': ['string', 'number']}, 'errors': {'type': 'array', 'items': {'type': 'object', 'properties': {'symerror': {'type': ['number', 'string']}, 'asymerror': {'type': 'object', 'properties': {'minus': {'type': ['number', 'string']}, 'plus': {'type': ['number', 'string']}}, 'required': ['minus', 'plus'], 'additionalProperties': False}, 'label': {'type': 'string'}}, 'oneOf': [{'required': ['symerror']}, {'required': ['asymerror']}], 'additionalProperties': False}}}, 'required': ['value'], 'additionalProperties': False}}}, 'required': ['header', 'values'], 'additionalProperties': False})"))
  }

  test("invalid_independent_variables_file.yaml: 10 golden errors (test_data_validator.py:372-381)") {
    val oneOf = "{'oneOf': [{'type': 'object', 'properties': {'value': {'type': ['string', 'number']}}, 'required': ['value'], 'additionalProperties': False}, {'type': 'object', 'properties': {'value': {'type': 'number'}, 'low': {'type': 'number'}, 'high': {'type': 'number'}}, 'required': ['low', 'high'], 'additionalProperties': False}]}"
    assert(messagesFor(HepFixtures.invalidIndepVars) === Seq(
      s"error - {'low': 6000} is not valid under any of the given schemas in 'independent_variables[0].values[0]' (expected: $oneOf)",
      s"error - {'high': 7000} is not valid under any of the given schemas in 'independent_variables[0].values[1]' (expected: $oneOf)",
      s"error - {'high': '7.0.0', 'low': '2.0.0'} is not valid under any of the given schemas in 'independent_variables[0].values[2]' (expected: $oneOf)",
      "error - independent_variable 'value' must not be a string range (use 'low' and 'high' to represent a range): '800 - 1000' in 'independent_variables[0].values[3].value' (expected: {'type': 'number or string (not a range)'})",
      "error - independent_variable 'value' must not be a string range (use 'low' and 'high' to represent a range): '-5.3--2' in 'independent_variables[0].values[4].value' (expected: {'type': 'number or string (not a range)'})",
      "error - independent_variable 'value' must not be a string range (use 'low' and 'high' to represent a range): '+2.3E5 -  +5E12' in 'independent_variables[0].values[5].value' (expected: {'type': 'number or string (not a range)'})",
      "error - independent_variable 'value' must not be a string range (use 'low' and 'high' to represent a range): '-1e-09 - -3.5e-08' in 'independent_variables[0].values[6].value' (expected: {'type': 'number or string (not a range)'})",
      "error - independent_variable 'low' and 'high' must not both have infinite values: '-inf' and 'inf' in 'independent_variables[0].values[9]'",
      "error - independent_variable must not have more than one underflow bin: (-inf, 0.0000e+00), (-inf, 1.0000e+00) in 'independent_variables[0].values[13]'",
      "error - independent_variable must not have more than one overflow bin: (0.0000e+00, inf), (1.0000e+00, inf) in 'independent_variables[0].values[13]'"))
  }

  // ---- error-mapping structural oneOf (P10) — goldens pinned by running
  // the live reference on the same docs (see HepFixtures Scaladoc) --------
  private val errItem = "{'type': 'object', 'properties': {'symerror': {'type': ['number', 'string']}, 'asymerror': {'type': 'object', 'properties': {'minus': {'type': ['number', 'string']}, 'plus': {'type': ['number', 'string']}}, 'required': ['minus', 'plus'], 'additionalProperties': False}, 'label': {'type': 'string'}}, 'oneOf': [{'required': ['symerror']}, {'required': ['asymerror']}], 'additionalProperties': False}"
  private val errAsym = "{'type': 'object', 'properties': {'minus': {'type': ['number', 'string']}, 'plus': {'type': ['number', 'string']}}, 'required': ['minus', 'plus'], 'additionalProperties': False}"

  test("invalid_error_oneof.yaml: oneOf both ways + addProps + label ordering") {
    assert(messagesFor(HepFixtures.errorOneOf) === Seq(
      s"error - {'label': 'sys'} is not valid under any of the given schemas in 'dependent_variables[0].values[0].errors[1]' (expected: $errItem)",
      s"error - {'symerror': 0.1, 'asymerror': {'plus': 0.1, 'minus': -0.1}} is valid under each of {'required': ['asymerror']}, {'required': ['symerror']} in 'dependent_variables[0].values[1].errors[0]' (expected: $errItem)",
      s"error - Additional properties are not allowed ('foo' was unexpected) in 'dependent_variables[0].values[2].errors[0]' (expected: $errItem)",
      "error - 123 is not of type 'string' in 'dependent_variables[0].values[3].errors[0].label' (expected: {'type': 'string'})",
      s"error - {'label': 123} is not valid under any of the given schemas in 'dependent_variables[0].values[3].errors[0]' (expected: $errItem)",
      s"error - Additional properties are not allowed ('zzz' was unexpected) in 'dependent_variables[0].values[4].errors[0].asymerror' (expected: $errAsym)"))
  }

  test("invalid_error_stale.yaml: stale error_plus/error_minus reuse (ref loop locals)") {
    assert(messagesFor(HepFixtures.errorStale) === Seq(
      s"error - {'label': 'sys'} is not valid under any of the given schemas in 'dependent_variables[0].values[0].errors[1]' (expected: $errItem)",
      s"error - {'label': 'x'} is not valid under any of the given schemas in 'dependent_variables[0].values[1].errors[1]' (expected: $errItem)",
      "error - symerror cannot be empty in 'dependent_variables.values[0].errors[0].symerror'",
      "error - symerror cannot be empty in 'dependent_variables.values[0].errors[1].symerror'",
      "error - Uncertainties should not all be zero in 'dependent_variables.values[1].errors'"))
  }

  test("invalid_error_abort.yaml: NameError on unbound stale value aborts all semantic checks") {
    // the bad symerror at values[1] AND the 1-vs-2 length mismatch are
    // suppressed — check_error_values raised before either could run
    assert(messagesFor(HepFixtures.errorAbort) === Seq(
      s"error - {'label': 'sys'} is not valid under any of the given schemas in 'dependent_variables[0].values[0].errors[0]' (expected: $errItem)"))
  }

  test("invalid_error_asym_missing.yaml: KeyError mid-conversion keeps the plus message") {
    assert(messagesFor(HepFixtures.errorAsymMissing) === Seq(
      s"error - 'minus' is a required property in 'dependent_variables[0].values[0].errors[0].asymerror' (expected: $errAsym)",
      "error - Invalid error value 2.x: value must be a number (possibly ending in %) in 'dependent_variables.values[0].errors[0].asymerror.plus'"))
  }

  private val symT = "{'type': ['number', 'string']}"

  test("invalid_error_member_types.yaml: bool members fail the type check but convert") {
    assert(messagesFor(HepFixtures.errorMemberTypes) === Seq(
      s"error - True is not of type 'number', 'string' in 'dependent_variables[0].values[0].errors[0].symerror' (expected: $symT)",
      s"error - {'label': 'sys'} is not valid under any of the given schemas in 'dependent_variables[0].values[0].errors[1]' (expected: $errItem)",
      s"error - False is not of type 'number', 'string' in 'dependent_variables[0].values[1].errors[0].symerror' (expected: $symT)",
      s"error - True is not of type 'number', 'string' in 'dependent_variables[0].values[2].errors[0].asymerror.minus' (expected: $symT)",
      // float(False) = 0.0 -> the all-zero check fires for values[1]
      "error - Uncertainties should not all be zero in 'dependent_variables.values[1].errors'"))
  }

  test("invalid_error_sym_list.yaml: list symerror -> type error + TypeError abort") {
    assert(messagesFor(HepFixtures.errorSymList) === Seq(
      s"error - [1, 2] is not of type 'number', 'string' in 'dependent_variables[0].values[0].errors[0].symerror' (expected: $symT)"))
  }

  test("invalid_error_asym_object.yaml: non-mapping asymerror -> type error + abort") {
    assert(messagesFor(HepFixtures.errorAsymObject) === Seq(
      s"error - 5 is not of type 'object' in 'dependent_variables[0].values[0].errors[0].asymerror' (expected: $errAsym)"))
  }

  test("invalid_error_plus_list.yaml: list plus -> member type error + abort") {
    assert(messagesFor(HepFixtures.errorPlusList) === Seq(
      s"error - [1] is not of type 'number', 'string' in 'dependent_variables[0].values[0].errors[0].asymerror.plus' (expected: $symT)"))
  }

  test("version gates: <1.1.0 skips indep-var checks, major=0 skips all semantic checks") {
    import spark.implicits._
    import graft.hep.SchemaVersion
    // 1.0.0: flat value form (no oneOf) — only the low/high type errors of
    // values[2] remain, the 7 semantic ones drop (see HepVersionMatrixSpec
    // for the full per-version goldens)
    val v100 = HepDataRules.violations(
      Seq(HepFixtures.invalidIndepVars).toDS().toDF(), SchemaVersion.parse("1.0.0"))
      .collect().map(_.getAs[String]("message"))
    assert(v100.length === 2)
    assert(v100.forall(_.contains("is not of type 'number'")))
    // 0.1.0: error-value checks also skipped → zero-uncertainty file passes
    val v0 = HepDataRules.violations(
      Seq(HepFixtures.zeroUncertainty).toDS().toDF(), SchemaVersion.parse("0.1.0"))
    assert(v0.count() === 0)
    // 1.0.0 still runs error-value + length checks (major > 0)
    val v100zero = HepDataRules.violations(
      Seq(HepFixtures.zeroUncertainty).toDS().toDF(), SchemaVersion.parse("1.0.0"))
    assert(v100zero.count() === 1)
  }

  test("verdict matrix over the whole corpus") {
    import spark.implicits._
    val verdicts = HepDataRules.verdicts(HepFixtures.all.toDS().toDF())
      .collect().map(r => r.getString(0) -> r.getAs[Boolean]("pass")).toMap
    assert(verdicts === Map(
      "valid_file.yaml" -> true,
      "valid_data_with_percent.yaml" -> true,
      "invalid_file.yaml" -> false,
      "empty_file.yaml" -> false,
      "file_with_zero_uncertainty.yaml" -> false,
      "valid_data_with_zero_percent.yaml" -> false,
      "file_with_inconsistent_values.yaml" -> false,
      "binning_average.yaml" -> false,
      "invalid_missing_values.yaml" -> false,
      "invalid_independent_variables_file.yaml" -> false,
      "invalid_error_oneof.yaml" -> false,
      "invalid_error_stale.yaml" -> false,
      "invalid_error_abort.yaml" -> false,
      "invalid_error_asym_missing.yaml" -> false,
      "invalid_error_member_types.yaml" -> false,
      "invalid_error_sym_list.yaml" -> false,
      "invalid_error_asym_object.yaml" -> false,
      "invalid_error_plus_list.yaml" -> false))
  }
}
