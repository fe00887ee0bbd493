package graft.hep

import HepModel._

/** Translations of the reference fixture corpus
  * (/root/reference/testsuite/test_data YAML files) into [[HepRow]]s — see
  * FIXTURES.md §4. Raw-token strings are the Python-str renderings of the
  * original YAML scalars so messages byte-match the reference goldens.
  *
  * `valid_data_with_percent` / `valid_data_with_zero_percent` are faithful
  * but trimmed translations (fewer repeated errors of identical shape); the
  * zero-percent case keeps enough variety ('0.0%', '-0.0%' asym pairs) to
  * exercise every zero-detection path the original exercises.
  */
object HepFixtures {

  private val stdErrs1 = Seq( // the recurring (0.45, ±0.4/-0.3, 0.34) triple
    sym("0.45", "stat"), asym("0.4", "-0.3", "sys"), sym("0.34", "sys,lumi"))
  private val stdErrs2 = Seq(
    sym("0.4", "stat"), asym("0.42", "0.31", "sys"), sym("0.4", "sys,lumi"))

  /** testsuite/test_data/valid_file.yaml — PASS */
  val validFile: HepRow = row("valid_file.yaml",
    indep = Seq(indepVar("SQRT(S)",
      Seq(point("7000", isString = false), point("8000", isString = false)))),
    dep = Seq(depVar("SIG(total)",
      Seq(dval("6.7", stdErrs1), dval("5.7", stdErrs2)))))

  /** testsuite/test_data/invalid_file.yaml — 5 golden errors
    * (test_data_validator.py:100-104) */
  val invalidFile: HepRow = row("invalid_file.yaml",
    indep = Seq(indepVar("SQRT(S)", Seq(point("123 GEV", isString = true)))),
    dep = Seq(depVar("SIG(total)", Seq(
      dval("123 GEV", Seq(
        sym("0.45", "stat"), asym("0.4", "-0.3", "sys"), sym("0.34", "sys,lumi"))),
      dval("5.7", Seq(
        sym("0.4", "0.443", labelIsString = false),
        asym("0.42%", "0.31%", "sys"),
        sym("2.300e-003f", "sys,lumi"),
        asym("", "", "stat"),
        sym("")))))))

  /** testsuite/test_data/empty_file.yaml — "No data found in file." */
  val emptyFile: HepRow = emptyRow("empty_file.yaml")

  /** testsuite/test_data/file_with_zero_uncertainty.yaml —
    * zero-uncertainty error at values[1] (test_data_validator.py:317) */
  val zeroUncertainty: HepRow = row("file_with_zero_uncertainty.yaml",
    indep = Seq(indepVar("SQRT(S)",
      Seq(point("7000", isString = false), point("8000", isString = false)))),
    dep = Seq(depVar("SIG(total)", Seq(
      dval("6.7", stdErrs1),
      dval("5.7", Seq(
        sym("0.0", "stat"), asym("0.0", "0.0", "sys"), sym("0.0", "sys,lumi")))))))

  /** testsuite/test_data/valid_data_with_percent.yaml (trimmed) — PASS;
    * percent symerrors + an asymerror with empty plus leg only */
  val percent: HepRow = row("valid_data_with_percent.yaml",
    indep = Seq(indepVar("M(2JET)",
      Seq(bin("0.26", Some(0.26), "0.31", Some(0.31))))),
    dep = Seq(depVar("D2(SIG)/DM(2JET)/DYRAP*", Seq(
      dval("777000.0", Seq(
        sym("0.73%", "stat"), asym("", "-3.0%", "sys"), sym("0.4%", "sys"),
        sym("1.2%", "sys"), sym("0.1%", "sys")))))))

  /** testsuite/test_data/valid_data_with_zero_percent.yaml (trimmed) — FAIL;
    * all-zero ('0.0%'/'-0.0%') errors (test_data_validator.py:330) */
  val zeroPercent: HepRow = row("valid_data_with_zero_percent.yaml",
    indep = Seq(indepVar("M(2JET)",
      Seq(bin("0.26", Some(0.26), "0.31", Some(0.31))))),
    dep = Seq(depVar("D2(SIG)/DM(2JET)/DYRAP*", Seq(
      dval("777000.0", Seq(
        sym("0.0%", "stat"), asym("0.0%", "-0.0%", "sys"), sym("0.0%", "sys"),
        asym("-0.0%", "0.0%", "sys"), sym("0.0%", "sys")))))))

  /** testsuite/test_data/file_with_inconsistent_values.yaml —
    * "Inconsistent length ... [1], ... [2]" (test_data_validator.py:344) */
  val inconsistent: HepRow = row("file_with_inconsistent_values.yaml",
    indep = Seq(indepVar("SQRT(S)", Seq(point("7000", isString = false)))),
    dep = Seq(depVar("SIG(total)",
      Seq(dval("6.7", stdErrs1), dval("5.7", stdErrs2)))))

  /** testsuite/test_data/binning_average.yaml — 2 indep vars × 40 bins, no
    * dep vars; only-independent-variables error (test_data_validator.py:357) */
  val binningAverage: HepRow = {
    val bins = (0 until 40).map { b =>
      bin(s"$b.0", Some(b.toDouble), s"${b + 1}.0", Some(b + 1.0))
    }
    row("binning_average.yaml",
      indep = Seq(indepVar("XI(C)", bins), indepVar("Q**2", bins)),
      dep = Seq.empty)
  }

  /** testsuite/test_data/invalid_missing_values.yaml — required 'values'
    * schema error only; semantic checks abort (test_data_validator.py:394) */
  val missingValues: HepRow = row("invalid_missing_values.yaml",
    indep = Seq(indepVar("SQRT(S)",
      Seq(point("7000", isString = false), point("8000", isString = false)))),
    dep = Seq(depVar("SIG(total)", null)))

  /** testsuite/test_data/invalid_independent_variables_file.yaml — the 10
    * golden errors of test_data_validator.py:372-381 */
  val invalidIndepVars: HepRow = {
    def pointStr(v: String) = point(v, isString = true)
    val values = Seq(
      // low only / high only / string low+high (oneOf failures)
      HepIndepVal(hasValue = false, null, valueIsString = false,
        hasLow = true, "6000", lowIsNum = true, Some(6000d),
        hasHigh = false, null, highIsNum = false, None,
        "{'low': 6000}", Nil),
      HepIndepVal(hasValue = false, null, valueIsString = false,
        hasLow = false, null, lowIsNum = false, None,
        hasHigh = true, "7000", highIsNum = true, Some(7000d),
        "{'high': 7000}", Nil),
      HepIndepVal(hasValue = false, null, valueIsString = false,
        hasLow = true, "2.0.0", lowIsNum = false, None,
        hasHigh = true, "7.0.0", highIsNum = false, None,
        "{'high': '7.0.0', 'low': '2.0.0'}", Nil),
      // string ranges
      pointStr("800 - 1000"), pointStr("-5.3--2"),
      pointStr("+2.3E5 -  +5E12"), pointStr("-1e-09 - -3.5e-08"),
      // OK strings
      pointStr("Mono-V overlap removal"), pointStr("-3.5"),
      // both infinite
      bin("-inf", Some(Double.NegativeInfinity), "inf", Some(Double.PositiveInfinity)),
      // two underflow bins
      bin("-inf", Some(Double.NegativeInfinity), "0.0", Some(0.0)),
      bin("-inf", Some(Double.NegativeInfinity), "1.0", Some(1.0)),
      // two overflow bins
      bin("0.0", Some(0.0), "inf", Some(Double.PositiveInfinity)),
      bin("1.0", Some(1.0), "inf", Some(Double.PositiveInfinity)))
    val depVals = (0 until 14).map(i => dval(s"${5 + i}.7", stdErrs2))
    row("invalid_independent_variables_file.yaml",
      indep = Seq(indepVar("SQRT(S)", values)),
      dep = Seq(depVar("SIG(total)", depVals)))
  }

  private def numPoints(n: Int): Seq[HepIndepVal] =
    (0 until n).map(i => point(i.toString, isString = false))

  /** Synthetic P10 corpus (no reference fixture exercises the error-mapping
    * structural `oneOf`); goldens pinned by running the live reference —
    * HepDataRulesSpec "error-mapping structural oneOf" tests. */

  /** oneOf both directions + additionalProperties + label-type ordering */
  val errorOneOf: HepRow = row("invalid_error_oneof.yaml",
    indep = Seq(indepVar("X", numPoints(5))),
    dep = Seq(depVar("Y", Seq(
      dval("6.1", Seq(sym("0.1"), noneErr("{'label': 'sys'}", "sys"))),
      dval("6.2", Seq(bothErr("0.1", "0.1", "-0.1",
        "{'symerror': 0.1, 'asymerror': {'plus': 0.1, 'minus': -0.1}}"))),
      dval("6.3", Seq(sym("0.3", extraKeys = Seq("foo")))),
      dval("6.4", Seq(noneErr("{'label': 123}", "123", labelIsString = false))),
      dval("6.5", Seq(asym("1", "1", asymExtraKeys = Seq("zzz"))))))))

  /** check_error_values' stale error_plus/error_minus locals: a neither-key
    * error reuses the PREVIOUS error's values for the empty and all-zero
    * checks (reference data_file_validator.py:236-283 loop state) */
  val errorStale: HepRow = row("invalid_error_stale.yaml",
    indep = Seq(indepVar("X", numPoints(2))),
    dep = Seq(depVar("Y", Seq(
      dval("7.1", Seq(sym(""), noneErr("{'label': 'sys'}", "sys"))),
      dval("7.2", Seq(sym("0.0"), noneErr("{'label': 'x'}", "x")))))))

  /** a neither-key FIRST error → NameError → all semantic checks abort
    * (the later bad symerror AND the length mismatch are suppressed) */
  val errorAbort: HepRow = row("invalid_error_abort.yaml",
    indep = Seq(indepVar("X", numPoints(1))),
    dep = Seq(depVar("Y", Seq(
      dval("8.1", Seq(noneErr("{'label': 'sys'}", "sys"))),
      dval("8.2", Seq(sym("bad")))))))

  /** asymerror missing 'minus' → plus converts (invalid message emitted)
    * then KeyError → abort; the later bad symerror is suppressed */
  val errorAsymMissing: HepRow = row("invalid_error_asym_missing.yaml",
    indep = Seq(indepVar("X", numPoints(2))),
    dep = Seq(depVar("Y", Seq(
      dval("9.1", Seq(HepErr(hasSym = false, symRaw = null, hasAsym = true,
        plusRaw = "2.x", minusRaw = null, hasLabel = false, labelRaw = null,
        labelIsString = true, extraKeys = Nil, hasPlus = true,
        hasMinus = false))),
      dval("9.2", Seq(sym("bad2")))))))

  /** member-type failures that do NOT abort the semantic checks: bools fail
    * the schema type check but Python float(True/False) = 1.0/0.0, so the
    * stale machinery keeps running (False ⇒ all-zero fires) */
  val errorMemberTypes: HepRow = row("invalid_error_member_types.yaml",
    indep = Seq(indepVar("X", numPoints(3))),
    dep = Seq(depVar("Y", Seq(
      dval("2", Seq(
        HepErr(hasSym = true, symRaw = "True", hasAsym = false,
          plusRaw = null, minusRaw = null, hasLabel = false, labelRaw = null,
          labelIsString = true, extraKeys = Nil, symRepr = "True"),
        noneErr("{'label': 'sys'}", "sys"))),
      dval("2", Seq(
        HepErr(hasSym = true, symRaw = "False", hasAsym = false,
          plusRaw = null, minusRaw = null, hasLabel = false, labelRaw = null,
          labelIsString = true, extraKeys = Nil, symRepr = "False"))),
      dval("2", Seq(
        HepErr(hasSym = false, symRaw = null, hasAsym = true,
          plusRaw = "0.1", minusRaw = "True", hasLabel = false,
          labelRaw = null, labelIsString = true, extraKeys = Nil,
          minusRepr = "True")))))))

  /** list-valued symerror: schema type error, then float([1, 2]) raises
    * TypeError → the later bad symerror is suppressed */
  val errorSymList: HepRow = row("invalid_error_sym_list.yaml",
    indep = Seq(indepVar("X", numPoints(2))),
    dep = Seq(depVar("Y", Seq(
      dval("2", Seq(HepErr(hasSym = true, symRaw = null, hasAsym = false,
        plusRaw = null, minusRaw = null, hasLabel = false, labelRaw = null,
        labelIsString = true, extraKeys = Nil, symRepr = "[1, 2]"))),
      dval("2", Seq(sym("bad")))))))

  /** non-mapping asymerror: type error, then subscripting raises → abort */
  val errorAsymObject: HepRow = row("invalid_error_asym_object.yaml",
    indep = Seq(indepVar("X", numPoints(2))),
    dep = Seq(depVar("Y", Seq(
      dval("2", Seq(HepErr(hasSym = false, symRaw = null, hasAsym = true,
        plusRaw = null, minusRaw = null, hasLabel = false, labelRaw = null,
        labelIsString = true, extraKeys = Nil, hasPlus = false,
        hasMinus = false, asymRepr = "5"))),
      dval("2", Seq(sym("bad")))))))

  /** list-valued asymerror.plus: member type error, float([1]) raises */
  val errorPlusList: HepRow = row("invalid_error_plus_list.yaml",
    indep = Seq(indepVar("X", numPoints(2))),
    dep = Seq(depVar("Y", Seq(
      dval("2", Seq(HepErr(hasSym = false, symRaw = null, hasAsym = true,
        plusRaw = null, minusRaw = "0.1", hasLabel = false, labelRaw = null,
        labelIsString = true, extraKeys = Nil, plusRepr = "[1]"))),
      dval("2", Seq(sym("bad")))))))

  val all: Seq[HepRow] = Seq(validFile, invalidFile, emptyFile,
    zeroUncertainty, percent, zeroPercent, inconsistent, binningAverage,
    missingValues, invalidIndepVars,
    errorOneOf, errorStale, errorAbort, errorAsymMissing,
    errorMemberTypes, errorSymList, errorAsymObject, errorPlusList)
}
