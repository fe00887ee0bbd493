package graft.hep

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Faithful one-pass replay of the reference's `check_error_values`
  * (data_file_validator.py:224-284) over one document's `dep` array.
  *
  * This check is SEQUENTIAL by construction: the reference's `error_plus` /
  * `error_minus` locals persist ACROSS loop iterations (across errors, values
  * and even dependent variables), so an error mapping with neither `symerror`
  * nor `asymerror` silently reuses the PREVIOUS error's values for the
  * empty-string and all-zero checks — and raises NameError (aborting all
  * remaining semantic checks) if no previous error ever bound them. Likewise
  * an `asymerror` missing `plus`/`minus` raises KeyError mid-iteration.
  * Verified against the live reference (see HepDataRulesSpec "stale" cases).
  * A per-element Column formulation cannot express this carried state, so it
  * runs as a native kernel: one imperative pass per row, embarrassingly
  * parallel across rows, `doGenCode` via a reference object so the enclosing
  * projection stays in whole-stage codegen.
  *
  * The kernel ALSO emits the per-error-mapping SCHEMA checks (member types,
  * asymerror required/addProps, label type, structural oneOf, error-level
  * addProps) as it walks: ~10 interpreted Column branches per error would
  * otherwise run in the fused projection's HigherOrderFunction lambdas —
  * the hottest nested loop of the structural phase. Schema emission is a
  * separate full pass (jsonschema ran before the semantic try block, so a
  * semantic abort never truncates it); the `cfg` carries the version-gated
  * reprs so messages stay byte-exact per published schema version.
  *
  * Output: struct(schemaVios: array<vio>, vios: array<vio>, aborted: bool)
  * with vio = struct(phase,k1..k5,message); keys match the Column
  * formulation's sort scheme. `aborted` mirrors "an exception escaped the
  * semantic-check try block" (suppresses later checks + drives the
  * unexpected-error apology).
  */
case class ErrorValuesKernel(child: Expression,
    cfg: ErrorValuesKernel.ErrItemCfg) extends UnaryExpression {

  override def prettyName: String = "check_error_values"

  override def dataType: DataType = ErrorValuesKernel.outType

  override def nullable: Boolean = false

  // ordinal resolution against the HepDepVar/HepDepVal/HepErr struct schemas
  @transient private lazy val depSt =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  @transient private lazy val valSt = depSt(depSt.fieldIndex("values"))
    .dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  @transient private lazy val errSt = valSt(valSt.fieldIndex("errors"))
    .dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  @transient private lazy val oHasValues = depSt.fieldIndex("hasValues")
  @transient private lazy val oValues = depSt.fieldIndex("values")
  @transient private lazy val oHasErrors = valSt.fieldIndex("hasErrors")
  @transient private lazy val oErrors = valSt.fieldIndex("errors")
  @transient private lazy val oHasSym = errSt.fieldIndex("hasSym")
  @transient private lazy val oSymRaw = errSt.fieldIndex("symRaw")
  @transient private lazy val oHasAsym = errSt.fieldIndex("hasAsym")
  @transient private lazy val oPlusRaw = errSt.fieldIndex("plusRaw")
  @transient private lazy val oMinusRaw = errSt.fieldIndex("minusRaw")
  @transient private lazy val oHasPlus = errSt.fieldIndex("hasPlus")
  @transient private lazy val oHasMinus = errSt.fieldIndex("hasMinus")
  @transient private lazy val oSymRepr = errSt.fieldIndex("symRepr")
  @transient private lazy val oAsymRepr = errSt.fieldIndex("asymRepr")
  @transient private lazy val oPlusRepr = errSt.fieldIndex("plusRepr")
  @transient private lazy val oMinusRepr = errSt.fieldIndex("minusRepr")
  @transient private lazy val oHasLabel = errSt.fieldIndex("hasLabel")
  @transient private lazy val oLabelRaw = errSt.fieldIndex("labelRaw")
  @transient private lazy val oLabelIsString = errSt.fieldIndex("labelIsString")
  @transient private lazy val oExtraKeys = errSt.fieldIndex("extraKeys")
  @transient private lazy val oAsymExtraKeys = errSt.fieldIndex("asymExtraKeys")
  @transient private lazy val oInstanceRepr = errSt.fieldIndex("instanceRepr")

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  import ErrorValuesKernel._

  private def addPropsText(extras: ArrayData): String = {
    val ks = (0 until extras.numElements())
      .map(extras.getUTF8String(_).toString).sorted
    val verb = if (ks.size == 1) "was" else "were"
    s"Additional properties are not allowed (${ks.map(k => s"'$k'").mkString(", ")} $verb unexpected)"
  }

  /** Per-error-mapping schema checks, in the error-item schema's keyword
    * order (k5 encodes it; see HepDataRules Scaladoc). */
  private def schemaPass(dep: ArrayData,
      out: scala.collection.mutable.ArrayBuffer[InternalRow]): Unit = {
    val nVars = dep.numElements()
    var k = 0
    while (k < nVars) {
      val dv = dep.getStruct(k, depSt.size)
      val vals = if (dv == null) null else dv.getArray(oValues)
      val nVals = if (vals == null) 0 else vals.numElements()
      var i = 0
      while (i < nVals) {
        val value = vals.getStruct(i, valSt.size)
        val errs = if (value == null) null else value.getArray(oErrors)
        val nErrs = if (errs == null) 0 else errs.numElements()
        var j = 0
        while (j < nErrs) {
          val e = errs.getStruct(j, errSt.size)
          if (e != null) {
            val loc = s" in 'dependent_variables[$k].values[$i].errors[$j]"
            def emit(k5: Int, msg: String): Unit =
              out += vio(0, 1, k, i, j, k5, msg)
            val hasSym = e.getBoolean(oHasSym)
            val hasAsym = e.getBoolean(oHasAsym)
            val asymIsObj = hasAsym && e.isNullAt(oAsymRepr)
            if (hasSym && !e.isNullAt(oSymRepr))
              emit(0, s"${e.getUTF8String(oSymRepr)} is not of type 'number', 'string'$loc.symerror' (expected: ${cfg.symMemberRepr})")
            if (hasAsym && !e.isNullAt(oAsymRepr))
              emit(1, s"${e.getUTF8String(oAsymRepr)} is not of type 'object'$loc.asymerror' (expected: ${cfg.errAsymRepr})")
            if (asymIsObj && e.getBoolean(oHasMinus) && !e.isNullAt(oMinusRepr))
              emit(2, s"${e.getUTF8String(oMinusRepr)} is not of type 'number', 'string'$loc.asymerror.minus' (expected: ${cfg.minusMemberRepr})")
            if (asymIsObj && e.getBoolean(oHasPlus) && !e.isNullAt(oPlusRepr))
              emit(3, s"${e.getUTF8String(oPlusRepr)} is not of type 'number', 'string'$loc.asymerror.plus' (expected: ${cfg.plusMemberRepr})")
            if (cfg.v1 && asymIsObj && !e.getBoolean(oHasMinus))
              emit(4, s"'minus' is a required property$loc.asymerror' (expected: ${cfg.errAsymRepr})")
            if (cfg.v1 && asymIsObj && !e.getBoolean(oHasPlus))
              emit(5, s"'plus' is a required property$loc.asymerror' (expected: ${cfg.errAsymRepr})")
            if (cfg.v1 && asymIsObj) {
              val ax = e.getArray(oAsymExtraKeys)
              if (ax != null && ax.numElements() > 0)
                emit(6, s"${addPropsText(ax)}$loc.asymerror' (expected: ${cfg.errAsymRepr})")
            }
            if (e.getBoolean(oHasLabel) && !e.getBoolean(oLabelIsString) &&
                !e.isNullAt(oLabelRaw))
              emit(7, s"${e.getUTF8String(oLabelRaw)} is not of type 'string'$loc.label' (expected: ${cfg.labelRepr})")
            if (cfg.v1) {
              val nOneOf = (if (hasSym) 1 else 0) + (if (hasAsym) 1 else 0)
              val inst = if (e.isNullAt(oInstanceRepr)) "{}"
                else e.getUTF8String(oInstanceRepr).toString
              if (nOneOf == 0)
                emit(8, s"$inst is not valid under any of the given schemas$loc' (expected: ${cfg.errItemRepr})")
              else if (nOneOf == 2)
                emit(8, s"$inst is valid under each of {'required': ['asymerror']}, {'required': ['symerror']}$loc' (expected: ${cfg.errItemRepr})")
            }
            val ex = e.getArray(oExtraKeys)
            if (ex != null && ex.numElements() > 0)
              emit(9, s"${addPropsText(ex)}$loc' (expected: ${cfg.errItemRepr})")
          }
          j += 1
        }
        i += 1
      }
      k += 1
    }
  }

  /** Public so generated code can call it through the reference object. */
  def compute(dep: ArrayData): InternalRow = {
    val schemaOut = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    schemaPass(dep, schemaOut)
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    // carried convert_to_float results; KIND_UNBOUND until first binding
    var pKind = KindUnbound; var pNum = 0.0
    var mKind = KindUnbound; var mNum = 0.0
    var aborted = false

    def parse(raw: UTF8String, k: Int, i: Int, j: Int, sub: String,
        k4: Int, k5: Int): (Int, Double) = {
      // convert_to_float: strip '%', float-parse; '' allowed silently;
      // other unparseable strings emit the invalid message and stay strings.
      // Gated by a Python-float-shaped regex because Java's parseDouble
      // accepts trailing f/d suffixes Python rejects (the '2.300e-003f'
      // golden case).
      val stripped = raw.toString.replace("%", "")
      val t = stripped.trim
      if (t.nonEmpty && PyFloatPat.matcher(t).matches()) {
        (KindNum, parsePyFloat(t))
      } else if (stripped.isEmpty) {
        (KindEmpty, 0.0)
      } else {
        out += vio(1, k, i, j, k4, k5,
          s"Invalid error value $stripped: value must be a number (possibly ending in %) in 'dependent_variables.values[$i].errors[$j].$sub'")
        (KindStr, 0.0)
      }
    }

    val nVars = dep.numElements()
    var k = 0
    while (k < nVars && !aborted) {
      val dv = dep.getStruct(k, depSt.size)
      if (dv == null || !dv.getBoolean(oHasValues)) {
        aborted = true // KeyError: dependent_variable['values']
      } else {
        val vals = dv.getArray(oValues)
        if (vals == null) aborted = true // iterate None: TypeError
        else {
        val nVals = vals.numElements()
        var i = 0
        while (i < nVals && !aborted) {
          val value = vals.getStruct(i, valSt.size)
          if (value != null && value.getBoolean(oHasErrors)) {
            val errs = value.getArray(oErrors)
            val nErrs = if (errs == null) { aborted = true; 0 }
              else errs.numElements()
            var zeroAll = true
            var zeroCount = 0
            var j = 0
            while (j < nErrs && !aborted) {
              val e = errs.getStruct(j, errSt.size)
              var hasAsymFlag = false
              if (e == null) {
                aborted = true // a non-mapping error entry: TypeError
              } else if (e.getBoolean(oHasSym)) {
                // non-(number|string) symerror (repr carrier set): Python
                // float(bool) SUCCEEDS as 1.0/0.0, float of anything else
                // (list/dict/None) raises TypeError -> abort
                val badType = !e.isNullAt(oSymRepr)
                val raw = e.getUTF8String(oSymRaw)
                if (badType && raw != null &&
                    (raw.toString == "True" || raw.toString == "False")) {
                  val n = if (raw.toString == "True") 1.0 else 0.0
                  pKind = KindNum; pNum = n; mKind = KindNum; mNum = n
                } else if (badType || raw == null) {
                  aborted = true // float(non-scalar): TypeError
                } else {
                  val (kd, n) = parse(raw, k, i, j, "symerror", 0, 0)
                  pKind = kd; pNum = n; mKind = kd; mNum = n
                }
              } else if (e.getBoolean(oHasAsym)) {
                hasAsymFlag = true
                def member(hasOrd: Int, rawOrd: Int, reprOrd: Int,
                    sub: String, k4: Int, k5: Int): Option[(Int, Double)] = {
                  // KeyError on a missing member, TypeError on subscripting
                  // a non-mapping asymerror or float() of a non-scalar;
                  // bools again convert to 1.0/0.0
                  if (!e.isNullAt(oAsymRepr) || !e.getBoolean(hasOrd)) None
                  else {
                    val badType = !e.isNullAt(reprOrd)
                    val raw = e.getUTF8String(rawOrd)
                    if (badType && raw != null &&
                        (raw.toString == "True" || raw.toString == "False"))
                      Some((KindNum, if (raw.toString == "True") 1.0 else 0.0))
                    else if (badType || raw == null) None
                    else Some(parse(raw, k, i, j, sub, k4, k5))
                  }
                }
                member(oHasPlus, oPlusRaw, oPlusRepr, "asymerror.plus", 0, 1) match {
                  case None => aborted = true
                  case Some((kd, n)) =>
                    pKind = kd; pNum = n
                    member(oHasMinus, oMinusRaw, oMinusRepr,
                        "asymerror.minus", 1, 0) match {
                      case None => aborted = true
                      case Some((kd2, n2)) => mKind = kd2; mNum = n2
                    }
                }
              } else {
                // neither key: the reference falls through to
                // `if error_plus == ''` with whatever the previous error
                // bound — NameError (abort) if nothing ever did.
                if (pKind == KindUnbound) aborted = true
              }
              if (!aborted) {
                if (pKind == KindEmpty && mKind == KindEmpty) {
                  if (hasAsymFlag)
                    out += vio(1, k, i, j, 5, 0,
                      s"asymerror plus and minus cannot both be empty in 'dependent_variables.values[$i].errors[$j].asymerror'")
                  else
                    out += vio(1, k, i, j, 5, 0,
                      s"symerror cannot be empty in 'dependent_variables.values[$i].errors[$j].symerror'")
                }
                zeroCount += 1
                if (!(pKind == KindNum && pNum == 0.0 &&
                      mKind == KindNum && mNum == 0.0)) zeroAll = false
              }
              j += 1
            }
            if (!aborted && zeroCount > 0 && zeroAll) {
              out += vio(1, k, i, 9999, 0, 0,
                s"Uncertainties should not all be zero in 'dependent_variables.values[$i].errors'")
            }
          }
          i += 1
        }
        }
      }
      k += 1
    }
    InternalRow(new GenericArrayData(schemaOut.toArray[Any]),
      new GenericArrayData(out.toArray[Any]), aborted)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("errorValuesKernel", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): ErrorValuesKernel =
    copy(child = c)
}

object ErrorValuesKernel {

  /** Version-gated message config: `v1` = oneOf + asym required/addProps
    * exist (1.0+ schemas); reprs derived per published schema version. */
  final case class ErrItemCfg(
      v1: Boolean,
      errItemRepr: String, errAsymRepr: String, labelRepr: String,
      symMemberRepr: String, minusMemberRepr: String, plusMemberRepr: String)

  private final val KindUnbound = 0
  private final val KindEmpty = 1
  private final val KindStr = 2
  private final val KindNum = 3

  /** Python-float-shaped literals only (see HepDataRules gotcha). */
  private[hep] val PyFloatPat = java.util.regex.Pattern.compile(
    "^[+-]?((\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?|[iI][nN][fF]([iI][nN][iI][tT][yY])?|[nN][aA][nN])$")

  private def parsePyFloat(t: String): Double = {
    val l = t.toLowerCase
    val (sign, body) =
      if (l.startsWith("-")) (-1.0, l.substring(1))
      else if (l.startsWith("+")) (1.0, l.substring(1)) else (1.0, l)
    if (body == "inf" || body == "infinity") sign * Double.PositiveInfinity
    else if (body == "nan") Double.NaN
    else java.lang.Double.parseDouble(t)
  }

  private def vio(phase: Int, k1: Int, k2: Int, k3: Int, k4: Int, k5: Int,
      message: String): InternalRow =
    InternalRow(phase, k1, k2, k3, k4, k5, UTF8String.fromString(message))

  val vioType: StructType = StructType(Seq(
    StructField("phase", IntegerType, nullable = false),
    StructField("k1", IntegerType, nullable = false),
    StructField("k2", IntegerType, nullable = false),
    StructField("k3", IntegerType, nullable = false),
    StructField("k4", IntegerType, nullable = false),
    StructField("k5", IntegerType, nullable = false),
    StructField("message", StringType, nullable = true)))

  val outType: StructType = StructType(Seq(
    StructField("schemaVios", ArrayType(vioType, containsNull = false),
      nullable = false),
    StructField("vios", ArrayType(vioType, containsNull = false), nullable = false),
    StructField("aborted", BooleanType, nullable = false)))
}
