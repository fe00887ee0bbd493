package graft.hep

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass replay of HepDataRules' fused rule projection — the
  * structural phase 0 (top-level required / bad-array / per-variable /
  * header / qualifier / value schema checks), phase 2 (length consistency),
  * phase 3 (independent-variable value checks), the exception-abort gating
  * and the final array_sort + unexpected-error fallback — everything the
  * pure-Column tree in [[HepDataRules.packedViolationsSpec]] expresses with
  * ~40 nested transform/filter/flatten HigherOrderFunctions. Those HOFs are
  * interpreted AND CodegenFallback: the whole document projection ran
  * row-at-a-time with per-element virtual calls (measured ~1.4 s of the
  * hep_scaled_50k bench entry at sf0.1; guide §1/§4 — the same motivation
  * as ErrorValuesKernel, which already handles the sequential phase 1 and
  * per-error schema checks and whose output this kernel takes as its second
  * child).
  *
  * Byte-exactness contract (proven by HepKernelEquivSpec against the Column
  * spec, plus the existing fixture/corpus suites):
  *  - identical messages: every branch transliterates the Column tree's
  *    concat(...) including the version-gated schema reprs in `cfg`;
  *  - identical sort: the final ordering replays array_sort's struct
  *    ordering — (phase, k1..k5) ascending, then message by UTF8String
  *    binary comparison (nulls first);
  *  - identical null propagation at the array level: a null indep/dep array
  *    or null variable element made the Column tree's flatten/concat null,
  *    so the kernel returns null for the whole row then too (cannot occur
  *    for encoder-produced rows — Seq fields are never null);
  *  - addProps key lists sort by UTF8String bytes (= Python code-point
  *    order), exactly like the Column array_sort the tree used.
  */
case class HepDocKernel(left: Expression, right: Expression,
    cfg: HepDocKernel.Cfg) extends BinaryExpression {

  override def prettyName: String = "hep_doc_rules"
  override def dataType: DataType =
    ArrayType(ErrorValuesKernel.vioType, containsNull = false)
  override def nullable: Boolean = true

  // ---- ordinal resolution against the doc struct -----------------------
  @transient private lazy val docSt = left.dataType.asInstanceOf[StructType]
  @transient private lazy val oFile = docSt.fieldIndex("file")
  @transient private lazy val oEmptyDoc = docSt.fieldIndex("emptyDoc")
  @transient private lazy val oHasIndep = docSt.fieldIndex("hasIndep")
  @transient private lazy val oIndep = docSt.fieldIndex("indep")
  @transient private lazy val oHasDep = docSt.fieldIndex("hasDep")
  @transient private lazy val oDep = docSt.fieldIndex("dep")
  @transient private lazy val oIndepBad = docSt.fieldIndex("indepBadRepr")
  @transient private lazy val oDepBad = docSt.fieldIndex("depBadRepr")

  // HepIndepVar / HepIndepVal / HepHeader ordinals
  @transient private lazy val ivSt = docSt(oIndep).dataType
    .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  @transient private lazy val ivHasValues = ivSt.fieldIndex("hasValues")
  @transient private lazy val ivValues = ivSt.fieldIndex("values")
  @transient private lazy val ivHasHeader = ivSt.fieldIndex("hasHeader")
  @transient private lazy val ivExtraKeys = ivSt.fieldIndex("extraKeys")
  @transient private lazy val ivHeader = ivSt.fieldIndex("header")
  @transient private lazy val xSt = ivSt(ivValues).dataType
    .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  @transient private lazy val xHasValue = xSt.fieldIndex("hasValue")
  @transient private lazy val xValueRaw = xSt.fieldIndex("valueRaw")
  @transient private lazy val xValueIsString = xSt.fieldIndex("valueIsString")
  @transient private lazy val xHasLow = xSt.fieldIndex("hasLow")
  @transient private lazy val xLowRaw = xSt.fieldIndex("lowRaw")
  @transient private lazy val xLowIsNum = xSt.fieldIndex("lowIsNum")
  @transient private lazy val xLowNum = xSt.fieldIndex("lowNum")
  @transient private lazy val xHasHigh = xSt.fieldIndex("hasHigh")
  @transient private lazy val xHighRaw = xSt.fieldIndex("highRaw")
  @transient private lazy val xHighIsNum = xSt.fieldIndex("highIsNum")
  @transient private lazy val xHighNum = xSt.fieldIndex("highNum")
  @transient private lazy val xInstanceRepr = xSt.fieldIndex("instanceRepr")
  @transient private lazy val xExtraKeys = xSt.fieldIndex("extraKeys")
  @transient private lazy val hSt = ivSt(ivHeader).dataType.asInstanceOf[StructType]
  @transient private lazy val hIsObj = hSt.fieldIndex("isObj")
  @transient private lazy val hRepr = hSt.fieldIndex("repr")
  @transient private lazy val hHasName = hSt.fieldIndex("hasName")
  @transient private lazy val hNameRepr = hSt.fieldIndex("nameRepr")
  @transient private lazy val hUnitsRepr = hSt.fieldIndex("unitsRepr")
  @transient private lazy val hExtraKeys = hSt.fieldIndex("extraKeys")

  // HepDepVar / HepDepVal / HepQualifier ordinals
  @transient private lazy val dvSt = docSt(oDep).dataType
    .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  @transient private lazy val dvHasHeader = dvSt.fieldIndex("hasHeader")
  @transient private lazy val dvHasValues = dvSt.fieldIndex("hasValues")
  @transient private lazy val dvValues = dvSt.fieldIndex("values")
  @transient private lazy val dvExtraKeys = dvSt.fieldIndex("extraKeys")
  @transient private lazy val dvHeader = dvSt.fieldIndex("header")
  @transient private lazy val dvHasQualifiers = dvSt.fieldIndex("hasQualifiers")
  @transient private lazy val dvQualifiersRepr = dvSt.fieldIndex("qualifiersRepr")
  @transient private lazy val dvQualifiers = dvSt.fieldIndex("qualifiers")
  @transient private lazy val dxSt = dvSt(dvValues).dataType
    .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  @transient private lazy val dxHasValue = dxSt.fieldIndex("hasValue")
  @transient private lazy val dxExtraKeys = dxSt.fieldIndex("extraKeys")
  @transient private lazy val qSt = dvSt(dvQualifiers).dataType
    .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  @transient private lazy val qHasName = qSt.fieldIndex("hasName")
  @transient private lazy val qNameRepr = qSt.fieldIndex("nameRepr")
  @transient private lazy val qHasValue = qSt.fieldIndex("hasValue")
  @transient private lazy val qValueRepr = qSt.fieldIndex("valueRepr")
  @transient private lazy val qUnitsRepr = qSt.fieldIndex("unitsRepr")
  @transient private lazy val qExtraKeys = qSt.fieldIndex("extraKeys")

  @transient private lazy val rangePat =
    java.util.regex.Pattern.compile(HepDataRules.RangeRe)

  import HepDocKernel._

  override def eval(input: InternalRow): Any = {
    val doc = left.eval(input)
    if (doc == null) return null
    val ev = right.eval(input)
    if (ev == null) return null
    compute(doc.asInstanceOf[InternalRow], ev.asInstanceOf[InternalRow])
  }

  override def nullSafeEval(doc: Any, ev: Any): Any =
    compute(doc.asInstanceOf[InternalRow], ev.asInstanceOf[InternalRow])

  /** addPropsText over an extraKeys array — keys sorted by UTF8String bytes
    * (the Column tree's array_sort), quoted, comma-joined. */
  private def addPropsText(extras: ArrayData): String = {
    val n = extras.numElements()
    val ks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { ks(i) = extras.getUTF8String(i); i += 1 }
    java.util.Arrays.sort(ks, (a: UTF8String, b: UTF8String) => a.compareTo(b))
    val verb = if (n == 1) "was" else "were"
    s"Additional properties are not allowed (${ks.map(k => s"'$k'").mkString(", ")} $verb unexpected)"
  }

  private def str(u: UTF8String): String = if (u == null) "null" else u.toString

  /** Header-internal checks shared by indep/dep vars (k3 = -10). Emits
    * nothing for a null header struct — every Column condition evaluated
    * null and when() skipped, exactly this. */
  private def headerErrs(out: Buf, hasHeader: Boolean, h: InternalRow,
      k1: Int, idx: Int, loc: String, hR: String, nameR: String,
      unitsR: String): Unit = {
    if (h == null) return
    def v5(k4: Int, msg: String): Unit = out += vio(0, k1, idx, -10, k4, 0, msg)
    val isObj = h.getBoolean(hIsObj)
    if (hasHeader && !isObj)
      v5(0, s"${str(h.getUTF8String(hRepr))} is not of type 'object' in '$loc' (expected: $hR)")
    val inH = hasHeader && isObj
    if (inH && !h.isNullAt(hNameRepr))
      v5(1, s"${h.getUTF8String(hNameRepr)} is not of type 'string' in '$loc.name' (expected: $nameR)")
    if (inH && !h.isNullAt(hUnitsRepr))
      v5(2, s"${h.getUTF8String(hUnitsRepr)} is not of type 'string' in '$loc.units' (expected: $unitsR)")
    if (inH && !h.getBoolean(hHasName))
      v5(3, s"'name' is a required property in '$loc' (expected: $hR)")
    if (inH) {
      val ex = h.getArray(hExtraKeys)
      if (ex != null && ex.numElements() > 0)
        v5(4, s"${addPropsText(ex)} in '$loc' (expected: $hR)")
    }
  }

  /** Public so generated code can call it through the reference object.
    * Returns the final sorted `_v` array, or null where the Column tree's
    * flatten/concat null propagation made the whole array null. */
  def compute(doc: InternalRow, ev: InternalRow): ArrayData = {
    val emptyDoc = doc.getBoolean(oEmptyDoc)
    val hasIndep = doc.getBoolean(oHasIndep)
    val hasDep = doc.getBoolean(oHasDep)
    val indep = doc.getArray(oIndep)
    val dep = doc.getArray(oDep)
    if (indep == null || dep == null) return null
    val indepBad = !doc.isNullAt(oIndepBad)
    val depBad = !doc.isNullAt(oDepBad)
    val out = new Buf

    // ---- phase -1: empty document ------------------------------------
    if (emptyDoc) out += vio(-1, 0, 0, 0, 0, 0, "No data found in file.")

    // ---- phase 0: top-level required + bad-array ---------------------
    if (!emptyDoc && !hasIndep)
      out += vio(0, 2, 0, 0, 0, 0, "'independent_variables' is a required property")
    if (!emptyDoc && !hasDep)
      out += vio(0, 2, 1, 0, 0, 0, "'dependent_variables' is a required property")
    if (!emptyDoc && indepBad)
      out += vio(0, 0, -100, 0, 0, 0,
        s"${doc.getUTF8String(oIndepBad)} is not of type 'array' in 'independent_variables' (expected: ${cfg.indepArrayRepr})")
    if (!emptyDoc && depBad)
      out += vio(0, 1, -100, 0, 0, 0,
        s"${doc.getUTF8String(oDepBad)} is not of type 'array' in 'dependent_variables' (expected: ${cfg.depArrayRepr})")

    // ---- phase 0: independent-variable schema checks ------------------
    val nIv = indep.numElements()
    var i = 0
    while (i < nIv) {
      val v = indep.getStruct(i, ivSt.size)
      if (v == null) return null // flatten(null element) nulled the tree
      headerErrs(out, v.getBoolean(ivHasHeader), v.getStruct(ivHeader, hSt.size),
        0, i, s"independent_variables[$i].header",
        cfg.indepHeaderRepr, cfg.indepHeaderNameRepr, cfg.indepHeaderUnitsRepr)
      val vals = v.getArray(ivValues)
      val nVals = if (vals == null) 0 else vals.numElements()
      var j = 0
      while (j < nVals) {
        val x = vals.getStruct(j, xSt.size)
        if (x != null) {
          if (!cfg.pre110) {
            val ex = x.getArray(xExtraKeys)
            // a null extraKeys array made size(null) null, so the Column
            // when() never fired — only emit when the array is present
            val noExtras = ex != null && ex.numElements() == 0
            val schema1 = x.getBoolean(xHasValue) && !x.getBoolean(xHasLow) &&
              !x.getBoolean(xHasHigh) && noExtras
            val schema2 = x.getBoolean(xHasLow) && x.getBoolean(xHasHigh) &&
              x.getBoolean(xLowIsNum) && x.getBoolean(xHighIsNum) &&
              (!x.getBoolean(xHasValue) || !x.getBoolean(xValueIsString)) &&
              noExtras
            if (ex != null && !(schema1 || schema2))
              out += vio(0, 0, i, j, -1, 0,
                s"${str(x.getUTF8String(xInstanceRepr))} is not valid under any of the given schemas in 'independent_variables[$i].values[$j]' (expected: ${HepDataRules.OneOfRepr})")
          } else {
            if (x.getBoolean(xHasLow) && !x.getBoolean(xLowIsNum))
              out += vio(0, 0, i, j, -1, 0,
                s"'${str(x.getUTF8String(xLowRaw))}' is not of type 'number' in 'independent_variables[$i].values[$j].low' (expected: ${cfg.indepLowRepr})")
            if (x.getBoolean(xHasHigh) && !x.getBoolean(xHighIsNum))
              out += vio(0, 0, i, j, -1, 1,
                s"'${str(x.getUTF8String(xHighRaw))}' is not of type 'number' in 'independent_variables[$i].values[$j].high' (expected: ${cfg.indepHighRepr})")
            val ex = x.getArray(xExtraKeys)
            if (ex != null && ex.numElements() > 0)
              out += vio(0, 0, i, j, -1, 2,
                s"${addPropsText(ex)} in 'independent_variables[$i].values[$j]' (expected: ${cfg.indepValueItemRepr})")
          }
        }
        j += 1
      }
      if (!v.getBoolean(ivHasHeader))
        out += vio(0, 0, i, 9000, 0, 0,
          s"'header' is a required property in 'independent_variables[$i]' (expected: ${cfg.indepItemRepr})")
      if (!v.getBoolean(ivHasValues))
        out += vio(0, 0, i, 9000, 1, 0,
          s"'values' is a required property in 'independent_variables[$i]' (expected: ${cfg.indepItemRepr})")
      val vex = v.getArray(ivExtraKeys)
      if (vex != null && vex.numElements() > 0)
        out += vio(0, 0, i, 9001, 0, 0,
          s"${addPropsText(vex)} in 'independent_variables[$i]' (expected: ${cfg.indepItemRepr})")
      i += 1
    }

    // ---- phase 0: dependent-variable schema checks --------------------
    val nDv = dep.numElements()
    var k = 0
    while (k < nDv) {
      val dv = dep.getStruct(k, dvSt.size)
      if (dv == null) return null
      headerErrs(out, dv.getBoolean(dvHasHeader), dv.getStruct(dvHeader, hSt.size),
        1, k, s"dependent_variables[$k].header",
        cfg.depHeaderRepr, cfg.depHeaderNameRepr, cfg.depHeaderUnitsRepr)
      if (dv.getBoolean(dvHasQualifiers) && !dv.isNullAt(dvQualifiersRepr))
        out += vio(0, 1, k, -5, -1, 0,
          s"${dv.getUTF8String(dvQualifiersRepr)} is not of type 'array' in 'dependent_variables[$k].qualifiers' (expected: ${cfg.depQualifiersRepr})")
      val quals = dv.getArray(dvQualifiers)
      val nQ = if (quals == null) 0 else quals.numElements()
      var j = 0
      while (j < nQ) {
        val q = quals.getStruct(j, qSt.size)
        if (q != null) {
          val loc = s"dependent_variables[$k].qualifiers[$j]"
          def qv(k5: Int, msg: String): Unit = out += vio(0, 1, k, -5, j, k5, msg)
          if (!q.isNullAt(qNameRepr))
            qv(0, s"${q.getUTF8String(qNameRepr)} is not of type 'string' in '$loc.name' (expected: ${cfg.depQualifierNameRepr})")
          if (!q.isNullAt(qValueRepr))
            qv(1, s"${q.getUTF8String(qValueRepr)} is not of type 'string', 'number' in '$loc.value' (expected: ${cfg.depQualifierValueRepr})")
          if (!q.isNullAt(qUnitsRepr))
            qv(2, s"${q.getUTF8String(qUnitsRepr)} is not of type 'string' in '$loc.units' (expected: ${cfg.depQualifierUnitsRepr})")
          if (!q.getBoolean(qHasName))
            qv(3, s"'name' is a required property in '$loc' (expected: ${cfg.depQualifierItemRepr})")
          if (!q.getBoolean(qHasValue))
            qv(4, s"'value' is a required property in '$loc' (expected: ${cfg.depQualifierItemRepr})")
          val ex = q.getArray(qExtraKeys)
          if (ex != null && ex.numElements() > 0)
            qv(5, s"${addPropsText(ex)} in '$loc' (expected: ${cfg.depQualifierItemRepr})")
        }
        j += 1
      }
      val vals = dv.getArray(dvValues)
      val nVals = if (vals == null) 0 else vals.numElements()
      var vi = 0
      while (vi < nVals) {
        val x = vals.getStruct(vi, dxSt.size)
        if (x != null) {
          if (!x.getBoolean(dxHasValue))
            out += vio(0, 1, k, vi, 9000, 0,
              s"'value' is a required property in 'dependent_variables[$k].values[$vi]' (expected: ${cfg.depValueItemRepr})")
          val ex = x.getArray(dxExtraKeys)
          if (ex != null && ex.numElements() > 0)
            out += vio(0, 1, k, vi, 9001, 0,
              s"${addPropsText(ex)} in 'dependent_variables[$k].values[$vi]' (expected: ${cfg.depValueItemRepr})")
        }
        vi += 1
      }
      if (!cfg.pre110 && !dv.getBoolean(dvHasHeader))
        out += vio(0, 1, k, 9000, 0, 0,
          s"'header' is a required property in 'dependent_variables[$k]' (expected: ${HepDataRules.DepItemRepr})")
      if (!cfg.pre110 && !dv.getBoolean(dvHasValues))
        out += vio(0, 1, k, 9000, 1, 0,
          s"'values' is a required property in 'dependent_variables[$k]' (expected: ${HepDataRules.DepItemRepr})")
      val dex = dv.getArray(dvExtraKeys)
      if (dex != null && dex.numElements() > 0)
        out += vio(0, 1, k, 9001, 0, 0,
          s"${addPropsText(dex)} in 'dependent_variables[$k]' (expected: ${cfg.depItemAddRepr})")
      k += 1
    }

    // ---- phase 1 (from ErrorValuesKernel) + gating --------------------
    val evSchema = ev.getArray(0)
    val evVios = ev.getArray(1)
    val evAborted = ev.getBoolean(2)
    copyVios(out, evSchema)
    if (cfg.majorGt0) copyVios(out, evVios)

    val semAborted = !emptyDoc && (!hasDep || depBad || evAborted)
    val lengthRan = hasDep && !semAborted && !indepBad
    val phase23Gate = lengthRan && hasIndep

    // ---- phase 2: check_length_values ---------------------------------
    // counts of values for vars with hasValues, in order
    def counts(arr: ArrayData, st: StructType, hasValuesOrd: Int,
        valuesOrd: Int): Array[Int] = {
      val n = arr.numElements()
      val b = scala.collection.mutable.ArrayBuffer.empty[Int]
      var a = 0
      while (a < n) {
        val s = arr.getStruct(a, st.size)
        if (s != null && s.getBoolean(hasValuesOrd)) {
          val vs = s.getArray(valuesOrd)
          b += (if (vs == null) 0 else vs.numElements())
        }
        a += 1
      }
      b.toArray
    }
    if (cfg.majorGt0 && phase23Gate) {
      val ic = counts(indep, ivSt, ivHasValues, ivValues)
      val dc = counts(dep, dvSt, dvHasValues, dvValues)
      val distinct = (ic ++ dc).distinct
      def listStr(a: Array[Int]): String = a.mkString("[", ", ", "]")
      if (distinct.length > 1)
        out += vio(2, 0, 0, 0, 0, 0,
          s"Inconsistent length of 'values' list: independent_variables ${listStr(ic)}, dependent_variables ${listStr(dc)}")
      if (ic.length > 0 && dc.length == 0)
        out += vio(2, 0, 0, 0, 1, 0,
          s"Case of only independent_variables but no dependent_variables is not supported: independent_variables ${listStr(ic)}, dependent_variables ${listStr(dc)}")
    }

    // ---- phase 3: check_independent_variable_values -------------------
    // firstBadIndep: 1-based position of the first var without values
    var firstBadIndep = 0
    var a = 0
    while (a < nIv && firstBadIndep == 0) {
      val s = indep.getStruct(a, ivSt.size)
      if (s != null && !s.getBoolean(ivHasValues)) firstBadIndep = a + 1
      a += 1
    }
    if (cfg.ge110 && phase23Gate) {
      val limit = if (firstBadIndep == 0) nIv else firstBadIndep - 1
      var vi = 0
      while (vi < limit) {
        val v = indep.getStruct(vi, ivSt.size)
        val vals = v.getArray(ivValues)
        val nVals = if (vals == null) 0 else vals.numElements()
        var under: scala.collection.mutable.ArrayBuffer[String] = null
        var over: scala.collection.mutable.ArrayBuffer[String] = null
        var j = 0
        while (j < nVals) {
          val x = vals.getStruct(j, xSt.size)
          if (x != null) {
            if (x.getBoolean(xHasValue) && x.getBoolean(xValueIsString) &&
                !x.isNullAt(xValueRaw)) {
              val raw = x.getUTF8String(xValueRaw)
              val rs = raw.toString
              if (rs.contains("-") && rangePat.matcher(rs).find())
                out += vio(3, vi, j, 0, 0, 0,
                  s"independent_variable 'value' must not be a string range (use 'low' and 'high' to represent a range): '$rs' in 'independent_variables[$vi].values[$j].value' (expected: {'type': 'number or string (not a range)'})")
            }
            val parseable = x.getBoolean(xHasLow) && x.getBoolean(xHasHigh) &&
              !x.isNullAt(xLowNum) && !x.isNullAt(xHighNum)
            if (parseable) {
              val lo = x.getDouble(xLowNum); val hi = x.getDouble(xHighNum)
              val loInf = math.abs(lo) == Double.PositiveInfinity
              val hiInf = math.abs(hi) == Double.PositiveInfinity
              if (loInf && hiInf)
                out += vio(3, vi, j, 1, 0, 0,
                  s"independent_variable 'low' and 'high' must not both have infinite values: '${str(x.getUTF8String(xLowRaw))}' and '${str(x.getUTF8String(xHighRaw))}' in 'independent_variables[$vi].values[$j]'")
              if (loInf && !hiInf) {
                if (under == null) under = scala.collection.mutable.ArrayBuffer.empty
                val id = fmt("(%s, %.4e)", str(x.getUTF8String(xLowRaw)),
                  java.lang.Double.valueOf(hi))
                if (!under.contains(id)) under += id
              }
              if (hiInf && !loInf) {
                if (over == null) over = scala.collection.mutable.ArrayBuffer.empty
                val id = fmt("(%.4e, %s)", java.lang.Double.valueOf(lo),
                  str(x.getUTF8String(xHighRaw)))
                if (!over.contains(id)) over += id
              }
            }
          }
          j += 1
        }
        if (under != null && under.length > 1)
          out += vio(3, vi, nVals, 0, 0, 0,
            s"independent_variable must not have more than one underflow bin: ${under.mkString(", ")} in 'independent_variables[$vi].values[${nVals - 1}]'")
        if (over != null && over.length > 1)
          out += vio(3, vi, nVals, 1, 0, 0,
            s"independent_variable must not have more than one overflow bin: ${over.mkString(", ")} in 'independent_variables[$vi].values[${nVals - 1}]'")
        vi += 1
      }
    }

    // ---- exception apology + sort -------------------------------------
    val exceptionOccurred =
      if (!cfg.majorGt0) false
      else semAborted ||
        (hasDep && !semAborted && indepBad) ||
        (lengthRan && !hasIndep) ||
        (cfg.ge110 && phase23Gate && firstBadIndep != 0)
    if (exceptionOccurred && out.isEmpty) {
      val file = doc.getUTF8String(oFile)
      val msgRow = if (file == null)
        InternalRow(4, 0, 0, 0, 0, 0, null) // concat(null file) -> null message
      else vio(4, 0, 0, 0, 0, 0,
        s"An unexpected error occurred whilst validating $file. Please contact info@hepdata.net if this issue recurs.")
      return new GenericArrayData(Array[Any](msgRow))
    }
    out.sortedArrayData()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("hepDocKernel", this)
    nullSafeCodeGen(ctx, ev, (d, e) => s"${ev.value} = $self.compute($d, $e);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HepDocKernel =
    copy(left = newLeft, right = newRight)
}

object HepDocKernel {

  /** Version-gated config: flags mirror HepDataRules' pre110/v1 gating and
    * reprs come from SchemaReprs.forVersion (byte-identical to the Column
    * tree's embedded literals). */
  final case class Cfg(
      majorGt0: Boolean, ge110: Boolean, pre110: Boolean,
      indepArrayRepr: String, depArrayRepr: String,
      indepItemRepr: String,
      indepLowRepr: String, indepHighRepr: String, indepValueItemRepr: String,
      depValueItemRepr: String, depItemAddRepr: String,
      indepHeaderRepr: String, indepHeaderNameRepr: String,
      indepHeaderUnitsRepr: String,
      depHeaderRepr: String, depHeaderNameRepr: String,
      depHeaderUnitsRepr: String,
      depQualifiersRepr: String, depQualifierItemRepr: String,
      depQualifierNameRepr: String, depQualifierValueRepr: String,
      depQualifierUnitsRepr: String)

  def cfgFor(version: SchemaVersion): Cfg = {
    val pre110 = version < SchemaVersion.V110
    val reprs = SchemaReprs.forVersion(version)
    Cfg(
      majorGt0 = version.major > 0, ge110 = !pre110, pre110 = pre110,
      indepArrayRepr = reprs.indepArray, depArrayRepr = reprs.depArray,
      indepItemRepr = if (pre110) reprs.indepItem else HepDataRules.IndepItemRepr,
      indepLowRepr = reprs.indepLow, indepHighRepr = reprs.indepHigh,
      indepValueItemRepr = reprs.indepValueItem,
      depValueItemRepr =
        if (pre110) reprs.depValueItem else HepDataRules.DepValueItemRepr,
      depItemAddRepr = if (pre110) reprs.depItem else HepDataRules.DepItemRepr,
      indepHeaderRepr = reprs.indepHeader,
      indepHeaderNameRepr = reprs.indepHeaderName,
      indepHeaderUnitsRepr = reprs.indepHeaderUnits,
      depHeaderRepr = reprs.depHeader,
      depHeaderNameRepr = reprs.depHeaderName,
      depHeaderUnitsRepr = reprs.depHeaderUnits,
      depQualifiersRepr = reprs.depQualifiers,
      depQualifierItemRepr = reprs.depQualifierItem,
      depQualifierNameRepr = reprs.depQualifierName,
      depQualifierValueRepr = reprs.depQualifierValue,
      depQualifierUnitsRepr = reprs.depQualifierUnits)
  }

  private def vio(phase: Int, k1: Int, k2: Int, k3: Int, k4: Int, k5: Int,
      message: String): InternalRow =
    InternalRow(phase, k1, k2, k3, k4, k5, UTF8String.fromString(message))

  /** format_string parity: Spark's FormatString formats with Locale.US. */
  private def fmt(f: String, args: AnyRef*): String =
    String.format(java.util.Locale.US, f, args: _*)

  /** Growable row buffer with the array_sort struct ordering: (phase,
    * k1..k5) ascending then message by UTF8String bytes, nulls first —
    * exactly Spark's interpreted ordering for this struct type. */
  private final class Buf {
    private val rows = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    def +=(r: InternalRow): Unit = rows += r
    def ++=(r: Iterable[InternalRow]): Unit = rows ++= r
    def isEmpty: Boolean = rows.isEmpty
    def sortedArrayData(): ArrayData = {
      val arr = rows.toArray
      java.util.Arrays.sort(arr, cmp)
      new GenericArrayData(arr.asInstanceOf[Array[Any]])
    }
  }

  private def copyVios(out: Buf, arr: ArrayData): Unit = {
    if (arr == null) return
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      // copy: elements may be Unsafe views into a reused buffer
      out += arr.getStruct(i, 7).copy()
      i += 1
    }
  }

  private val cmp: java.util.Comparator[InternalRow] =
    (x: InternalRow, y: InternalRow) => {
      var c = Integer.compare(x.getInt(0), y.getInt(0))
      var f = 1
      while (c == 0 && f <= 5) {
        c = Integer.compare(x.getInt(f), y.getInt(f)); f += 1
      }
      if (c != 0) c
      else {
        val mx = if (x.isNullAt(6)) null else x.getUTF8String(6)
        val my = if (y.isNullAt(6)) null else y.getUTF8String(6)
        if (mx == null && my == null) 0
        else if (mx == null) -1
        else if (my == null) 1
        else mx.compareTo(my)
      }
    }
}
