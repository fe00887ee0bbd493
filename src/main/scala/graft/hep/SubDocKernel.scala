package graft.hep

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass replay of SubmissionRules' fused per-file projection —
  * per-doc schema checks, the sequential cmenergies/duplicate gating and
  * the file-level checks that the pure-Column tree
  * ([[SubmissionRules.packedViolationsSpec]]) expresses with nested
  * interpreted HigherOrderFunctions. On the fixture-literal driver queries
  * the optimizer constant-folds that tree DRIVER-SIDE on every run
  * (ConvertToLocalRelation evaluates the interpreted HOFs single-threaded:
  * ~0.85 s/run of sub_verdicts at 10 files), and at scale the same
  * interpreted cost is paid per row on executors. Byte-exact equivalence
  * vs the Column spec is pinned by SubKernelEquivSpec (fixtures + the
  * 240-case reference corpus, all schema versions).
  *
  * Null conventions mirror the Column tree exactly: a condition that
  * evaluates to SQL NULL skips the row; a NULL operand inside a message
  * concat emits the row with a NULL message (never happens on real data,
  * but equivalence is checked structurally).
  */
case class SubDocKernel(child: Expression, cfg: SubDocKernel.Cfg)
    extends UnaryExpression {

  override def prettyName: String = "sub_file_rules"
  override def dataType: DataType =
    ArrayType(SubDocKernel.vioType, containsNull = false)
  override def nullable: Boolean = true

  // ---- ordinal resolution ---------------------------------------------
  @transient private lazy val fileSt = child.dataType.asInstanceOf[StructType]
  @transient private lazy val oFile = fileSt.fieldIndex("file")
  @transient private lazy val oDocs = fileSt.fieldIndex("docs")
  @transient private lazy val dSt = fileSt(oDocs).dataType
    .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  @transient private lazy val oIsEmpty = dSt.fieldIndex("isEmpty")
  @transient private lazy val oHasName = dSt.fieldIndex("hasName")
  @transient private lazy val oNameRaw = dSt.fieldIndex("nameRaw")
  @transient private lazy val oNameIsString = dSt.fieldIndex("nameIsString")
  @transient private lazy val oHasDescription = dSt.fieldIndex("hasDescription")
  @transient private lazy val oHasKeywords = dSt.fieldIndex("hasKeywords")
  @transient private lazy val oKeywords = dSt.fieldIndex("keywords")
  @transient private lazy val oHasDataFile = dSt.fieldIndex("hasDataFile")
  @transient private lazy val oDataFileRaw = dSt.fieldIndex("dataFileRaw")
  @transient private lazy val oDataFileIsString = dSt.fieldIndex("dataFileIsString")
  @transient private lazy val oHasLicense = dSt.fieldIndex("hasLicense")
  @transient private lazy val oLicName = dSt.fieldIndex("licName")
  @transient private lazy val oLicUrl = dSt.fieldIndex("licUrl")
  @transient private lazy val oLicDesc = dSt.fieldIndex("licDesc")
  @transient private lazy val oHasDois = dSt.fieldIndex("hasDois")
  @transient private lazy val oDois = dSt.fieldIndex("dois")
  @transient private lazy val oHasRecids = dSt.fieldIndex("hasRecids")
  @transient private lazy val oRecids = dSt.fieldIndex("recids")
  @transient private lazy val oExtraKeys = dSt.fieldIndex("extraKeys")
  @transient private lazy val oLicExtraKeys = dSt.fieldIndex("licExtraKeys")

  @transient private lazy val kSt = dSt(oKeywords).dataType
    .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  @transient private lazy val kHasName = kSt.fieldIndex("hasName")
  @transient private lazy val kName = kSt.fieldIndex("name")
  @transient private lazy val kHasValues = kSt.fieldIndex("hasValues")
  @transient private lazy val kValues = kSt.fieldIndex("values")
  @transient private lazy val kExtraKeys = kSt.fieldIndex("extraKeys")
  @transient private lazy val vSt = kSt(kValues).dataType
    .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  @transient private lazy val vRaw = vSt.fieldIndex("raw")
  @transient private lazy val vIsString = vSt.fieldIndex("isString")

  @transient private lazy val lSt = dSt(oLicName).dataType.asInstanceOf[StructType]
  @transient private lazy val lPresent = lSt.fieldIndex("present")
  @transient private lazy val lIsNull = lSt.fieldIndex("isNull")
  @transient private lazy val lValue = lSt.fieldIndex("value")
  @transient private lazy val lIsString = lSt.fieldIndex("isString")

  @transient private lazy val rSt = dSt(oDois).dataType
    .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  @transient private lazy val rRaw = rSt.fieldIndex("raw")
  @transient private lazy val rIsString = rSt.fieldIndex("isString")
  @transient private lazy val rIsInt = rSt.fieldIndex("isInt")
  @transient private lazy val rNum = rSt.fieldIndex("num")

  @transient private lazy val doiPat =
    java.util.regex.Pattern.compile(SubmissionRules.DoiPattern)
  @transient private lazy val cmeRangePat =
    java.util.regex.Pattern.compile(SubmissionRules.CmeRangeRe)

  import SubDocKernel._
  import SubmissionRules.{KwItemRepr, KwValRepr, NameRepr, LicStrRepr, StrRepr,
    LicObjRepr, DoiItemRepr, DoisRepr, RecItemRepr, RecidsRepr, CmeRepr,
    DoiPatternRepr}

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[InternalRow])

  private def kwEnumSet = SubDocKernel.KwEnum

  /** Spark length() counts code points (UTF8String.numChars). */
  private def len(u: UTF8String): Int = u.numChars()

  private def addPropsText(extras: ArrayData): String = {
    val n = extras.numElements()
    val ks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { ks(i) = extras.getUTF8String(i); i += 1 }
    java.util.Arrays.sort(ks, (a: UTF8String, b: UTF8String) => a.compareTo(b))
    val verb = if (n == 1) "was" else "were"
    s"Additional properties are not allowed (${ks.map(k => s"'$k'").mkString(", ")} $verb unexpected)"
  }

  /** Column concat semantics: any null part -> null message (the row is
    * still emitted by the caller). */
  private def cat(parts: Any*): UTF8String = {
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < parts.length) {
      parts(i) match {
        case null => return null
        case u: UTF8String => sb.append(u.toString)
        case s: String => sb.append(s)
        case x => sb.append(x.toString)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  private def vioM(k0: Int, k1: Int, k2: Int, k3: Int, k4: Int, k5: Int,
      message: UTF8String): InternalRow =
    InternalRow(k0, k1, k2, k3, k4, k5, message)

  /** pyRepr of a KwVal/RelItem scalar. */
  private def pyRepr(raw: UTF8String, isString: Boolean): String =
    if (raw == null) "None"
    else if (isString) s"'$raw'"
    else raw.toString

  private def listRepr(items: ArrayData, st: StructType, rawOrd: Int,
      isStrOrd: Int): String = {
    val n = items.numElements()
    val sb = new java.lang.StringBuilder("[")
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(", ")
      val x = items.getStruct(i, st.size)
      sb.append(pyRepr(x.getUTF8String(rawOrd), x.getBoolean(isStrOrd)))
      i += 1
    }
    sb.append("]").toString
  }

  private def hasDup(items: ArrayData, st: StructType, rawOrd: Int,
      isStrOrd: Int): Boolean = {
    val n = items.numElements()
    val seen = new java.util.HashSet[(String, Boolean)]()
    var i = 0
    while (i < n) {
      val x = items.getStruct(i, st.size)
      val raw = x.getUTF8String(rawOrd)
      if (!seen.add((if (raw == null) null else raw.toString,
          x.getBoolean(isStrOrd)))) return true
      i += 1
    }
    false
  }

  /** pyFloatOk: PyFloatRe on the space-trimmed raw (the try_cast guard in
    * the Column spelling never rejects a regex-matching literal). */
  private def pyFloatOk(raw: UTF8String): Boolean = {
    val t = raw.toString.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
    PyFloatPat.matcher(t).find()
  }

  /** Public so generated code can call it through the reference object. */
  def compute(row: InternalRow): ArrayData = {
    val docs = row.getArray(oDocs)
    if (docs == null) return null
    val nDocs = docs.numElements()
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]

    def isTableDoc(doc: InternalRow, d: Int): Boolean =
      !doc.getBoolean(oIsEmpty) && (d > 0 || doc.getBoolean(oHasDataFile))

    // ---- phase 0: per-doc schema errors, tracking first failing doc ----
    var firstErrDoc = 0 // 1-based; 0 = none
    var d = 0
    while (d < nDocs) {
      val doc = docs.getStruct(d, dSt.size)
      if (doc == null) return null
      val before = out.length
      if (!doc.getBoolean(oIsEmpty)) {
        if (isTableDoc(doc, d)) {
          // name (prop 0)
          if (doc.getBoolean(oHasName) && !doc.getBoolean(oNameIsString))
            out += vioM(d, 0, 0, 0, 0, 0,
              cat(doc.getUTF8String(oNameRaw),
                s" is not of type 'string' in 'name' (expected: $NameRepr)"))
          if (doc.getBoolean(oHasName) && doc.getBoolean(oNameIsString) &&
              !doc.isNullAt(oNameRaw) &&
              len(doc.getUTF8String(oNameRaw)) > 64)
            out += vioM(d, 0, 0, 0, 1, 0,
              cat("'", doc.getUTF8String(oNameRaw),
                s"' is too long in 'name' (expected: $NameRepr)"))
          // keywords (prop 3)
          val kws = doc.getArray(oKeywords)
          val nK = if (kws == null) 0 else kws.numElements()
          var i = 0
          while (i < nK) {
            val k = kws.getStruct(i, kSt.size)
            if (k != null) {
              if (cfg.majorGt0 && k.getBoolean(kHasName) && !k.isNullAt(kName)) {
                val nm = k.getUTF8String(kName).toString
                if (!kwEnumSet.contains(nm))
                  out += vioM(d, 0, 3, i, 0, 0,
                    cat("'", nm,
                      s"' is not one of ['cmenergies', 'observables', 'reactions', 'phrases'] in 'keywords[$i].name' (expected: {'type': 'string', 'maxLength': 128, 'enum': ['cmenergies', 'observables', 'reactions', 'phrases']})"))
              }
              val vals = k.getArray(kValues)
              val nV = if (vals == null) 0 else vals.numElements()
              var j = 0
              while (j < nV) {
                val v = vals.getStruct(j, vSt.size)
                if (v != null && v.getBoolean(vIsString) && !v.isNullAt(vRaw) &&
                    len(v.getUTF8String(vRaw)) > 128)
                  out += vioM(d, 0, 3, i, 1, j,
                    cat("'", v.getUTF8String(vRaw),
                      s"' is too long in 'keywords[$i].values[$j]' (expected: $KwValRepr)"))
                j += 1
              }
              if (!k.getBoolean(kHasName))
                out += vioM(d, 0, 3, i, 90, 0,
                  cat(s"'name' is a required property in 'keywords[$i]' (expected: $KwItemRepr)"))
              if (!k.getBoolean(kHasValues))
                out += vioM(d, 0, 3, i, 90, 1,
                  cat(s"'values' is a required property in 'keywords[$i]' (expected: $KwItemRepr)"))
              val ex = k.getArray(kExtraKeys)
              if (ex != null && ex.numElements() > 0)
                out += vioM(d, 0, 3, i, 95, 0,
                  cat(addPropsText(ex),
                    s" in 'keywords[$i]' (expected: $KwItemRepr)"))
            }
            i += 1
          }
          // data_file (prop 4)
          if (doc.getBoolean(oHasDataFile) && !doc.getBoolean(oDataFileIsString))
            out += vioM(d, 0, 4, 0, 0, 0,
              cat(doc.getUTF8String(oDataFileRaw),
                s" is not of type 'string' in 'data_file' (expected: $StrRepr)"))
          // data_license (prop 6)
          val hasLic = doc.getBoolean(oHasLicense)
          def licMember(ord: Int, idx: Int, field: String, repr: String,
              maxLen: Int): Unit = {
            val f = doc.getStruct(ord, lSt.size)
            if (f == null) return
            val inLic = hasLic && f.getBoolean(lPresent)
            if (inLic && f.getBoolean(lIsNull))
              out += vioM(d, 0, 6, idx, 0, 0,
                cat(s"None is not of type 'string' in 'data_license.$field' (expected: $repr)"))
            if (inLic && !f.getBoolean(lIsNull) && !f.getBoolean(lIsString))
              out += vioM(d, 0, 6, idx, 0, 1,
                cat(f.getUTF8String(lValue),
                  s" is not of type 'string' in 'data_license.$field' (expected: $repr)"))
            if (maxLen > 0 && inLic && !f.getBoolean(lIsNull) &&
                f.getBoolean(lIsString) && !f.isNullAt(lValue) &&
                len(f.getUTF8String(lValue)) > maxLen)
              out += vioM(d, 0, 6, idx, 1, 0,
                cat("'", f.getUTF8String(lValue),
                  s"' is too long in 'data_license.$field' (expected: $repr)"))
          }
          licMember(oLicName, 0, "name", LicStrRepr, 256)
          licMember(oLicUrl, 1, "url", LicStrRepr, 256)
          licMember(oLicDesc, 2, "description", StrRepr, -1)
          if (hasLic) {
            val ln = doc.getStruct(oLicName, lSt.size)
            if (ln != null && !ln.getBoolean(lPresent))
              out += vioM(d, 0, 6, 90, 0, 0,
                cat(s"'name' is a required property in 'data_license' (expected: $LicObjRepr)"))
            val lu = doc.getStruct(oLicUrl, lSt.size)
            if (lu != null && !lu.getBoolean(lPresent))
              out += vioM(d, 0, 6, 90, 1, 0,
                cat(s"'url' is a required property in 'data_license' (expected: $LicObjRepr)"))
            val lex = doc.getArray(oLicExtraKeys)
            if (lex != null && lex.numElements() > 0)
              out += vioM(d, 0, 6, 95, 0, 0,
                cat(addPropsText(lex),
                  s" in 'data_license' (expected: $LicObjRepr)"))
          }
          // related_to_table_dois (prop 9)
          val dois = doc.getArray(oDois)
          if (doc.getBoolean(oHasDois) && dois != null &&
              hasDup(dois, rSt, rRaw, rIsString))
            out += vioM(d, 0, 9, -1, 0, 0,
              cat(listRepr(dois, rSt, rRaw, rIsString),
                s" has non-unique elements in 'related_to_table_dois' (expected: $DoisRepr)"))
          val nD = if (dois == null) 0 else dois.numElements()
          var j = 0
          while (j < nD) {
            val x = dois.getStruct(j, rSt.size)
            if (x != null) {
              val isStr = x.getBoolean(rIsString)
              if (!isStr)
                out += vioM(d, 0, 9, j, 0, 0,
                  cat(x.getUTF8String(rRaw),
                    s" is not of type 'string' in 'related_to_table_dois[$j]' (expected: $DoiItemRepr)"))
              if (isStr && !x.isNullAt(rRaw)) {
                val raw = x.getUTF8String(rRaw)
                if (len(raw) > 128)
                  out += vioM(d, 0, 9, j, 1, 0,
                    cat("'", raw,
                      s"' is too long in 'related_to_table_dois[$j]' (expected: $DoiItemRepr)"))
                if (!doiPat.matcher(raw.toString).find())
                  out += vioM(d, 0, 9, j, 2, 0,
                    cat("'", raw,
                      s"' does not match $DoiPatternRepr in 'related_to_table_dois[$j]' (expected: $DoiItemRepr)"))
              }
            }
            j += 1
          }
          // top-level required (90) + additionalProperties (95)
          if (!doc.getBoolean(oHasName))
            out += vioM(d, 0, 90, 0, 0, 0, cat("'name' is a required property"))
          if (!doc.getBoolean(oHasDescription))
            out += vioM(d, 0, 90, 1, 0, 0, cat("'description' is a required property"))
          if (!doc.getBoolean(oHasKeywords))
            out += vioM(d, 0, 90, 2, 0, 0, cat("'keywords' is a required property"))
          if (!doc.getBoolean(oHasDataFile))
            out += vioM(d, 0, 90, 3, 0, 0, cat("'data_file' is a required property"))
          val dex = doc.getArray(oExtraKeys)
          if (dex != null && dex.numElements() > 0)
            out += vioM(d, 0, 95, 0, 0, 0, cat(addPropsText(dex)))
        } else {
          // additional-info doc: related_to_hepdata_records (prop 7)
          val recids = doc.getArray(oRecids)
          if (doc.getBoolean(oHasRecids) && recids != null &&
              hasDup(recids, rSt, rRaw, rIsString))
            out += vioM(d, 0, 7, -1, 0, 0,
              cat(listRepr(recids, rSt, rRaw, rIsString),
                s" has non-unique elements in 'related_to_hepdata_records' (expected: $RecidsRepr)"))
          val nR = if (recids == null) 0 else recids.numElements()
          var j = 0
          while (j < nR) {
            val x = recids.getStruct(j, rSt.size)
            if (x != null) {
              if (!x.getBoolean(rIsInt))
                out += vioM(d, 0, 7, j, 0, 0,
                  cat(pyRepr(x.getUTF8String(rRaw), x.getBoolean(rIsString)),
                    s" is not of type 'integer' in 'related_to_hepdata_records[$j]' (expected: $RecItemRepr)"))
              else if (!x.isNullAt(rNum) && x.getDouble(rNum) < 1)
                out += vioM(d, 0, 7, j, 1, 0,
                  cat(x.getUTF8String(rRaw),
                    s" is less than the minimum of 1 in 'related_to_hepdata_records[$j]' (expected: $RecItemRepr)"))
            }
            j += 1
          }
        }
      }
      if (out.length > before && firstErrDoc == 0) firstErrDoc = d + 1
      d += 1
    }
    val schemaCut: Long = if (firstErrDoc == 0) nDocs.toLong + 1 else firstErrDoc.toLong

    // ---- cmenergies (phase 1; first failing value of first failing doc) --
    // cmeFails[d]: (kw, valIdx, raw) or null — null raw values never fail
    // (three-valued && in the Column tree)
    var firstCmeDoc = 0
    var firstCmeKw = 0; var firstCmeRaw: UTF8String = null
    d = 0
    while (d < nDocs && firstCmeDoc == 0) {
      val doc = docs.getStruct(d, dSt.size)
      if (isTableDoc(doc, d)) {
        val kws = doc.getArray(oKeywords)
        val nK = if (kws == null) 0 else kws.numElements()
        var i = 0
        while (i < nK && firstCmeDoc == 0) {
          val k = kws.getStruct(i, kSt.size)
          if (k != null && k.getBoolean(kHasName) && !k.isNullAt(kName) &&
              k.getUTF8String(kName).toString == "cmenergies") {
            val vals = k.getArray(kValues)
            val nV = if (vals == null) 0 else vals.numElements()
            var j = 0
            while (j < nV && firstCmeDoc == 0) {
              val v = vals.getStruct(j, vSt.size)
              if (v != null && !v.isNullAt(vRaw)) {
                val raw = v.getUTF8String(vRaw)
                val ok = pyFloatOk(raw) ||
                  (cmeRangePat.matcher(raw.toString).find() && nV == 1)
                if (!ok) {
                  firstCmeDoc = d + 1; firstCmeKw = i; firstCmeRaw = raw
                }
              }
              j += 1
            }
          }
          i += 1
        }
      }
      d += 1
    }
    val cmeCut: Long = if (firstCmeDoc == 0) nDocs.toLong + 1 else firstCmeDoc.toLong

    if (cfg.majorGt0 && firstCmeDoc > 0 && schemaCut > firstCmeDoc) {
      val rawTxt = if (firstCmeRaw == null) "None" else firstCmeRaw.toString
      out += vioM(firstCmeDoc - 1, 1, 0, 0, 0, 0,
        cat(s"Invalid value (in GeV) for cmenergies: '$rawTxt' in 'keywords[$firstCmeKw].name.cmenergies' (expected: $CmeRepr)"))
    }

    // ---- file-level checks (≥ 1.1.0) -----------------------------------
    if (cfg.ge110) {
      var anyTable = false
      d = 0
      while (d < nDocs && !anyTable) {
        if (isTableDoc(docs.getStruct(d, dSt.size), d)) anyTable = true
        d += 1
      }
      if (!anyTable)
        out += vioM(999999, 0, 0, 0, 0, 0,
          cat("There should be at least one document matching the submission schema."))

      // duplicates among docs processed while the file was error-free
      val cutoff = math.min(schemaCut, cmeCut) - 1
      val names = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
      val files = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
      d = 0
      while (d < nDocs) {
        val doc = docs.getStruct(d, dSt.size)
        if (isTableDoc(doc, d) && d < cutoff) {
          names += doc.getUTF8String(oNameRaw)
          files += doc.getUTF8String(oDataFileRaw)
        }
        d += 1
      }
      def dups(items: scala.collection.mutable.ArrayBuffer[UTF8String],
          k1: Int, label: String): Unit = {
        var i = 0
        while (i < items.length) {
          val x = items(i)
          if (x != null) {
            var prior = 0
            var m = 0
            while (m < i) { if (x == items(m)) prior += 1; m += 1 }
            if (prior == 1)
              out += vioM(999999, k1, 0, i, 0, 0,
                cat(s"Duplicate table $label: ", x))
          }
          i += 1
        }
      }
      dups(names, 1, "name")
      dups(files, 2, "data_file")
    }

    val arr = out.toArray
    java.util.Arrays.sort(arr, cmp)
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("subDocKernel", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): SubDocKernel =
    copy(child = c)
}

object SubDocKernel {
  final case class Cfg(majorGt0: Boolean, ge110: Boolean)

  def cfgFor(version: SchemaVersion): Cfg =
    Cfg(majorGt0 = version.major > 0, ge110 = version >= SchemaVersion.V110)

  private val KwEnum =
    Set("cmenergies", "observables", "reactions", "phrases")

  private[hep] val PyFloatPat = java.util.regex.Pattern.compile(
    "^[+-]?((\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?|[iI][nN][fF]([iI][nN][iI][tT][yY])?|[nN][aA][nN])$")

  val vioType: StructType = StructType(Seq(
    StructField("k0", IntegerType, nullable = false),
    StructField("k1", IntegerType, nullable = false),
    StructField("k2", IntegerType, nullable = false),
    StructField("k3", IntegerType, nullable = false),
    StructField("k4", IntegerType, nullable = false),
    StructField("k5", IntegerType, nullable = false),
    StructField("message", StringType, nullable = true)))

  private val cmp: java.util.Comparator[InternalRow] =
    (x: InternalRow, y: InternalRow) => {
      var c = 0
      var f = 0
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
