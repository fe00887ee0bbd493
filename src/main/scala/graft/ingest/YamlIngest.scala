package graft.ingest

import graft.hep._

/** A YAML shape the nested row model cannot carry (e.g.
  * `independent_variables: 5` — present but not an array). The model covers
  * everything the reference's test suite and the five differential corpora
  * exercise; anything outside fails LOUDLY here so a pipeline can route the
  * file to a quarantine side-output instead of silently under-validating. */
final class UnrepresentableShape(val what: String)
  extends Exception(s"YAML shape not representable in the row model: $what")

/** Parsed-YAML ([[PyVal]]) → validation row model (HepRow / SubDoc): the
  * executor-side translation of what the reference does between yaml.load
  * and its checks (ref: data_file_validator.py:100-150,
  * submission_file_validator.py:60-120). Field-for-field the same mapping
  * the differential-corpus generators compute Python-side
  * (tools/gen_datafile_corpus.py doc_to_row, tools/gen_submission_corpus.py
  * doc_to_row) — the ingestion conformance specs replay both against the
  * same corpus.
  */
object YamlIngest {

  // ---- Python-shape helpers ----------------------------------------------

  /** is_scalar: isinstance (str,int,float) and not bool. */
  private def isScalar(v: PyVal): Boolean = v match {
    case _: PStr | _: PInt | _: PFloat => true
    case _ => false
  }

  private def isNum(v: PyVal): Boolean = v match {
    case _: PInt | _: PFloat => true
    case _ => false
  }

  /** Python float(v) → Some, None where float() raises (the reference's
    * `except: continue` paths). float(True) IS 1.0 — bools parse. */
  private def numOrNone(v: PyVal): Option[Double] = v match {
    case PInt(n) => Some(n.toDouble)
    case PFloat(d) => Some(d)
    case PBool(b) => Some(if (b) 1.0 else 0.0)
    case PStr(s) =>
      // Python float() allows single underscores BETWEEN digits
      val t0 = s.trim
      val t = if (t0.contains('_')) {
        if (t0.matches(".*(^_|_$|_[^0-9]|[^0-9]_).*")) return None
        t0.replace("_", "")
      } else t0
      if (t.nonEmpty && PyFloat.Pat.matcher(t).matches()) Some(PyFloat.parse(t))
      else None
    case _ => None
  }

  private def asMap(v: PyVal, what: String): PMap = v match {
    case m: PMap => m
    case other => throw new UnrepresentableShape(s"$what: ${other.pyRepr}")
  }

  private def asSeq(v: PyVal, what: String): Vector[PyVal] = v match {
    case PSeq(xs) => xs
    case other => throw new UnrepresentableShape(s"$what: ${other.pyRepr}")
  }

  /** sorted(set(keys) - known) over the Python-str key renderings. */
  private def extraKeys(m: PMap, known: Set[String]): Seq[String] =
    m.keyStrings.distinct.filterNot(known).sorted

  // ---- data-file translation (gen_datafile_corpus.py mirrors) ------------

  private def indepVal(v: PyVal): HepIndepVal = {
    val m = asMap(v, "independent value mapping")
    val value = m.get("value")
    val low = m.get("low")
    val high = m.get("high")
    HepIndepVal(
      hasValue = value.isDefined,
      valueRaw = value.map(_.pyStr).orNull,
      valueIsString = value.exists(_.isInstanceOf[PStr]),
      hasLow = low.isDefined,
      lowRaw = low.map(_.pyStr).orNull,
      lowIsNum = low.exists(isNum),
      lowNum = low.flatMap(numOrNone),
      hasHigh = high.isDefined,
      highRaw = high.map(_.pyStr).orNull,
      highIsNum = high.exists(isNum),
      highNum = high.flatMap(numOrNone),
      instanceRepr = m.pyRepr,
      extraKeys = extraKeys(m, Set("value", "low", "high")))
  }

  private def errItem(v: PyVal): HepErr = {
    val e = asMap(v, "error mapping")
    val sym = e.get("symerror")
    val asym = e.get("asymerror")
    val label = e.get("label")
    val symBad = sym.exists(!isScalar(_))
    val asymBad = asym.exists(!_.isInstanceOf[PMap])
    val asymMap = asym.collect { case m: PMap => m }
    val plus = asymMap.flatMap(_.get("plus"))
    val minus = asymMap.flatMap(_.get("minus"))
    def rawOf(x: PyVal): String =
      if (isScalar(x) || x.isInstanceOf[PBool]) x.pyStr else null
    HepErr(
      hasSym = sym.isDefined,
      symRaw = sym.map(rawOf).orNull,
      hasAsym = asym.isDefined,
      plusRaw = plus.map(rawOf).orNull,
      minusRaw = minus.map(rawOf).orNull,
      hasLabel = label.isDefined,
      labelRaw = label.map(_.pyStr).orNull,
      labelIsString = label.exists(_.isInstanceOf[PStr]),
      extraKeys = extraKeys(e, Set("symerror", "asymerror", "label")),
      hasPlus = plus.isDefined,
      hasMinus = minus.isDefined,
      asymExtraKeys = asymMap.map(extraKeys(_, Set("plus", "minus"))).getOrElse(Nil),
      instanceRepr = e.pyRepr,
      symRepr = if (symBad) sym.get.pyRepr else null,
      asymRepr = if (asymBad) asym.get.pyRepr else null,
      plusRepr = plus.filterNot(isScalar).map(_.pyRepr).orNull,
      minusRepr = minus.filterNot(isScalar).map(_.pyRepr).orNull)
  }

  private def depVal(v: PyVal): HepDepVal = {
    val m = asMap(v, "dependent value mapping")
    val value = m.get("value")
    val errors = m.get("errors")
    HepDepVal(
      hasValue = value.isDefined,
      valueRaw = value.map(_.pyStr).orNull,
      hasErrors = errors.isDefined,
      errors = errors.map(asSeq(_, "errors").map(errItem)).getOrElse(Vector.empty),
      extraKeys = extraKeys(m, Set("value", "errors")))
  }

  private def headerDetail(v: PMap): HepHeader = v.get("header") match {
    case None => HepHeader() // absent: benign defaults, hasHeader=false gates
    case Some(h: PMap) =>
      val name = h.get("name")
      val units = h.get("units")
      HepHeader(isObj = true, repr = null,
        hasName = name.isDefined,
        nameRepr = name.filterNot(_.isInstanceOf[PStr]).map(_.pyRepr).orNull,
        hasUnits = units.isDefined,
        unitsRepr = units.filterNot(_.isInstanceOf[PStr]).map(_.pyRepr).orNull,
        extraKeys = extraKeys(h, Set("name", "units")))
    case Some(bad) => // present but not a mapping (None included): type error
      HepHeader(isObj = false, repr = bad.pyRepr,
        hasName = true, nameRepr = null, hasUnits = false, unitsRepr = null,
        extraKeys = Nil)
  }

  /** Python's `x or default` / .get() None propagation: a key present
    * with a null value stays null (str() is NOT applied). */
  private def strOrNull(v: PyVal): String =
    if (v == PNone) null else v.pyStr

  private def headerName(v: PMap, dflt: String): String = v.get("header") match {
    case Some(h: PMap) => h.get("name").map(strOrNull).getOrElse(dflt)
    case _ => dflt
  }

  private def qualifierItem(v: PyVal): HepQualifier = {
    val q = asMap(v, "qualifier mapping")
    // bad(key, types): repr when present but not of the allowed types
    // (bools always bad — isinstance(True, int) quirk excluded upstream)
    def bad(key: String, ok: PyVal => Boolean): String =
      q.get(key) match {
        case Some(x) if x.isInstanceOf[PBool] => x.pyRepr
        case Some(x) if !ok(x) => x.pyRepr
        case _ => null
      }
    HepQualifier(
      hasName = q.has("name"),
      nameRepr = bad("name", _.isInstanceOf[PStr]),
      hasValue = q.has("value"),
      valueRepr = bad("value", isScalar),
      hasUnits = q.has("units"),
      unitsRepr = bad("units", _.isInstanceOf[PStr]),
      extraKeys = extraKeys(q, Set("name", "value", "units")))
  }

  private def indepVar(v: PyVal): HepIndepVar = {
    val m = asMap(v, "independent variable")
    val values = m.get("values")
    HepIndepVar(
      headerName = headerName(m, "X"),
      hasValues = values.isDefined,
      values = values.map(asSeq(_, "values").map(indepVal)).getOrElse(Vector.empty),
      hasHeader = m.has("header"),
      extraKeys = extraKeys(m, Set("header", "values")),
      header = headerDetail(m))
  }

  private def depVar(v: PyVal): HepDepVar = {
    val m = asMap(v, "dependent variable")
    val values = m.get("values")
    val quals = m.get("qualifiers")
    HepDepVar(
      headerName = headerName(m, "Y"),
      hasHeader = m.has("header"),
      hasValues = values.isDefined,
      values = values.map(asSeq(_, "values").map(depVal)).getOrElse(Vector.empty),
      extraKeys = extraKeys(m, Set("header", "qualifiers", "values")),
      header = headerDetail(m),
      hasQualifiers = quals.isDefined,
      qualifiersRepr = quals match {
        case Some(x) if !x.isInstanceOf[PSeq] => x.pyRepr
        case _ => null
      },
      qualifiers = quals match {
        case Some(PSeq(xs)) => xs.map(qualifierItem)
        case _ => Vector.empty
      })
  }

  /** One parsed data-file document → HepRow (None → the "No data found"
    * empty row, ref: data_file_validator.py:103-107). */
  def dataRow(file: String, doc: PyVal): HepRow = doc match {
    case PNone => HepModel.emptyRow(file)
    case m: PMap =>
      val indep = m.get("independent_variables")
      val dep = m.get("dependent_variables")
      // present-but-not-array (incl. null): carried as a repr for the
      // jsonschema type error, vars empty (the reference never descends)
      def bad(v: Option[PyVal]): String = v match {
        case Some(x) if !x.isInstanceOf[PSeq] => x.pyRepr
        case _ => null
      }
      HepRow(file, emptyDoc = false,
        hasIndep = indep.isDefined,
        indep = indep.collect { case PSeq(xs) => xs.map(indepVar) }
          .getOrElse(Vector.empty),
        hasDep = dep.isDefined,
        dep = dep.collect { case PSeq(xs) => xs.map(depVar) }
          .getOrElse(Vector.empty),
        indepBadRepr = bad(indep),
        depBadRepr = bad(dep))
    case other =>
      throw new UnrepresentableShape(s"data document root: ${other.pyRepr}")
  }

  /** Raw data-file text → HepRow. Parse errors surface as [[PyYamlError]]. */
  def parseDataFile(file: String, text: String): HepRow =
    dataRow(file, PyYamlParse.load(text, file))

  // ---- submission translation (gen_submission_corpus.py mirrors) ---------

  private val KnownSubKeys = Set("name", "description", "keywords",
    "data_file", "data_license", "related_to_table_dois",
    "related_to_hepdata_records", "additional_resources", "location")

  private def licField(lic: PMap, key: String): LicField =
    lic.get(key) match {
      case None => SubModel.NoLic
      case Some(PNone) => SubModel.NullLic
      case Some(v) => LicField(present = true, isNull = false,
        value = v.pyStr, isString = v.isInstanceOf[PStr])
    }

  private def relItem(v: PyVal): RelItem = v match {
    case PStr(s) => RelItem(s, isString = true, isInt = false, None)
    case _: PBool =>
      throw new UnrepresentableShape(s"related-to item: ${v.pyRepr}")
    case PInt(n) =>
      RelItem(n.toString, isString = false, isInt = true, Some(n.toDouble))
    case PFloat(d) =>
      RelItem(PFloat(d).pyStr, isString = false, isInt = d.isWhole, Some(d))
    case other =>
      throw new UnrepresentableShape(s"related-to item: ${other.pyRepr}")
  }

  private def keywordItem(v: PyVal): SubKeyword = {
    val k = asMap(v, "keyword mapping")
    val name = k.get("name")
    val values = k.get("values")
    SubKeyword(
      hasName = name.isDefined,
      name = name.map(strOrNull).orNull,
      hasValues = values.isDefined,
      values = values.map(asSeq(_, "keyword values")
        .map(x => KwVal(x.pyStr, x.isInstanceOf[PStr]))).getOrElse(Vector.empty),
      extraKeys = extraKeys(k, Set("name", "values")))
  }

  /** One parsed submission.yaml document → SubDoc (None → isEmpty). */
  def subDoc(doc: PyVal): SubDoc = doc match {
    case PNone =>
      SubDoc(isEmpty = true, hasName = false, nameRaw = null,
        nameIsString = false, hasDescription = false, hasKeywords = false,
        keywords = Nil, hasDataFile = false, dataFileRaw = null,
        dataFileIsString = false, hasLicense = false,
        licName = SubModel.NoLic, licUrl = SubModel.NoLic,
        licDesc = SubModel.NoLic, hasDois = false, dois = Nil,
        hasRecids = false, recids = Nil, extraKeys = Nil, licExtraKeys = Nil)
    case m: PMap =>
      val name = m.get("name")
      val dataFile = m.get("data_file")
      // has_license = value is not None (a null data_license key behaves
      // like an absent one, ref generator doc_to_row)
      val lic = m.get("data_license") match {
        case Some(l: PMap) => Some(l)
        case Some(PNone) | None => None
        case Some(bad) =>
          throw new UnrepresentableShape(s"data_license: ${bad.pyRepr}")
      }
      val dois = m.get("related_to_table_dois")
      val recids = m.get("related_to_hepdata_records")
      SubDoc(
        isEmpty = false,
        hasName = name.isDefined,
        nameRaw = name.map(_.pyStr).orNull,
        nameIsString = name.exists(_.isInstanceOf[PStr]),
        hasDescription = m.has("description"),
        hasKeywords = m.has("keywords"),
        keywords = m.get("keywords")
          .map(asSeq(_, "keywords").map(keywordItem)).getOrElse(Vector.empty),
        hasDataFile = dataFile.isDefined,
        dataFileRaw = dataFile.map(_.pyStr).orNull,
        dataFileIsString = dataFile.exists(_.isInstanceOf[PStr]),
        hasLicense = lic.isDefined,
        licName = lic.map(licField(_, "name")).getOrElse(SubModel.NoLic),
        licUrl = lic.map(licField(_, "url")).getOrElse(SubModel.NoLic),
        licDesc = lic.map(licField(_, "description")).getOrElse(SubModel.NoLic),
        hasDois = dois.isDefined,
        dois = dois.map(asSeq(_, "related_to_table_dois").map(relItem))
          .getOrElse(Vector.empty),
        hasRecids = recids.isDefined,
        recids = recids.map(asSeq(_, "related_to_hepdata_records").map(relItem))
          .getOrElse(Vector.empty),
        extraKeys = extraKeys(m, KnownSubKeys),
        licExtraKeys = lic.map(extraKeys(_, Set("name", "url", "description")))
          .getOrElse(Nil))
    case other =>
      throw new UnrepresentableShape(s"submission document: ${other.pyRepr}")
  }

  /** Raw submission.yaml text → SubFile (multi-doc stream). */
  def parseSubmission(file: String, text: String): SubFile =
    SubFile(file, PyYamlParse.loadAll(text, file).map(subDoc))

  // ---- single-YAML split (ref full_submission_validator.py:252-261) ------

  final case class SingleYamlTables(
      sub: SubFile,
      docs: Vector[(Int, String, Seq[String])], // (docIdx, name, resources)
      hepRows: Vector[HepRow])

  /** The reference's _create_data_files, logically: each doc with a `name`
    * gets `data_file` = derived name (' '→'_', '/'→'-', + .yaml) and its
    * inline independent/dependent_variables split into a HepRow keyed by
    * that derived name. The SubFile reflects the POST-mutation docs — the
    * state the reference's SubmissionFileValidator sees. */
  def splitSingleYaml(file: String, text: String): SingleYamlTables = {
    val parsed = PyYamlParse.loadAll(text, file)
    val dataKeys = Set("independent_variables", "dependent_variables")
    val rows = Vector.newBuilder[HepRow]
    val mutated = parsed.map {
      case m: PMap if m.has("name") =>
        val derived = m.get("name").get match {
          case PStr(s) => s.replace(" ", "_").replace("/", "-") + ".yaml"
          case bad => // reference crashes on non-str names (str.replace)
            throw new UnrepresentableShape(s"single-YAML table name: ${bad.pyRepr}")
        }
        // the reference's derived file carries BOTH keys, None when the
        // doc lacks one (doc.pop(key, None)) — a missing key therefore
        // surfaces as "None is not of type 'array'", not as required
        rows += dataRow(derived, PMap(Vector(
          (PStr("independent_variables"): PyVal) ->
            m.get("independent_variables").getOrElse(PNone),
          (PStr("dependent_variables"): PyVal) ->
            m.get("dependent_variables").getOrElse(PNone))))
        // doc['data_file'] = derived: REPLACE any existing value in place
        // (dict assignment), then drop the inline data keys
        PMap(m.updated("data_file", PStr(derived)).entries
          .filterNot { case (k, _) => k match {
            case PStr(s) => dataKeys(s); case _ => false } })
      case other => other
    }
    val docs = mutated.zipWithIndex.map {
      case (m: PMap, i) =>
        val res = m.get("additional_resources") match {
          case Some(PSeq(xs)) => xs.collect {
            case r: PMap => r.get("location").map(_.pyStr).getOrElse("")
          }
          case _ => Vector.empty
        }
        (i, m.get("name").map(strOrNull).orNull, res: Seq[String])
      case (_, i) => (i, null: String, Nil: Seq[String])
    }
    SingleYamlTables(SubFile(file, mutated.map(subDoc)), docs, rows.result())
  }

  // ---- auxiliary doc-table fields (full-submission orchestration) --------

  /** (docIdx, name, hasDataFile, dataFile, resources) for each parsed doc,
    * skipping empties and the additional-info first doc — the shape
    * FullSubmission.checks consumes (mirrors gen_fullsubmission_corpus
    * tables_for). `dataSchema` carried when the doc has one (ref
    * full_submission_validator.py:331-347). */
  final case class DocMeta(docIdx: Int, name: String, hasDataFile: Boolean,
      dataFile: String, resources: Seq[String], dataSchema: Option[String])

  def docMeta(parsedDocs: Vector[PyVal]): Vector[DocMeta] =
    parsedDocs.zipWithIndex.flatMap {
      case (PNone, _) => None
      case (m: PMap, d) =>
        if (d == 0 && !m.has("data_file")) None
        else {
          val res = m.get("additional_resources") match {
            case Some(PSeq(xs)) => xs.collect {
              case r: PMap => r.get("location").map(_.pyStr).getOrElse("")
            }
            case _ => Vector.empty
          }
          Some(DocMeta(d,
            m.get("name").map(strOrNull).orNull,
            m.has("data_file"),
            m.get("data_file").map(strOrNull).orNull,
            res,
            m.get("data_schema").map(_.pyStr)))
        }
      case (other, _) =>
        throw new UnrepresentableShape(s"submission document: ${other.pyRepr}")
    }
}

/** Python float() literal acceptance + parse, shared with the rules'
  * convert_to_float gate (ErrorValuesKernel has its own private copy on
  * the codegen path). */
private[ingest] object PyFloat {
  val Pat: java.util.regex.Pattern = java.util.regex.Pattern.compile(
    "^[+-]?((\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?|[iI][nN][fF]([iI][nN][iI][tT][yY])?|[nN][aA][nN])$")

  def parse(t: String): Double = {
    val l = t.toLowerCase
    val (sign, body) =
      if (l.startsWith("-")) (-1.0, l.substring(1))
      else if (l.startsWith("+")) (1.0, l.substring(1)) else (1.0, l)
    if (body == "inf" || body == "infinity") sign * Double.PositiveInfinity
    else if (body == "nan") Double.NaN
    else java.lang.Double.parseDouble(t)
  }
}
