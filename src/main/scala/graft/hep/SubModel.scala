package graft.hep

/** Row model for submission.yaml multi-doc streams (one row per FILE, docs as
  * a nested array — all cross-doc gating stays single-row/single-scan).
  * Translation of schemas/1.1.1/{submission,additional_info}_schema.json with
  * raw-token metadata for byte-exact messages (see HepModel for conventions).
  */
final case class KwVal(raw: String, isString: Boolean)

final case class SubKeyword(
    hasName: Boolean, name: String,
    hasValues: Boolean, values: Seq[KwVal],
    extraKeys: Seq[String])

/** A data_license field: `present` = key present; `isNull` = YAML null;
  * `isString` = original YAML type (numbers fail the type check);
  * `value` = Python-str rendering. */
final case class LicField(present: Boolean, isNull: Boolean, value: String,
    isString: Boolean = true)

/** Item of related_to_table_dois / related_to_hepdata_records.
  * `num` is the float-parse result for `minimum` checks. */
final case class RelItem(raw: String, isString: Boolean, isInt: Boolean,
    num: Option[Double])

final case class SubDoc(
    isEmpty: Boolean,
    hasName: Boolean, nameRaw: String, nameIsString: Boolean,
    hasDescription: Boolean,
    hasKeywords: Boolean, keywords: Seq[SubKeyword],
    hasDataFile: Boolean, dataFileRaw: String, dataFileIsString: Boolean,
    hasLicense: Boolean, licName: LicField, licUrl: LicField, licDesc: LicField,
    hasDois: Boolean, dois: Seq[RelItem],
    hasRecids: Boolean, recids: Seq[RelItem],
    extraKeys: Seq[String],
    licExtraKeys: Seq[String] = Nil)

final case class SubFile(file: String, docs: Seq[SubDoc])

object SubModel {
  /** Cached ExpressionEncoder — same rationale as HepModel.hepRowEncoder
    * (implicit derivation re-pays ScalaReflection per query call). */
  lazy val subFileEncoder: org.apache.spark.sql.Encoder[SubFile] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(
      org.apache.spark.sql.Encoders.product[SubFile].asInstanceOf[
        org.apache.spark.sql.catalyst.encoders.AgnosticEncoder[SubFile]])

  val NoLic: LicField = LicField(present = false, isNull = false, value = null)
  val NullLic: LicField = LicField(present = true, isNull = true, value = null)
  def lic(v: String): LicField = LicField(present = true, isNull = false, v)

  def kw(name: String, values: Seq[KwVal], extraKeys: Seq[String] = Nil,
      hasValues: Boolean = true): SubKeyword =
    SubKeyword(hasName = true, name,
      hasValues = hasValues && values != null,
      Option(values).getOrElse(Nil), extraKeys)

  def kvs(s: String): KwVal = KwVal(s, isString = true)
  def kvn(s: String): KwVal = KwVal(s, isString = false)

  def doiStr(s: String): RelItem = RelItem(s, isString = true, isInt = false, None)
  def doiNum(s: String): RelItem = RelItem(s, isString = false, isInt = true,
    Some(s.toDouble))
  def recid(n: Long): RelItem = RelItem(n.toString, isString = false,
    isInt = true, Some(n.toDouble))
  def recidStr(s: String): RelItem = RelItem(s, isString = true, isInt = false, None)

  /** A minimal valid table-metadata doc; override fields per fixture. */
  def tableDoc(name: String, dataFile: String,
      keywords: Seq[SubKeyword] = Seq(kw("reactions", Seq(kvs("P P --> X"))))): SubDoc =
    SubDoc(isEmpty = false,
      hasName = name != null, nameRaw = name, nameIsString = true,
      hasDescription = true,
      hasKeywords = true, keywords = keywords,
      hasDataFile = dataFile != null, dataFileRaw = dataFile,
      dataFileIsString = true,
      hasLicense = false, licName = NoLic, licUrl = NoLic, licDesc = NoLic,
      hasDois = false, dois = Nil, hasRecids = false, recids = Nil,
      extraKeys = Nil)

  /** A minimal additional-info doc (first doc without data_file). */
  def addInfoDoc(recids: Seq[RelItem] = null): SubDoc =
    SubDoc(isEmpty = false,
      hasName = false, nameRaw = null, nameIsString = false,
      hasDescription = false,
      hasKeywords = false, keywords = Nil,
      hasDataFile = false, dataFileRaw = null, dataFileIsString = false,
      hasLicense = false, licName = NoLic, licUrl = NoLic, licDesc = NoLic,
      hasDois = false, dois = Nil,
      hasRecids = recids != null, recids = Option(recids).getOrElse(Nil),
      extraKeys = Nil)

  val emptyDoc: SubDoc = addInfoDoc().copy(isEmpty = true)
}
