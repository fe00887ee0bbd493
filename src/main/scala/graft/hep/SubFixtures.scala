package graft.hep

import SubModel._

/** Translations of the reference submission.yaml fixture corpus
  * (/root/reference/testsuite/test_data) into [[SubFile]] rows. */
object SubFixtures {

  private def cmeKw(v: KwVal) = kw("cmenergies", Seq(v))
  private val reactions = kw("reactions", Seq(kvs("P P --> Z0 Z0 X")))
  private val observables = kw("observables", Seq(kvs("SIG")))

  /** invalid_submission.yaml — keywords[0] missing 'values' + extra 'value',
    * numeric data_file (test_submission_validator.py:168-170) */
  val invalidSubmission: SubFile = SubFile("invalid_submission.yaml", Seq(
    tableDoc("Table 3", null,
      keywords = Seq(
        kw("reactions", null, extraKeys = Seq("value"), hasValues = false),
        observables, cmeKw(kvn("7000"))))
      .copy(hasDataFile = true, dataFileRaw = "12321", dataFileIsString = false)))

  /** invalid_submission_license.yaml — null license fields
    * (test_submission_validator.py:186-188) */
  val invalidLicense: SubFile = SubFile("invalid_submission_license.yaml", Seq(
    addInfoDoc(),
    tableDoc("Table 1", "data1.yaml",
      keywords = Seq(reactions, observables, cmeKw(kvn("7000"))))
      .copy(hasLicense = true, licName = NullLic, licUrl = NullLic,
        licDesc = NullLic),
    tableDoc("Table 2", "data2.yaml",
      keywords = Seq(reactions, observables, cmeKw(kvn("7000"))))))

  /** invalid_submission_keyword.yaml — 156-char keyword value
    * (test_submission_validator.py:202) */
  val LongKw: String = "abcdefghijklmnopqrstuvwxyz" * 6
  val invalidKeyword: SubFile = SubFile("invalid_submission_keyword.yaml", Seq(
    addInfoDoc(),
    tableDoc("Table 1", "data1.yaml",
      keywords = Seq(reactions, observables, cmeKw(kvn("7000")),
        kw("phrases", Seq(kvs(LongKw)))))))

  /** invalid_submission_duplicates.yaml — duplicate name + data_file
    * (test_submission_validator.py:217-218) */
  val invalidDuplicates: SubFile = SubFile("invalid_submission_duplicates.yaml", Seq(
    addInfoDoc(),
    tableDoc("Table 1", "data1.yaml",
      keywords = Seq(reactions, observables, cmeKw(kvn("7000")))),
    tableDoc("Table 2", "data2.yaml",
      keywords = Seq(reactions, observables, cmeKw(kvs("7000.0-8000.0")))),
    tableDoc("Table 2", "data1.yaml",
      keywords = Seq(reactions, observables, cmeKw(kvs("7000.0-8000.0"))))))

  /** invalid_cmenergies.yaml (test_submission_validator.py:302) */
  val invalidCmenergies: SubFile = SubFile("invalid_cmenergies.yaml", Seq(
    addInfoDoc(),
    tableDoc("Table 1", "data1.yaml",
      keywords = Seq(reactions, observables, cmeKw(kvs("7000 GeV"))))))

  /** valid_file.yaml passed as a submission — the lone doc matches only the
    * additional-info schema (test_submission_validator.py:336) */
  val noSubmissionDoc: SubFile = SubFile("valid_file.yaml", Seq(addInfoDoc()))

  /** TestRelatedSubmissions/invalid_submission_recid.yaml
    * (test_submission_validator.py:349-355) */
  val invalidRecid: SubFile = SubFile("invalid_submission_recid.yaml", Seq(
    addInfoDoc(recids = Seq(recidStr("a"), recidStr("b"), recid(0), recid(1), recid(1))),
    tableDoc("Table 1", "data1.yaml", keywords = Seq(kw("reactions", Seq())))))

  /** TestRelatedSubmissions/invalid_submission_doi.yaml
    * (test_submission_validator.py:356-364) */
  val invalidDoi: SubFile = SubFile("invalid_submission_doi.yaml", Seq(
    addInfoDoc(),
    tableDoc("Table 1", "data1.yaml", keywords = Seq(kw("reactions", Seq())))
      .copy(hasDois = true, dois = Seq(
        doiNum("1"),
        doiStr("10.17182/hepdata.1"),
        doiStr("10.17182/hepdata.1.v1"),
        doiStr("10.17182/hepdata.1.v1/"),
        doiStr("10.17182/hepdata.1.v1/a2"),
        doiStr("10.17182/hepdata.1.v1/t1"),
        doiStr("10.17182/hepdata.1.v1/t1")))))

  /** TestRelatedSubmissions/valid_submission_related.yaml — PASS */
  val validRelated: SubFile = SubFile("valid_submission_related.yaml", Seq(
    addInfoDoc(recids = Seq(recid(1), recid(2))),
    tableDoc("Table 1", "data1.yaml", keywords = Seq(kw("reactions", Seq())))
      .copy(hasDois = true, dois = Seq(doiStr("10.17182/hepdata.1.v1/t1"),
        doiStr("10.17182/hepdata.2.v2/t4")))))

  /** valid_submission.yaml shape + an empty doc (skipped,
    * submission_file_validator.py:74-75) — PASS */
  val validWithEmpty: SubFile = SubFile("valid_submission_empty.yaml", Seq(
    addInfoDoc(), emptyDoc,
    tableDoc("Table 1", "data1.yaml",
      keywords = Seq(reactions, observables, cmeKw(kvn("7000"))))))

  /** testsuite/test_data/valid_submission_v0.yaml — keywords use the v0-era
    * name 'energies' (keywords[2]): VALID at 0.1.0 (no keyword-name enum in
    * that schema), INVALID at ≥1.0.0 (test_submission_validator.py:34-47,
    * 69-81). Not part of `all` (the default corpus is 1.1.x-shaped). */
  val validSubmissionV0: SubFile = {
    import SubModel._
    def kws = Seq(
      kw("reactions", Seq(kvs("P P --> Z0 Z0 X"))),
      kw("observables", Seq(kvs("SIG"))),
      kw("energies", Seq(KwVal("7000", isString = false))))
    SubFile("valid_submission_v0.yaml", Seq(
      addInfoDoc(),
      tableDoc("Table 1", "data1.yaml", keywords = kws),
      tableDoc("Table 2", "data2.yaml", keywords = kws)))
  }

  val all: Seq[SubFile] = Seq(invalidSubmission, invalidLicense,
    invalidKeyword, invalidDuplicates, invalidCmenergies, noSubmissionDoc,
    invalidRecid, invalidDoi, validRelated, validWithEmpty)
}
