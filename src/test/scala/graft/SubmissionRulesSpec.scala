package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.hep.{SubFile, SubFixtures, SubmissionRules}

/** Golden-message tests against /root/reference/testsuite/test_submission_validator.py. */
class SubmissionRulesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def messagesFor(f: SubFile): Seq[String] = {
    import spark.implicits._
    SubmissionRules.violations(Seq(f).toDS().toDF())
      .orderBy("seq").collect()
      .map(r => s"${r.getAs[String]("level")} - ${r.getAs[String]("message")}")
      .toSeq
  }

  val kwRepr = SubmissionRules.KwItemRepr

  test("invalid_submission.yaml: 3 golden errors (test_submission_validator.py:168-170)") {
    assert(messagesFor(SubFixtures.invalidSubmission) === Seq(
      s"error - 'values' is a required property in 'keywords[0]' (expected: $kwRepr)",
      s"error - Additional properties are not allowed ('value' was unexpected) in 'keywords[0]' (expected: $kwRepr)",
      "error - 12321 is not of type 'string' in 'data_file' (expected: {'type': 'string'})"))
  }

  test("invalid_submission_license.yaml: 3 golden errors (:186-188)") {
    assert(messagesFor(SubFixtures.invalidLicense) === Seq(
      "error - None is not of type 'string' in 'data_license.name' (expected: {'type': 'string', 'maxLength': 256})",
      "error - None is not of type 'string' in 'data_license.url' (expected: {'type': 'string', 'maxLength': 256})",
      "error - None is not of type 'string' in 'data_license.description' (expected: {'type': 'string'})"))
  }

  test("invalid_submission_keyword.yaml: too-long keyword value (:202)") {
    assert(messagesFor(SubFixtures.invalidKeyword) === Seq(
      s"error - '${SubFixtures.LongKw}' is too long in 'keywords[3].values[0]' (expected: {'type': ['string', 'number'], 'maxLength': 128})"))
  }

  test("invalid_submission_duplicates.yaml: name + data_file duplicates (:217-218)") {
    assert(messagesFor(SubFixtures.invalidDuplicates) === Seq(
      "error - Duplicate table name: Table 2",
      "error - Duplicate table data_file: data1.yaml"))
  }

  test("invalid_cmenergies.yaml (:302)") {
    assert(messagesFor(SubFixtures.invalidCmenergies) === Seq(
      "error - Invalid value (in GeV) for cmenergies: '7000 GeV' in 'keywords[2].name.cmenergies' (expected: {'type': 'number or hyphen-separated range of numbers e.g. 1.7-4.7'})"))
  }

  test("no document matching submission schema (:336)") {
    assert(messagesFor(SubFixtures.noSubmissionDoc) === Seq(
      "error - There should be at least one document matching the submission schema."))
  }

  test("invalid_submission_recid.yaml: 4 errors w/ pinned substrings (:349-355)") {
    val msgs = messagesFor(SubFixtures.invalidRecid)
    assert(msgs.size === 4)
    val expected = Seq(
      "'a' is not of type 'integer'",
      "'b' is not of type 'integer'",
      "0 is less than the minimum of 1",
      "has non-unique elements in 'related_to_hepdata_records'")
    expected.foreach(e => assert(msgs.exists(_.contains(e)), s"missing: $e"))
  }

  test("invalid_submission_doi.yaml: 6 errors w/ pinned substrings (:356-364)") {
    val msgs = messagesFor(SubFixtures.invalidDoi)
    assert(msgs.size === 6)
    val expected = Seq(
      "1 is not of type 'string'",
      "'10.17182/hepdata.1' does not match",
      "'10.17182/hepdata.1.v1' does not match",
      "'10.17182/hepdata.1.v1/' does not match",
      "'10.17182/hepdata.1.v1/a2' does not match",
      "has non-unique elements in 'related_to_table_dois'")
    expected.foreach(e => assert(msgs.exists(_.contains(e)), s"missing: $e"))
  }

  test("valid corpus passes; empty docs skipped") {
    assert(messagesFor(SubFixtures.validRelated) === Seq.empty)
    assert(messagesFor(SubFixtures.validWithEmpty) === Seq.empty)
  }

  test("version gates: duplicates/has-submission-doc require >=1.1.0, cmenergies major>0") {
    import spark.implicits._
    import graft.hep.{SchemaVersion, SubmissionRules}
    def msgsAt(f: SubFile, v: String) =
      SubmissionRules.violations(Seq(f).toDS().toDF(), SchemaVersion.parse(v))
        .collect().map(_.getAs[String]("message")).toSeq
    assert(msgsAt(SubFixtures.invalidDuplicates, "1.0.0") === Seq.empty)
    assert(msgsAt(SubFixtures.noSubmissionDoc, "1.0.0") === Seq.empty)
    assert(msgsAt(SubFixtures.invalidCmenergies, "0.1.0") === Seq.empty)
    assert(msgsAt(SubFixtures.invalidCmenergies, "1.0.0").size === 1)
  }

  test("verdict matrix") {
    import spark.implicits._
    val verdicts = SubmissionRules.verdicts(SubFixtures.all.toDS().toDF())
      .collect().map(r => r.getString(0) -> r.getAs[Boolean]("pass")).toMap
    assert(verdicts === Map(
      "invalid_submission.yaml" -> false,
      "invalid_submission_license.yaml" -> false,
      "invalid_submission_keyword.yaml" -> false,
      "invalid_submission_duplicates.yaml" -> false,
      "invalid_cmenergies.yaml" -> false,
      "valid_file.yaml" -> false,
      "invalid_submission_recid.yaml" -> false,
      "invalid_submission_doi.yaml" -> false,
      "valid_submission_related.yaml" -> true,
      "valid_submission_empty.yaml" -> true))
  }
}
