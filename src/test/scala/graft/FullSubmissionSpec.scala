package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.hep.{FullSubmission, SubFixtures}

/** Orchestration tests mirroring the message kinds and per-file allocation of
  * /root/reference/testsuite/test_full_submission_validator.py:246-284. */
class FullSubmissionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import FullSubmission._

  def fixture() = {
    import spark.implicits._
    val docs = Seq(
      // (docIdx, name, hasDataFile, dataFile, resources)
      (1, "Table 1", true, "data1.yaml", Seq("analysis.py")),
      (2, "Table 2", true, "mydirectory/data2.yaml",
        Seq("../other/figFigure8B.png", "figFigure9A.png")),
      (3, "Table 3", true, "data3.yaml", Seq.empty[String]),
      (4, "Table 4", true, "data8.yaml", Seq.empty[String]),
      (5, "Table 5", true, "data11.yaml", Seq.empty[String]),
      (6, "Table 6", true, "data9.yaml", Seq.empty[String]),
      (7, "Table 7", true, "data4.yaml", Seq("http://github.com/HEPData/hepdata")))
      .toDF("docIdx", "name", "hasDataFile", "dataFile", "resources")
    val files = Seq(
      ("submission.yaml", 2000L, true, null),
      ("data1.yaml", 1000L, true, null),
      ("data4.yaml", 1000L, true, null),
      ("data8.yaml", 1000L, false, "mapping values are not allowed here"),
      ("data9.yaml", 1000L, true, null),
      ("data10.yaml", 1000L, true, null),
      ("data11.yaml", 12180000L, true, null),
      ("analysis.py", 300L, true, null),
      ("figFigure8B.png", 50L, true, null),
      ("._data10.yaml", 10L, true, null),
      ("._data11.yaml", 10L, true, null))
      .toDF("fname", "size", "parseable", "parseError")
    val dataViolations = Seq(
      ("data9.yaml", 0, "Uncertainties should not all be zero in 'dependent_variables.values[1].errors'"))
      .toDF("file", "seq", "message")
    (docs, files, dataViolations)
  }

  lazy val result: Result = {
    val (docs, files, dv) = fixture()
    FullSubmission.checks(spark, "submission.yaml", docs, files, dv)
  }

  def msgsFor(file: String): Seq[(String, String)] =
    result.messages.where(s"file = '$file'")
      .orderBy("k0", "k1", "k2", "k3").collect()
      .map(r => r.getAs[String]("level") -> r.getAs[String]("message")).toSeq

  test("F7/F8/J2: '/'-checks and missing resources allocate to submission.yaml") {
    assert(msgsFor("submission.yaml") === Seq(
      "error" -> "Location of 'additional_resources' file '../other/figFigure8B.png' should not contain '/'.",
      "error" -> "Missing 'additional_resources' file 'figFigure9A.png'.",
      "error" -> "Name of data_file 'mydirectory/data2.yaml' should not contain '/'."))
  }

  test("J1: missing data_file allocates to the data-file path") {
    assert(msgsFor("data3.yaml") === Seq(
      "error" -> "Missing data_file 'data3.yaml'."))
  }

  test("parse failure propagates with the reference's message shape") {
    assert(msgsFor("data8.yaml") === Seq(
      "error" -> "There was a problem parsing the file:\n\t\tmapping values are not allowed here"))
  }

  test("S10: oversized data_file (test_full_submission_validator.py:284)") {
    assert(msgsFor("data11.yaml") === Seq(
      "error" -> "Size of data_file 'data11.yaml' (12180000 bytes) is bigger than the limit of 10485760 bytes. Try adding the file as an additional_resource instead."))
  }

  test("invalid data file gets header + propagated validator messages") {
    assert(msgsFor("data9.yaml") === Seq(
      "error" -> "data9.yaml is invalid HEPData YAML.",
      "error" -> "Uncertainties should not all be zero in 'dependent_variables.values[1].errors'"))
  }

  test("J3: unreferenced files + MacOS ._ hint (:278-283)") {
    assert(msgsFor("figFigure8B.png") === Seq(
      "error" -> "figFigure8B.png is not referenced in the submission."))
    assert(msgsFor("data10.yaml") === Seq(
      "error" -> "data10.yaml is not referenced in the submission."))
    assert(msgsFor("._data10.yaml") === Seq(
      "error" -> "._data10.yaml is not referenced in the submission.",
      "hint" -> "._data10.yaml might be a file created by tar on MacOS. Set COPYFILE_DISABLE=1 before creating the archive."))
    assert(msgsFor("._data11.yaml") === Seq(
      "error" -> "._data11.yaml is not referenced in the submission.",
      "hint" -> "._data11.yaml might be a file created by tar on MacOS. Set COPYFILE_DISABLE=1 before creating the archive."))
  }

  test("valid_files bookkeeping: fully-valid data files only") {
    assert(result.validDataFiles.collect().map(_.getString(0)).sorted.toSeq ===
      Seq("data1.yaml", "data4.yaml"))
  }

  test("remote schema dispatch: not-found / not-allowed / against-schema header (:331-366)") {
    import spark.implicits._
    val docs = Seq(
      (1, "T1", true, "data1.yaml", Seq.empty[String], "https://example.org/good.json"),
      (2, "T2", true, "data9.yaml", Seq.empty[String], "https://example.org/also-good.json"),
      (3, "T3", true, "data4.yaml", Seq.empty[String], "https://example.org/missing.json"),
      (4, "T4", true, "data10.yaml", Seq.empty[String], null))
      .toDF("docIdx", "name", "hasDataFile", "dataFile", "resources", "dataSchema")
    val (_, files, dv) = fixture()
    val known = Set("https://example.org/good.json", "https://example.org/also-good.json")
    // autoload on: unknown-to-loader schema -> "not found"
    val r1 = FullSubmission.checks(spark, "submission.yaml", docs, files, dv,
      resolvableSchemas = known, autoloadRemote = true)
    val m1 = r1.messages.collect().map(_.getAs[String]("message"))
    assert(m1.contains("Remote schema https://example.org/missing.json not found."))
    // data9 is invalid and carries a schema -> "against schema" header
    assert(m1.contains("data9.yaml is invalid against schema https://example.org/also-good.json."))
    assert(m1.contains("data10.yaml is invalid HEPData YAML.") === false) // data10 has no violations
    // autoload off: same doc -> "not allowed"
    val r2 = FullSubmission.checks(spark, "submission.yaml", docs, files, dv,
      knownSchemas = known, autoloadRemote = false)
    assert(r2.messages.collect().map(_.getAs[String]("message"))
      .contains("Autoloading of remote schema https://example.org/missing.json is not allowed."))
    // data4 (the doc with the bad schema) is excluded from valid files
    assert(!r1.validDataFiles.collect().map(_.getString(0)).contains("data4.yaml"))
    assert(r1.validDataFiles.collect().map(_.getString(0)).toSet ===
      Set("data1.yaml", "data10.yaml"))
  }

  test("version gates: v0 skips /resource/ prefix, <1.1.0 skips sweep + size cap") {
    import graft.hep.SchemaVersion
    val (docs0, files, dv) = fixture()
    import spark.implicits._
    val docs = docs0.unionByName(Seq(
      (8, "Table 8", false, null.asInstanceOf[String], Seq("/resource/x.png")))
      .toDF("docIdx", "name", "hasDataFile", "dataFile", "resources"))
    val v0 = FullSubmission.checks(spark, "submission.yaml", docs, files, dv,
      version = SchemaVersion.parse("0.1.0"))
      .messages.collect().map(_.getAs[String]("message"))
    assert(!v0.exists(_.contains("is not referenced"))) // sweep off
    assert(!v0.exists(_.contains("bigger than the limit"))) // size cap off
    assert(!v0.exists(_.contains("/resource/x.png"))) // v0 prefix skipped
    val v1 = FullSubmission.checks(spark, "submission.yaml", docs, files, dv)
      .messages.collect().map(_.getAs[String]("message"))
    assert(v1.exists(_.contains("Missing 'additional_resources' file '/resource/x.png'"))
      || v1.exists(_.contains("Location of 'additional_resources' file '/resource/x.png'")))
  }

  test("short-circuit: invalid submission.yaml returns only its messages (:180-188)") {
    import spark.implicits._
    val (docs, files, dv) = fixture()
    val out = FullSubmission.validateAll(spark,
      Seq(SubFixtures.invalidDuplicates).toDS().toDF(),
      "submission.yaml", docs, files, dv)
      .collect().map(_.getAs[String]("message")).toSeq
    assert(out === Seq(
      "submission.yaml is invalid HEPData YAML.",
      "Duplicate table name: Table 2",
      "Duplicate table data_file: data1.yaml"))
  }
}
