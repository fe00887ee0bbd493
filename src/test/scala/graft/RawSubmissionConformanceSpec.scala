package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.hep.{HepRow, SubFile}
import graft.ingest._

/** End-to-end raw-directory ingestion differential: the full-submission
  * corpus now carries every materialized file's bytes, so each of the 120
  * reference-validated directories is REBUILT on disk and pushed through
  * the real production path — RawSubmission.validateDir (Hadoop-FS
  * listing, executor-side PyYamlParse, HepDataRules, FullSubmission
  * joins) — and must reproduce (a) the intermediate files/hepRows/sub
  * tables the Python generators computed and (b) every per-file
  * (level, message) sequence the live reference emitted. */
class RawSubmissionConformanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private implicit val fmts: Formats = DefaultFormats

  private case class RawFile(fname: String, kind: String, data: String)
  private case class FileRow(fname: String, size: Long, parseable: Boolean,
      parseError: Option[String])

  private def materialize(dir: java.nio.file.Path, rf: RawFile): Unit = {
    val p = dir.resolve(rf.fname)
    rf.kind match {
      case "text" => Files.write(p, rf.data.getBytes("UTF-8"))
      case "b64" => Files.write(p, java.util.Base64.getDecoder.decode(rf.data))
      case "big" =>
        val raf = new java.io.RandomAccessFile(p.toFile, "rw")
        try raf.setLength(rf.data.toLong) finally raf.close()
    }
  }

  test("non-mapping data roots and custom-type docs fail loudly (review finding)") {
    // probed live: list/scalar roots get "X is not of type 'object'";
    // unregistered custom types get the no-schema message — never a
    // silent pass (the old code emitted NO row and NO violation)
    val dir = Files.createTempDirectory("graft_rootvio_")
    try {
      Files.write(dir.resolve("submission.yaml"),
        ("""name: Table 1
           |description: d
           |keywords: [{name: reactions, values: [P P --> X]}]
           |data_file: data1.yaml
           |---
           |name: Table 2
           |description: d
           |keywords: [{name: reactions, values: [P P --> X]}]
           |data_file: data2.yaml
           |""".stripMargin).getBytes("UTF-8"))
      Files.write(dir.resolve("data1.yaml"), "- 1\n- 2\n".getBytes("UTF-8"))
      Files.write(dir.resolve("data2.yaml"),
        "type: mycustom\nstuff: 1\n".getBytes("UTF-8"))
      val res = RawSubmission.validateDir(spark, dir.toString)
      val msgs = res.messages.orderBy("file", "seq").collect()
        .map(r => (r.getAs[String]("file"), r.getAs[String]("message"))).toList
      assert(msgs.contains(("data1.yaml", "data1.yaml is invalid HEPData YAML.")))
      assert(msgs.contains(("data1.yaml", "[1, 2] is not of type 'object'")))
      assert(msgs.contains(("data2.yaml",
        "There is no schema defined for the 'mycustom' data type.")))
      assert(res.validDataFiles.isEmpty)
    } finally {
      import scala.util.Try
      Try(org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile))
    }
  }

  test("single-YAML split overwrites an existing data_file in place (review finding)") {
    // reference: doc['data_file'] = derived REPLACES the value, so a
    // pre-existing non-string data_file cannot leak a spurious type error
    val t = graft.ingest.YamlIngest.splitSingleYaml("s.yaml",
      """name: Tab 1
        |description: d
        |data_file: 5
        |keywords: [{name: reactions, values: [P P --> X]}]
        |independent_variables: [{header: {name: X}, values: [{value: 1}]}]
        |dependent_variables: [{header: {name: Y}, values: [{value: 2}]}]
        |""".stripMargin)
    val doc = t.sub.docs.head
    assert(doc.dataFileRaw === "Tab_1.yaml")
    assert(doc.dataFileIsString)
    // a named doc with NO inline data splits to None-valued keys (the
    // reference's doc.pop(key, None) write) -> the type-error reprs
    val t2 = graft.ingest.YamlIngest.splitSingleYaml("s.yaml",
      "name: Tab 2\ndescription: d\n")
    assert(t2.hepRows.head.indepBadRepr === "None")
    assert(t2.hepRows.head.depBadRepr === "None")
  }

  test("120 raw directories ingest and validate byte-exact") {
    import spark.implicits._
    val lenient = new com.fasterxml.jackson.databind.ObjectMapper()
    lenient.enable(com.fasterxml.jackson.core.json.JsonReadFeature
      .ALLOW_NON_NUMERIC_NUMBERS.mappedFeature())
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/golden/fullsubmission_conformance.jsonl"),
      "UTF-8")
    val cases = try src.getLines().map(l =>
      JsonMethods.fromJsonNode(lenient.readTree(l))).toList
    finally src.close()
    assert(cases.size === 120)

    val root = Files.createTempDirectory("graft_rawsub_")
    val nMsgs = new java.util.concurrent.atomic.AtomicInteger(0)
    // 4-way case parallelism: each case is a handful of small Spark jobs
    // (the shared local[4] session schedules concurrent jobs fine), so the
    // wall time is fixed-overhead-bound, not compute-bound
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    val bad = try Await.result(Future.traverse(cases) { j => Future {
      val name = (j \ "file").extract[String]
      val dir = root.resolve(name)
      Files.createDirectory(dir)
      (j \ "rawFiles").extract[List[RawFile]].foreach(materialize(dir, _))

      val expSub = (j \ "sub").extract[SubFile]
      val expFiles = (j \ "files").extract[List[FileRow]]
        .map(f => (f.fname, f.size, f.parseable, f.parseError))
      val expHep = (j \ "hepRows").extract[List[HepRow]].sortBy(_.file)
      val expMsgs = (j \ "messages") match {
        case JObject(fs) => fs.map { case (f, ms) =>
          f -> ms.extract[List[List[String]]].map(p => (p(0), p(1)))
        }.toMap
        case _ => Map.empty[String, List[(String, String)]]
      }
      nMsgs.addAndGet(expMsgs.valuesIterator.map(_.size).sum)

      // intermediate tables
      val listing = new java.io.File(dir.toString).listFiles()
        .filter(_.isFile).map(f => (f.getName, f.length())).sortBy(_._1).toSeq
      val parsed = RawSubmission.parsedFiles(spark, dir.toString, listing)
        .collect().sortBy(_.fname)
      val gotFiles = parsed.map(f => (f.fname, f.size, f.parseable, f.parseError)).toList
      val gotHep = parsed.flatMap(_.hepRow).sortBy(_.file).toList
      val subText = new String(
        Files.readAllBytes(dir.resolve("submission.yaml")), "UTF-8")
      val gotSub = YamlIngest.parseSubmission("submission.yaml", subText)

      // end product
      val got = RawSubmission.validateDir(spark, dir.toString)
      val gotMsgs = got.messages.orderBy("file", "seq").collect()
        .map(r => (r.getAs[String]("file"),
          (r.getAs[String]("level"), r.getAs[String]("message"))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toList).toMap

      val problems = List(
        (gotFiles != expFiles) -> s"files: $gotFiles vs $expFiles",
        (gotHep != expHep) -> "hepRows differ",
        (gotSub != expSub) -> s"sub differs",
        (gotMsgs != expMsgs) -> s"messages: $gotMsgs vs $expMsgs"
      ).collect { case (true, m) => m }
      if (problems.isEmpty) None else Some((name, problems))
    } }, Duration.Inf).flatten finally {
      pool.shutdown()
      // best-effort cleanup
      import scala.util.Try
      Try(org.apache.commons.io.FileUtils.deleteDirectory(root.toFile))
    }
    bad.take(3).foreach { case (n, ps) =>
      info(s"MISMATCH $n"); ps.foreach(p => info(s"  ${p.take(2000)}"))
    }
    assert(bad.isEmpty, s"${bad.size} of 120 directories mismatch")
    info(s"120 raw directories, ${nMsgs.get} reference messages replayed end-to-end")
    assert(nMsgs.get > 250)
  }
}
