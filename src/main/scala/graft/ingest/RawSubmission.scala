package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.hep._

/** One directory entry after the executor-side read+parse pass.
  * `hepRow` is present for data-shaped documents (root mapping without a
  * custom-schema 'type', or an empty doc); `rootViolation` carries the
  * reference's message for non-mapping roots / unregistered custom types
  * (probed live: "[1, 2] is not of type 'object'", "There is no schema
  * defined for the 'X' data type." — int-like roots CRASH the reference
  * with a TypeError; here they get the type message, fail-closed);
  * `unrepresentable` quarantines shapes outside the row model (never
  * silently dropped). */
final case class ParsedFile(
    fname: String, size: Long,
    parseable: Boolean, parseError: Option[String],
    hepRow: Option[HepRow], unrepresentable: Option[String],
    rootViolation: Option[String] = None)

/** Raw-directory ingestion: actual YAML bytes → the engine's row model,
  * then the existing FullSubmission orchestration — the production path
  * the reference walks with os.listdir + yaml.load
  * (ref: full_submission_validator.py:144-234, data_file_validator.py:
  * 100-114).
  *
  * Scale shape: the LISTING is driver-side metadata (the reference's
  * os.listdir; a catalog/partition listing at scale), file READ+PARSE is
  * executor-side over a Dataset of (name, size) — each task opens its own
  * files through the Hadoop FS API, so a million-file submission store
  * fans out across the cluster while the driver only ever holds names.
  * mapPartitions is warranted here for the same reason as the multimodal
  * codec: no Catalyst expression can run a YAML parser. */
object RawSubmission {

  final case class Result(
      messages: DataFrame, // (file, seq, message, level)
      validDataFiles: Seq[String], // bare names, submission-doc order
      subValid: Boolean, // print_valid_files' SUBMISSION/SINGLE_YAML entry
      quarantined: Seq[(String, String)], // (fname, unrepresentable shape)
      fileOrder: Seq[String] = Nil) // reference messages-dict insertion order

  /** Driver-side flat listing (name, size), sorted by name. */
  private def listDir(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq.filter(_.isFile)
      .map(st => (st.getPath.getName, st.getLen)).sortBy(_._1)
  }

  /** Executor-side read + parse of every non-submission file within the
    * size cap (mirrors the reference's per-data-file yaml.load; parse
    * errors carry the loader text with the \n→\n\t\t indentation the
    * messages embed, ref full_submission_validator.py:358-363). */
  def parsedFiles(spark: SparkSession, dir: String,
      listing: Seq[(String, Long)],
      sizeLimit: Long = FullSubmission.SizeLimit): Dataset[ParsedFile] = {
    import spark.implicits._
    val dirStr = dir
    // ship the SESSION's Hadoop configuration (fs credentials/endpoints)
    // to the tasks — a fresh Configuration() only sees core-defaults and
    // breaks any non-default filesystem (review finding)
    val confEntries: Array[(String, String)] = {
      val c = spark.sparkContext.hadoopConfiguration
      val it = c.iterator()
      val buf = Array.newBuilder[(String, String)]
      while (it.hasNext) { val e = it.next(); buf += (e.getKey -> e.getValue) }
      buf.result()
    }
    spark.createDataset(listing).mapPartitions { entries =>
      lazy val conf = {
        val c = new org.apache.hadoop.conf.Configuration(false)
        confEntries.foreach { case (k, v) => c.set(k, v) }
        c
      }
      entries.map { case (fname, size) =>
        if (fname == "submission.yaml" || size > sizeLimit)
          ParsedFile(fname, size, parseable = true, None, None, None, None)
        else {
          val path = new org.apache.hadoop.fs.Path(dirStr, fname)
          val fs = path.getFileSystem(conf)
          val in = fs.open(path)
          val bytes = try {
            val buf = new Array[Byte](size.toInt)
            in.readFully(0, buf); buf
          } finally in.close()
          try {
            val doc = PyYamlParse.load(PyYamlParse.decode(bytes, fname), fname)
            val row = doc match {
              case PNone => Some(YamlIngest.dataRow(fname, PNone))
              case m: PMap if !m.has("type") => Some(YamlIngest.dataRow(fname, m))
              case _ => None // non-mapping roots / custom-schema 'type'
                             // docs get synthetic violations below
            }
            // the reference rejects non-mapping roots ("X is not of type
            // 'object'") and unregistered custom types — reproduce the
            // messages instead of silently passing the file (review
            // finding; probed live)
            val rootVio = doc match {
              case PNone | _: PMap if row.isDefined => None
              case m: PMap => // 'type'-keyed custom-schema doc
                val t = m.get("type").map(_.pyStr).getOrElse("")
                Some(s"There is no schema defined for the '$t' data type.")
              case other =>
                Some(s"${other.pyRepr} is not of type 'object'")
            }
            ParsedFile(fname, size, parseable = true, None, row,
              None, rootVio)
          } catch {
            case e: PyYamlError =>
              ParsedFile(fname, size, parseable = false,
                Some(e.rendered.replace("\n", "\n\t\t")), None, None, None)
            case e: UnrepresentableShape =>
              ParsedFile(fname, size, parseable = true, None, None,
                Some(e.what), None)
          }
        }
      }
    }
  }

  /** Single-file submission (`hepdata-validate -f`, ref
    * full_submission_validator.py:116-142): one combined YAML stream,
    * optionally gzipped, logically split into submission + derived data
    * files. Message attribution uses the file's own name (for .yaml.gz the
    * reference unzips into a temp dir and strips it, leaving the .yaml
    * basename). */
  def validateFile(spark: SparkSession, path: String): Result = {
    import spark.implicits._
    def fail(file: String, message: String): Result =
      Result(spark.createDataFrame(Seq((file, 0L, message, "error")))
        .toDF("file", "seq", "message", "level"),
        Nil, subValid = false, Nil, Seq(file))

    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p) || !fs.getFileStatus(p).isFile)
      return fail(path, s"File $path does not exist.")
    val bytes = {
      val in = fs.open(p)
      try {
        val size = fs.getFileStatus(p).getLen.toInt
        val buf = new Array[Byte](size); in.readFully(0, buf); buf
      } finally in.close()
    }
    val isGz = path.endsWith(".yaml.gz")
    val attrName =
      if (isGz) new org.apache.hadoop.fs.Path(path.dropRight(3)).getName
      else path
    val raw =
      if (isGz) {
        try {
          val gz = new java.util.zip.GZIPInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try gz.readAllBytes() finally gz.close()
        } catch {
          case e: java.io.IOException =>
            return fail(path, s"Unable to extract file $path. Error was: ${e.getMessage}")
        }
      } else bytes
    val tables =
      try YamlIngest.splitSingleYaml(attrName, PyYamlParse.decode(raw, attrName))
      catch {
        case e: PyYamlError =>
          return fail(attrName,
            "There was a problem parsing the file:\n\t\t" +
              e.rendered.replace("\n", "\n\t\t"))
        case e: UnrepresentableShape =>
          // loud fail-closed (the reference emits a schema message or
          // crashes here, shape-dependent); never a silent pass
          return fail(attrName, s"Unrepresentable YAML shape: ${e.what}")
      }
    val docs = tables.docs.toDF("docIdx", "name", "resources")
    // localCheckpoint: eager materialization with lineage cut — cleaned
    // up by the ContextCleaner when the frame is collected and dropped
    // (a plain persist leaks in long-lived sessions)
    val messages = FullSubmission.validateSingleYaml(spark,
      Seq(tables.sub).toDS().toDF(), attrName, docs,
      tables.hepRows.toDF()).localCheckpoint()
    // single-YAML mode: any message is doc-invalidating (parse errors are
    // impossible for the derived files and the sweep is off)
    val valid = messages.isEmpty
    Result(messages, Nil, subValid = valid, Nil, Seq(attrName))
  }

  /** Full raw-directory validation: list, parse submission.yaml
    * driver-side (small by construction), fan file parsing out to
    * executors, and run the FullSubmission orchestration. Message `file`
    * values are directory-relative (callers prefix for display, like the
    * reference's full paths). */
  def validateDir(spark: SparkSession, dir: String,
      sizeLimit: Long = FullSubmission.SizeLimit): Result = {
    import spark.implicits._
    def fail(file: String, message: String): Result =
      Result(spark.createDataFrame(Seq((file, 0L, message, "error")))
        .toDF("file", "seq", "message", "level"),
        Nil, subValid = false, Nil, Seq(file))

    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p) || !fs.getFileStatus(p).isDirectory)
      return fail(dir, s"Directory $dir does not exist.")
    val listing = listDir(spark, dir)
    if (!listing.exists(_._1 == "submission.yaml"))
      return fail("submission.yaml", "No submission.yaml file found in submission.")

    // submission.yaml: driver-side parse (the reference holds the doc list
    // in memory too; schemas cap realistic size)
    val subPath = new org.apache.hadoop.fs.Path(dir, "submission.yaml")
    val subBytes = {
      val in = fs.open(subPath)
      try {
        val size = fs.getFileStatus(subPath).getLen.toInt
        val buf = new Array[Byte](size); in.readFully(0, buf); buf
      } finally in.close()
    }
    val (sub, docsMeta) =
      try {
        val parsed = PyYamlParse.loadAll(
          PyYamlParse.decode(subBytes, "submission.yaml"), "submission.yaml")
        (SubFile("submission.yaml", parsed.map(YamlIngest.subDoc)),
          YamlIngest.docMeta(parsed))
      } catch {
        case e: PyYamlError =>
          return fail("submission.yaml",
            "There was a problem parsing the file:\n\t\t" +
              e.rendered.replace("\n", "\n\t\t"))
        case e: UnrepresentableShape =>
          return fail("submission.yaml",
            s"Unrepresentable YAML shape: ${e.what}")
      }

    // reference short-circuit: invalid submission.yaml → its own messages
    val subMsgs = SubmissionRules.violations(Seq(sub).toDS().toDF())
    if (!subMsgs.isEmpty) {
      val hdr = spark.createDataFrame(
        Seq(("submission.yaml", -1L, "submission.yaml is invalid HEPData YAML.", "error")))
        .toDF("file", "seq", "message", "level")
      val messages = hdr.unionByName(subMsgs.select(
          lit("submission.yaml").as("file"), col("seq").cast("long").as("seq"),
          col("message"), col("level")))
        .orderBy("seq")
      return Result(messages, Nil, subValid = false, Nil, Seq("submission.yaml"))
    }

    val parsed = parsedFiles(spark, dir, listing, sizeLimit).persist()
    try {
      val files = parsed.toDF()
        .select(col("fname"), col("size"), col("parseable"),
          col("parseError").as("parseError"))
      val hepRows = parsed.flatMap(_.hepRow.toSeq).toDF()
      val rootVios = parsed
        .flatMap(f => f.rootViolation.map(m => (f.fname, 0, m)).toSeq)
        .toDF("file", "seq", "message")
      val dv = HepDataRules.violations(hepRows)
        .select(col("file"), col("seq").cast("int").as("seq"), col("message"))
        .unionByName(rootVios)
      val docs = docsMeta
        .map(d => (d.docIdx, d.name, d.hasDataFile, d.dataFile, d.resources,
          d.dataSchema.orNull))
        .toDF("docIdx", "name", "hasDataFile", "dataFile", "resources",
          "dataSchema")
      val res = FullSubmission.checks(spark, "submission.yaml", docs, files,
        dv, sizeLimit)
      val keyed = res.messages.persist()
      val messages = FullSubmission.ordered(keyed)
      // materialize outputs while `parsed`/`keyed` are pinned
      messages.persist()
      messages.count()
      val validNames = res.validDataFiles.collect().map(_.getString(0))
      // submission-doc order, like the reference's valid_files bookkeeping
      val inDocOrder = docsMeta.flatMap(d => Option(d.dataFile))
        .filter(validNames.toSet)
      // print_valid_files lists submission.yaml unless a resource check,
      // a data_file '/' check, or schema dispatch failed — missing/
      // oversized data files, parse errors and invalid data all `return`
      // WITHOUT flipping is_valid_submission_doc in directory mode
      // (ref: _check_doc, :271-347)
      val firsts = keyed.groupBy(col("file"))
        .agg(min(struct(col("k0"), col("k1"), col("k2"), col("k3"))).as("fk"),
          sum(when(col("k1") === 0 ||
              (col("k1") === 1 && (col("k2") === 0 || col("k2") === 3)), 1)
            .otherwise(0)).as("invalidating"))
        .collect()
      val subListed = firsts.map(_.getAs[Long]("invalidating")).sum == 0
      val fileOrder = firsts
        .map(r => (r.getString(0), r.getStruct(1)))
        .sortBy { case (f, k) =>
          (k.getInt(0), k.getInt(1), k.getInt(2), k.getInt(3), f) }
        .map(_._1).toSeq
      keyed.unpersist()
      // slim projection — never pull full HepRow payloads to the driver
      val quarantined = parsed
        .flatMap(f => f.unrepresentable.map(f.fname -> _).toSeq)
        .collect().toSeq
      Result(messages, inDocOrder, subValid = subListed, quarantined, fileOrder)
    } finally parsed.unpersist()
  }
}
