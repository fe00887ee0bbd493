package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.compile.ConstraintCompiler
import graft.engine.{Passes, PageValidator}
import graft.spec._
import graft.testdata.PagesGen

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, with DuckDB-equivalent oracle SQL where SQL-expressible.
  * All queries read the driver-provided parquet under `dir`
  * (TESTDATA.md) and sort by a unique key for deterministic compare. */
object SparkEntry {

  private def t(dir: String, name: String) = s"$dir/$name.parquet"

  /** Flagship: full page-validation pipeline (north_star) on synthesized
    * dirty pages; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val n = 20000L
    val pages = PagesGen.pages(spark, n, "dirty")
    val res = PageValidator.validate(spark, pages,
      PagesGen.langDim(spark), PagesGen.expectedText(spark, n))
    res.violations
  }

  /** Documents-table spec used by the rule/verdict queries: two rules fail
    * on real driver data (n_chars < 50, text longer than 400), three never
    * fire (guards that the compiler doesn't over-report). */
  private def docsSpec = TableSpec(
    table = "documents", partitionColumn = "source", keyColumns = Seq("doc_id"),
    rules = Seq(
      NotNull("text"),
      MinValue("n_chars", 50),
      MaxLen("text", 400),
      InSet("lang", Seq("en", "de", "fr", "es", "zh")),
      ExprRule("consistent:n_chars", "n_chars", "n_chars = length(text)",
        "concat('n_chars ', n_chars, ' does not equal length(text) in ''n_chars''')")))

  private val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.1 scans -----------------------------------------------------
    "s1_scan_filter" -> ((s, dir) => {
      s.read.parquet(t(dir, "documents"))
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .where(col("n_chars").between(100, 200))
        .orderBy("doc_id")
    }),
    // ---- §2.2 row-level constraint scan (fused single pass) -------------
    "p_rules_documents" -> ((s, dir) => {
      ConstraintCompiler.violations(docsSpec, s.read.parquet(t(dir, "documents")))
        .withColumn("rule_seq", col("rule_seq").cast("int"))
        .orderBy("doc_id", "rule_seq")
    }),
    // ---- §2.4 A7 per-partition verdicts (ONE scan: universe + counts from
    // the same aggregate — see Passes.verdictsSingleScan) ------------------
    "a7_verdict_by_source" -> ((s, dir) => {
      val docs = s.read.parquet(t(dir, "documents"))
      Passes.verdictsSingleScan(docs, "source",
          ConstraintCompiler.errorCount(docsSpec))
        .orderBy("source")
    }),
    // ---- §2.4 A9 column stats (exact-distinct variant for the oracle) ---
    "a9_stats_exact" -> ((s, dir) => {
      val docs = s.read.parquet(t(dir, "documents"))
      val aggs: Seq[Column] = Seq(count(lit(1)).as("n_rows")) ++ docCols.flatMap { c =>
        Seq(sum(col(c).isNull.cast("long")).as(s"${c}__nulls"),
          min(col(c).cast("string")).as(s"${c}__min"),
          max(col(c).cast("string")).as(s"${c}__max"),
          countDistinct(col(c)).as(s"${c}__dist"))
      }
      val stackExpr = docCols.map(c =>
        s"'$c', ${c}__nulls, ${c}__min, ${c}__max, ${c}__dist").mkString(
        s"stack(${docCols.size}, ", ", ",
        ") as (column, n_null, min_str, max_str, n_distinct)")
      docs.agg(aggs.head, aggs.tail: _*)
        .select(expr(stackExpr), col("n_rows"))
        .select(col("column"), col("n_rows"), col("n_null"),
          (col("n_null").cast("double") / col("n_rows")).as("null_rate"),
          col("min_str"), col("max_str"), col("n_distinct"))
        .orderBy("column")
    }),
    // ---- §2.4 A5 uniqueness (salted two-phase) ---------------------------
    "a5_unique_salted" -> ((s, dir) => {
      Passes.duplicatesSalted(s.read.parquet(t(dir, "lineitem")), "l_orderkey")
        .orderBy("l_orderkey")
    }),
    // ---- §2.4 A1-style aggregation (TPC-H Q1 shape) ----------------------
    "q1_agg_lineitem" -> ((s, dir) => {
      s.read.parquet(t(dir, "lineitem"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n_rows"),
          countDistinct(col("l_orderkey")).as("n_orders"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    // ---- §2.5 J4 referential anti-join (broadcast dim) -------------------
    "j4_ref_lang_dim" -> ((s, dir) => {
      import s.implicits._
      val dim = Seq("en", "de", "fr", "es").toDF("lang")
      Passes.referentialViolations(
          s.read.parquet(t(dir, "documents")), "lang", dim, "lang")
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    }),
    // ---- §2.5 broadcast inner join + aggregate ---------------------------
    "j_join_orders_customer" -> ((s, dir) => {
      val o = s.read.parquet(t(dir, "orders"))
      val c = s.read.parquet(t(dir, "customer"))
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), countDistinct(col("o_custkey")).as("n_cust"))
        .orderBy("c_mktsegment")
    }),
    // ---- set operations ----------------------------------------------------
    "set_except" -> ((s, dir) => {
      val users = s.read.parquet(t(dir, "events")).select(col("user_id")).distinct()
      val custs = s.read.parquet(t(dir, "customer"))
        .where(col("c_custkey") < 100).select(col("c_custkey").as("user_id"))
      users.except(custs).orderBy("user_id")
    }),
    "set_intersect" -> ((s, dir) => {
      val users = s.read.parquet(t(dir, "events")).select(col("user_id")).distinct()
      val custs = s.read.parquet(t(dir, "customer"))
        .where(col("c_custkey") < 100).select(col("c_custkey").as("user_id"))
      users.intersect(custs).orderBy("user_id")
    }),
    // ---- grouping sets / rollup --------------------------------------------
    "agg_rollup" -> ((s, dir) => {
      s.read.parquet(t(dir, "lineitem"))
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),
    // ---- semi join (EXISTS) -------------------------------------------------
    "j_semi_exists" -> ((s, dir) => {
      val c = s.read.parquet(t(dir, "customer"))
      val o = s.read.parquet(t(dir, "orders"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey")).orderBy("c_custkey")
    }),
    // ---- multi-way broadcast join -------------------------------------------
    "j_3way_region" -> ((s, dir) => {
      val r = s.read.parquet(t(dir, "region"))
      val n = s.read.parquet(t(dir, "nation"))
      val c = s.read.parquet(t(dir, "customer"))
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_cust"), countDistinct(col("n_name")).as("n_nations"))
        .orderBy("r_name")
    }),
    // ---- sessionization (lag window over event time) ------------------------
    "w_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      s.read.parquet(t(dir, "events"))
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_session",
          (col("prev_ts").isNull ||
            // fractional epoch seconds (unix_timestamp truncates, DuckDB's
            // epoch() doesn't); TIMESTAMP_NTZ needs the timestamp hop (UTC)
            col("ts").cast("timestamp").cast("double") -
              col("prev_ts").cast("timestamp").cast("double") > 1800.0)
            .cast("long"))
        .groupBy(col("user_id"))
        .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),
    // ---- conditional aggregation --------------------------------------------
    "agg_conditional" -> ((s, dir) => {
      s.read.parquet(t(dir, "documents"))
        .groupBy(col("lang"))
        .agg(sum(when(col("n_chars") > 300, 1L).otherwise(0L)).as("n_long"),
          sum(when(col("n_chars") <= 300, 1L).otherwise(0L)).as("n_short"),
          max(col("n_chars")).as("max_chars"))
        .orderBy("lang")
    }),
    // ---- §2.7 window function --------------------------------------------
    "w_window_topk" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("value").desc, col("event_id"))
      s.read.parquet(t(dir, "events"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 2)
        .select(col("user_id"), col("event_id"), col("rn").cast("int").as("rn"))
        .orderBy("user_id", "rn")
    }),
    // ---- §2.3 scalar function battery -------------------------------------
    "f_scalar_text" -> ((s, dir) => {
      s.read.parquet(t(dir, "documents")).select(
          col("doc_id"),
          length(col("text")).cast("long").as("len"),
          upper(substring(col("text"), 1, 8)).as("head8"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          size(regexp_extract_all(col("text"), lit("data"), lit(0))).cast("long").as("n_data"))
        .orderBy("doc_id")
    }),
    // ---- semi-structured: JSON extraction ---------------------------------
    "json_extract_events" -> ((s, dir) => {
      s.read.parquet(t(dir, "events"))
        .groupBy(col("event_type"))
        .agg(sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    }),
    // ---- time bucketing (batch equivalent of the streaming window) --------
    "t_time_window" -> ((s, dir) => {
      s.read.parquet(t(dir, "events"))
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
        .select(col("day"), col("event_type"), col("n"),
          round(col("sum_value"), 2).as("sum_value"))
        .orderBy("day", "event_type")
    }),
    // ---- §2.7 sketch + drift (KLL UDAF; no SQL oracle — rows-only check) ---
    // oracle-gated on the STABLE columns (counts, thresholds, drift
    // verdicts): the KS/chi2 statistic magnitudes wobble run-to-run with
    // KLL sketch merge order (measured ±0.007 KS / ±4.5 chi2 at sf0.01),
    // so they are deliberately not part of the hash; DriftAndManifestSpec
    // covers their magnitudes against injected drift
    "drift_by_day" -> ((s, dir) => {
      import s.implicits._
      val ev = s.read.parquet(t(dir, "events"))
        .withColumn("part_id", dayofmonth(col("ts")))
      // MARGIN-robust verdicts for the oracle: the KS/chi2 statistic
      // magnitudes wobble with KLL sketch merge order (measured at sf0.01:
      // chi2 ±4-8 per partition across partitionings — one partition's
      // band [21.0, 28.9] STRADDLES the 27.88 threshold, so the raw
      // `stat > threshold` verdict is a coin flip there). 1.5×/1.25×
      // cuts sit ≥13 (chi2) / ≥0.038 (ks) clear of every measured band;
      // the knife-edge production verdicts are exercised by
      // DriftAndManifestSpec's planted-drift tests instead.
      graft.engine.DriftPass.detect(s, ev, "value", "part_id")
        .toDF()
        .select(col("partId"), col("n"), col("ksThreshold"),
          (col("ksStat") > col("ksThreshold") * 1.25).as("ks_clearly_drifted"),
          col("chi2Threshold"),
          (col("chi2Stat") > col("chi2Threshold") * 1.5).as("chi2_clearly_drifted"))
        .orderBy("partId")
    }),
    // ---- §2.4 A9 stats with HyperLogLog++ distinct (engine pass) -----------
    // HLL++ accuracy is oracle-GATED (was rows-only): emit the exact
    // distinct count next to a bound verdict on the estimate (default rsd
    // 5% -> 10% acceptance), so DuckDB can hash-check both — a wildly-off
    // sketch flips hll_within_10pct and fails the compare
    "a9_stats_hll" -> ((s, dir) => {
      val docs = s.read.parquet(t(dir, "documents"))
      val aggs: Seq[Column] = docCols.flatMap { c =>
        Seq(countDistinct(col(c)).as(s"${c}__dist"),
          approx_count_distinct(col(c)).as(s"${c}__adist"))
      }
      val stackExpr = docCols.map(c =>
        s"'$c', ${c}__dist, ${c}__adist").mkString(
        s"stack(${docCols.size}, ", ", ",
        ") as (column, n_distinct, approx_distinct)")
      docs.agg(aggs.head, aggs.tail: _*)
        .select(expr(stackExpr))
        .select(col("column"), col("n_distinct"),
          (abs(col("approx_distinct") - col("n_distinct")).cast("double") /
            col("n_distinct") <= 0.1).as("hll_within_10pct"))
        .orderBy("column")
    }),
    // ---- training-pipeline: exact dedup ------------------------------------
    "dedup_exact" -> ((s, dir) => {
      s.read.parquet(t(dir, "documents"))
        .groupBy(md5(col("text").cast("binary")).as("text_md5"))
        .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keep_id"))
        .where(col("cnt") > 1)
        .orderBy("text_md5")
    }),
    // ---- §2.2-2.4 HEPData nested-table rules over the fixture corpus ------
    // fixture datasets use the CACHED encoders (HepModel/SubModel): implicit
    // derivation re-paid ScalaReflection + serializer construction per call
    "hep_verdicts" -> ((s, dir) => {
      graft.hep.HepDataRules.verdicts(
          s.createDataset(graft.hep.HepFixtures.all)(
            graft.hep.HepModel.hepRowEncoder).toDF())
        .orderBy("file")
    }),
    "hep_violations" -> ((s, dir) => {
      graft.hep.HepDataRules.violations(
          s.createDataset(graft.hep.HepFixtures.all)(
            graft.hep.HepModel.hepRowEncoder).toDF())
        .orderBy("file", "seq")
    }),
    // raw-YAML production path: actual YAML bytes parsed on executors
    // (PyYamlParse → YamlIngest) then the same nested rules — the
    // ingestion surface the 540-case differential corpus pins, oracle-
    // gated end-to-end here
    "raw_yaml_violations" -> ((s, dir) => {
      val rows = s.createDataset(graft.ingest.RawYamlFixtures.docs)(
          graft.hep.HepModel.rawDocEncoder)
        .map { case (f, y) => graft.ingest.YamlIngest.parseDataFile(f, y) }(
          graft.hep.HepModel.hepRowEncoder)
      graft.hep.HepDataRules.violations(rows.toDF()).orderBy("file", "seq")
    }),
    // nested-rule throughput at scale (synthetic corpus; rows-only check)
    "hep_scaled_50k" -> ((s, dir) => {
      graft.hep.HepDataRules.violations(graft.testdata.HepGen.rows(s, 50000))
        .groupBy("phase").count().orderBy("phase")
    }),
    "sub_verdicts" -> ((s, dir) => {
      graft.hep.SubmissionRules.verdicts(
          s.createDataset(graft.hep.SubFixtures.all)(
            graft.hep.SubModel.subFileEncoder).toDF())
        .orderBy("file")
    }),
    // ---- training-pipeline: near-dup dedup family (rows-only checks) -------
    "dedup_minhash" -> ((s, dir) => {
      graft.ops.Dedup.minhashDedup(
          s.read.parquet(t(dir, "documents")), "doc_id", "text", threshold = 0.6)
        .orderBy("id_a", "id_b")
    }),
    "dedup_simhash" -> ((s, dir) => {
      graft.ops.Dedup.simhashDedup(
          s.read.parquet(t(dir, "documents")), "doc_id", "text")
        .orderBy("id_a", "id_b")
    }),
    "dedup_ngram" -> ((s, dir) => {
      graft.ops.Dedup.ngramJaccard(
          s.read.parquet(t(dir, "documents")), "doc_id", "text", threshold = 0.8)
        .orderBy("id_a", "id_b")
    }),
    // Multi-band LSH embedding dedup, DuckDB-verified: the driver embeddings
    // are near-orthogonal (no true pairs above cosine 0.5), so the query
    // derives deterministic planted near-dups (+0.01 per component, pure
    // double arithmetic — bit-identical in DuckDB) and must find EXACTLY the
    // brute-force cosine ≥ 0.99 pairs.
    "dedup_embedding" -> ((s, dir) => {
      val e = s.read.parquet(t(dir, "embeddings"))
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val planted = e.where(col("vec_id") < 50)
        .select((col("vec_id") + 100000).as("vec_id"),
          transform(col("v"), x => x + lit(0.01)).as("v"))
      graft.ops.Dedup.embeddingDedup(e.unionByName(planted), "vec_id", "v",
          threshold = 0.99, nTables = 8, planesPerTable = 12)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
        .orderBy("id_a", "id_b")
    }),
    // ---- similarity search: exact brute-force top-k (DuckDB oracle) --------
    "knn_brute" -> ((s, dir) => {
      val e = s.read.parquet(t(dir, "embeddings"))
      val queries = e.where(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      graft.ops.Similarity.bruteForceTopK(e, "vec_id", "embedding",
          queries, "qid", "qv", k = 5)
        .select(col("query_id"), col("vec_id"),
          round(col("cosine"), 6).as("cosine"), col("rank"))
        .orderBy("query_id", "rank")
    }),
    // ---- similarity search: multi-table LSH ANN (rows-only) ----------------
    "ann_topk" -> ((s, dir) => {
      val e = s.read.parquet(t(dir, "embeddings"))
      val queries = e.where(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      graft.ops.Similarity.annTopK(e, "vec_id", "embedding",
          queries, "qid", "qv", k = 10, nPlanes = 4, nTables = 8)
        .select(col("query_id"), col("vec_id"), col("rank"))
        .orderBy("query_id", "rank")
    }),
    // ---- similarity search: IVF ANN (sampled centroids; rows-only) ---------
    "ivf_topk" -> ((s, dir) => {
      val e = s.read.parquet(t(dir, "embeddings"))
      val queries = e.where(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      graft.ops.Similarity.ivfTopK(e, "vec_id", "embedding",
          queries, "qid", "qv", k = 10, nCells = 16, nprobe = 4)
        .select(col("query_id"), col("vec_id"), col("rank"))
        .orderBy("query_id", "rank")
    }),
    // ---- text analysis: language ID (DuckDB oracle) ------------------------
    "lang_id" -> ((s, dir) => {
      graft.ops.TextOps.languageId(s.read.parquet(t(dir, "documents")), "text")
        .select(col("doc_id"), col("score_de"), col("score_en"),
          col("score_es"), col("score_fr"), col("lang_pred"))
        .orderBy("doc_id")
    }),
    // ---- text analysis: N-language dimension-table language ID (oracle) ----
    "lang_id_dim" -> ((s, dir) => {
      val langs = graft.ops.TextOps.ExtendedStopwordSets.keys.toSeq.sorted
      graft.ops.TextOps.languageIdDim(
          s.read.parquet(t(dir, "documents")).select("doc_id", "text"), "text")
        .select((col("doc_id") +: langs.map(l => col(s"score_$l"))) :+ col("lang_pred"): _*)
        .orderBy("doc_id")
    }),
    // ---- text analysis: fingerprints + BPE-ish token counts (oracle) -------
    "text_fingerprint" -> ((s, dir) => {
      val df = s.read.parquet(t(dir, "documents"))
      graft.ops.TextOps.tokenCounts(
          graft.ops.TextOps.fingerprint(df, "text"), "text")
        .select(col("doc_id"), col("content_md5"), col("ws_tokens"),
          col("bpeish_tokens"))
        .orderBy("doc_id")
    }),
    // ---- multimodal plumbing: batched decode of binary media (rows-only) ---
    "multimodal_decode" -> ((s, dir) => {
      val media = s.read.parquet(t(dir, "documents"))
        .select(col("doc_id").as("id"),
          concat(lit("HDR0"), sha2(col("text").cast("binary"), 256))
            .cast("binary").as("media"))
      graft.ops.Multimodal.decodeAndFeaturize(media, "id", "media")
        .toDF()
        .select(col("id"), col("meta.format"), col("meta.width"),
          col("meta.height"), col("meta.nBytes"), col("meta.valid"),
          round(element_at(col("features"), 1).cast("double"), 4).as("f0"))
        .orderBy("id")
    }),
    // ---- custom JSON-Schema validation (data_file_validator.py:117-132):
    // documents rendered to JSON and validated against a user schema
    // compiled to a Catalyst expression; messages in jsonschema grammar ----
    // ---- J5b: RECURSIVE custom schema + unevaluatedProperties through the
    // distributed expression path (round-4 surface: $ref cyclic graphs,
    // unevaluated*) — deterministic JSON built from doc_id arithmetic,
    // grouped to (message, n, doc range); golden-VALUES oracle ------------
    "custom_schema_recursive" -> ((s, dir) => {
      val schema = graft.spec.JsonSchema.compile(
        """{"$defs": {"node": {"type": "object",
           |  "properties": {"v": {"type": "number"},
           |    "kids": {"type": "array", "items": {"$ref": "#/$defs/node"}}},
           |  "required": ["v"], "unevaluatedProperties": false}},
           |"$ref": "#/$defs/node"}""".stripMargin)
      val d = col("doc_id")
      val v = when(d % 3 === 0, lit("\"s\"")).otherwise((d % 7).cast("string"))
      val kid = when(d % 5 === 0, lit("""{"v": 1, "extra": 2}"""))
        .when(d % 7 === 0, lit("""{"kids": []}"""))
        .otherwise(lit("""{"v": 3}"""))
      val docs = s.read.parquet(t(dir, "documents"))
        .select(d,
          concat(lit("""{"v": """), v, lit(""", "kids": ["""), kid, lit("]}"))
            .as("json"),
          lit("tree").as("schemaType"))
      graft.compile.CustomSchemas.violations(
          docs, "doc_id", "json", "schemaType", Seq("tree" -> schema))
        .groupBy(col("message"))
        .agg(count(lit(1)).as("n"),
          min(col("file")).as("min_doc"), max(col("file")).as("max_doc"))
        .orderBy("message")
    }),
    "custom_schema_docs" -> ((s, dir) => {
      val schema = graft.spec.JsonSchema.compile(
        """{"$schema": "http://json-schema.org/draft-04/schema#",
           |"type": "object",
           |"properties": {"doc_id": {"type": "integer"},
           |               "lang": {"type": "string",
           |                        "enum": ["en", "de", "fr", "es", "zh"]},
           |               "n_chars": {"type": "integer", "minimum": 50}},
           |"required": ["doc_id", "lang", "n_chars"],
           |"additionalProperties": false}""".stripMargin)
      val docs = s.read.parquet(t(dir, "documents"))
        .select(col("doc_id"),
          to_json(struct(col("doc_id"), col("lang"), col("n_chars"))).as("json"),
          lit("webdoc").as("schemaType"))
      graft.compile.CustomSchemas.violations(
          docs, "doc_id", "json", "schemaType", Seq("webdoc" -> schema))
        .withColumnRenamed("file", "doc_id")
        .orderBy("doc_id", "seq")
    }),
    // ---- training-pipeline: token counting + quality signals ---------------
    "text_quality" -> ((s, dir) => {
      val stop = Seq("the", "a", "of", "and", "to", "in")
      val toks = split(col("text"), " ")
      s.read.parquet(t(dir, "documents")).select(
          col("doc_id"),
          size(toks).cast("long").as("n_tokens"),
          size(filter(toks, x => x.isin(stop.map(lit): _*))).cast("long").as("n_stop"),
          (size(filter(toks, x => x.isin(stop.map(lit): _*))).cast("double") /
            size(toks)).as("stop_ratio"))
        .orderBy("doc_id")
    }))

  private def resourceSql(name: String): String = {
    val in = getClass.getResourceAsStream(s"/oracles/$name.sql")
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  def oracleSql: Map[String, String] = {
    val statsUnion = docCols.map { c =>
      s"""SELECT '$c' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
         | CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         | CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS null_rate,
         | min(CAST($c AS VARCHAR)) AS min_str, max(CAST($c AS VARCHAR)) AS max_str,
         | CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct FROM documents""".stripMargin.replaceAll("\n", " ")
    }.mkString(" UNION ALL ")
    Map(
      "s1_scan_filter" ->
        "SELECT doc_id, lang, n_chars FROM documents WHERE n_chars BETWEEN 100 AND 200 ORDER BY doc_id",
      "p_rules_documents" -> ("""
        SELECT * FROM (
          SELECT source, doc_id, CAST(1 AS INT) AS rule_seq, 'minimum:n_chars' AS rule_id,
                 'n_chars' AS "column", 'error' AS level,
                 CAST(n_chars AS VARCHAR) || ' is less than the minimum of 50 in ''n_chars''' AS message
          FROM documents WHERE n_chars < 50
          UNION ALL
          SELECT source, doc_id, CAST(2 AS INT), 'max_length:text', 'text', 'error',
                 '''' || text || ''' is too long (maxLength: 400) in ''text'''
          FROM documents WHERE length(text) > 400
        ) ORDER BY doc_id, rule_seq""").replaceAll("\\s+", " ").trim,
      "a7_verdict_by_source" -> ("""
        SELECT s.source, COALESCE(v.n, 0) AS n_violations, COALESCE(v.n, 0) = 0 AS pass
        FROM (SELECT DISTINCT source FROM documents) s
        LEFT JOIN (SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents
                   WHERE n_chars < 50 OR length(text) > 400 GROUP BY source) v USING (source)
        ORDER BY s.source""").replaceAll("\\s+", " ").trim,
      "a9_stats_exact" ->
        (s"""SELECT * FROM ($statsUnion) ORDER BY "column""""),
      "a5_unique_salted" ->
        "SELECT l_orderkey, CAST(count(*) AS BIGINT) AS cnt FROM lineitem GROUP BY l_orderkey HAVING count(*) > 1 ORDER BY l_orderkey",
      "q1_agg_lineitem" -> ("""
        SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""").replaceAll("\\s+", " ").trim,
      "j4_ref_lang_dim" ->
        "SELECT doc_id, lang FROM documents WHERE lang IS NOT NULL AND lang NOT IN ('en','de','fr','es') ORDER BY doc_id",
      "j_join_orders_customer" -> ("""
        SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment""").replaceAll("\\s+", " ").trim,
      "set_except" -> ("""
        SELECT * FROM (
          SELECT DISTINCT user_id FROM events
          EXCEPT
          SELECT c_custkey AS user_id FROM customer WHERE c_custkey < 100
        ) ORDER BY user_id""").replaceAll("\\s+", " ").trim,
      "set_intersect" -> ("""
        SELECT * FROM (
          SELECT DISTINCT user_id FROM events
          INTERSECT
          SELECT c_custkey AS user_id FROM customer WHERE c_custkey < 100
        ) ORDER BY user_id""").replaceAll("\\s+", " ").trim,
      "agg_rollup" -> ("""
        SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
               sum(l_quantity) AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""").replaceAll("\\s+", " ").trim,
      "j_semi_exists" -> ("""
        SELECT c_custkey FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        ORDER BY c_custkey""").replaceAll("\\s+", " ").trim,
      "j_3way_region" -> ("""
        SELECT r_name, CAST(count(*) AS BIGINT) AS n_cust,
               CAST(count(DISTINCT n_name) AS BIGINT) AS n_nations
        FROM customer JOIN nation ON c_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name""").replaceAll("\\s+", " ").trim,
      "w_sessionize" -> ("""
        SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
               CAST(count(*) AS BIGINT) AS n_events
        FROM (
          SELECT user_id,
                 CASE WHEN prev_ts IS NULL
                        OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END AS new_session
          FROM (SELECT user_id, ts, event_id,
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
                FROM events))
        GROUP BY user_id ORDER BY user_id""").replaceAll("\\s+", " ").trim,
      "agg_conditional" -> ("""
        SELECT lang,
               CAST(sum(CASE WHEN n_chars > 300 THEN 1 ELSE 0 END) AS BIGINT) AS n_long,
               CAST(sum(CASE WHEN n_chars <= 300 THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
               max(n_chars) AS max_chars
        FROM documents GROUP BY lang ORDER BY lang""").replaceAll("\\s+", " ").trim,
      "w_window_topk" -> ("""
        SELECT user_id, event_id, CAST(rn AS INT) AS rn FROM (
          SELECT user_id, event_id,
                 row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
          FROM events) WHERE rn <= 2 ORDER BY user_id, rn""").replaceAll("\\s+", " ").trim,
      "f_scalar_text" -> ("""
        SELECT doc_id, CAST(length(text) AS BIGINT) AS len,
               upper(substring(text, 1, 8)) AS head8,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(len(regexp_extract_all(text, 'data')) AS BIGINT) AS n_data
        FROM documents ORDER BY doc_id""").replaceAll("\\s+", " ").trim,
      "json_extract_events" -> ("""
        SELECT event_type, CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY event_type ORDER BY event_type""").replaceAll("\\s+", " ").trim,
      "t_time_window" -> ("""
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
               CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY day, event_type""").replaceAll("\\s+", " ").trim,
      "dedup_exact" -> ("""
        SELECT md5(text) AS text_md5, CAST(count(*) AS BIGINT) AS cnt,
               min(doc_id) AS keep_id
        FROM documents GROUP BY md5(text) HAVING count(*) > 1 ORDER BY text_md5""").replaceAll("\\s+", " ").trim,
      // golden-constant oracle: expected verdicts of the translated
      // reference fixture corpus (counts pinned by HepDataRulesSpec)
      "hep_verdicts" -> ("""
        SELECT * FROM (VALUES
          ('binning_average.yaml', CAST(1 AS BIGINT), false),
          ('empty_file.yaml', CAST(1 AS BIGINT), false),
          ('file_with_inconsistent_values.yaml', CAST(1 AS BIGINT), false),
          ('file_with_zero_uncertainty.yaml', CAST(1 AS BIGINT), false),
          ('invalid_error_abort.yaml', CAST(1 AS BIGINT), false),
          ('invalid_error_asym_missing.yaml', CAST(2 AS BIGINT), false),
          ('invalid_error_asym_object.yaml', CAST(1 AS BIGINT), false),
          ('invalid_error_member_types.yaml', CAST(5 AS BIGINT), false),
          ('invalid_error_oneof.yaml', CAST(6 AS BIGINT), false),
          ('invalid_error_plus_list.yaml', CAST(1 AS BIGINT), false),
          ('invalid_error_stale.yaml', CAST(5 AS BIGINT), false),
          ('invalid_error_sym_list.yaml', CAST(1 AS BIGINT), false),
          ('invalid_file.yaml', CAST(5 AS BIGINT), false),
          ('invalid_independent_variables_file.yaml', CAST(10 AS BIGINT), false),
          ('invalid_missing_values.yaml', CAST(1 AS BIGINT), false),
          ('valid_data_with_percent.yaml', CAST(0 AS BIGINT), true),
          ('valid_data_with_zero_percent.yaml', CAST(1 AS BIGINT), false),
          ('valid_file.yaml', CAST(0 AS BIGINT), true)
        ) AS t(file, n_violations, pass) ORDER BY file""").replaceAll("\\s+", " ").trim,
      "sub_verdicts" -> ("""
        SELECT * FROM (VALUES
          ('invalid_cmenergies.yaml', CAST(1 AS BIGINT), false),
          ('invalid_submission.yaml', CAST(3 AS BIGINT), false),
          ('invalid_submission_doi.yaml', CAST(6 AS BIGINT), false),
          ('invalid_submission_duplicates.yaml', CAST(2 AS BIGINT), false),
          ('invalid_submission_keyword.yaml', CAST(1 AS BIGINT), false),
          ('invalid_submission_license.yaml', CAST(3 AS BIGINT), false),
          ('invalid_submission_recid.yaml', CAST(4 AS BIGINT), false),
          ('valid_file.yaml', CAST(1 AS BIGINT), false),
          ('valid_submission_empty.yaml', CAST(0 AS BIGINT), true),
          ('valid_submission_related.yaml', CAST(0 AS BIGINT), true)
        ) AS t(file, n_violations, pass) ORDER BY file""").replaceAll("\\s+", " ").trim,
      "knn_brute" -> ("""
        SELECT query_id, vec_id, cosine, CAST(rank AS INT) AS rank FROM (
          SELECT q.vec_id AS query_id, c.vec_id,
                 round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                              CAST(c.embedding AS DOUBLE[])), 6) AS cosine,
                 row_number() OVER (PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                                   CAST(c.embedding AS DOUBLE[])) DESC,
                            c.vec_id) AS rank
          FROM embeddings q, embeddings c
          WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id)
        WHERE rank <= 5 ORDER BY query_id, rank""").replaceAll("\\s+", " ").trim,
      "lang_id" -> ("""
        SELECT doc_id, s_de AS score_de, s_en AS score_en, s_es AS score_es,
               s_fr AS score_fr,
               CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
                    WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                    WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                    WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                    ELSE 'fr' END AS lang_pred
        FROM (SELECT doc_id,
          CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x IN ('der','die','das','und','ist','nicht','mit','ein','zu','den'))) AS BIGINT) AS s_de,
          CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x IN ('the','and','of','to','in','is','that','for','with','a'))) AS BIGINT) AS s_en,
          CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x IN ('el','la','los','y','es','no','por','para','una','con'))) AS BIGINT) AS s_es,
          CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x IN ('le','la','les','et','est','pas','pour','dans','une','que'))) AS BIGINT) AS s_fr
          FROM documents) ORDER BY doc_id""").replaceAll("\\s+", " ").trim,
      "text_fingerprint" -> ("""
        SELECT doc_id,
               md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS content_md5,
               CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS ws_tokens,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS bpeish_tokens
        FROM documents ORDER BY doc_id""").replaceAll("\\s+", " ").trim,
      "text_quality" -> ("""
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the','a','of','and','to','in'))) AS BIGINT) AS n_stop,
               CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the','a','of','and','to','in'))) AS DOUBLE)
                 / len(string_split(text, ' ')) AS stop_ratio
        FROM documents ORDER BY doc_id""").replaceAll("\\s+", " ").trim,
      // generated from the SAME ExtendedStopwordSets dimension as the query
      "lang_id_dim" -> {
        val dim = graft.ops.TextOps.ExtendedStopwordSets
        val langs = dim.keys.toSeq.sorted
        val scoreSelects = langs.map { l =>
          val words = dim(l).map(w => s"'$w'").mkString(", ")
          s"CAST(len(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x IN ($words))) AS BIGINT) AS s_$l"
        }.mkString(", ")
        val g = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
        val caseChain = langs.map(l => s"WHEN s_$l = $g THEN '$l'").mkString(" ")
        s"""SELECT doc_id, ${langs.map(l => s"s_$l AS score_$l").mkString(", ")},
           | CASE WHEN $g = 0 THEN 'und' $caseChain END AS lang_pred
           | FROM (SELECT doc_id, $scoreSelects FROM documents)
           | ORDER BY doc_id""".stripMargin.replaceAll("\n", " ")
      },
      // brute-force word-3-shingle Jaccard over all pairs — the LSH result
      // must equal the exact answer at this scale (all true pairs sit at
      // J ≥ 0.9, far above the banding's miss region)
      "dedup_minhash" -> ("""
        WITH s AS (
          SELECT doc_id, list_distinct(
            CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                 ELSE list_transform(generate_series(1, len(toks)-2), i -> array_to_string(toks[i:i+2], ' ')) END) AS sh
          FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks FROM documents))
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
        FROM s a, s b
        WHERE a.doc_id < b.doc_id
          AND len(list_intersect(a.sh, b.sh))
                >= 0.6 * len(list_distinct(list_concat(a.sh, b.sh)))
        ORDER BY id_a, id_b""").replaceAll("\\s+", " ").trim,
      // brute-force char-4-gram Jaccard (Spark verifies over xxhash64'd
      // n-gram sets — identical Jaccard, no collisions at this scale)
      "dedup_ngram" -> ("""
        WITH s AS (
          SELECT doc_id, list_distinct(
            CASE WHEN length(text) < 4 THEN [text]
                 ELSE list_transform(generate_series(1, length(text)-3), i -> substring(text, i, 4)) END) AS g
          FROM documents)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.g, b.g))) AS jaccard
        FROM s a, s b
        WHERE a.doc_id < b.doc_id
          AND len(list_intersect(a.g, b.g))
                >= 0.8 * len(list_distinct(list_concat(a.g, b.g)))
        ORDER BY id_a, id_b""").replaceAll("\\s+", " ").trim,
      // golden-constant oracle: byte-exact violation corpus of the translated
      // reference fixtures (also pinned by HepDataRulesSpec); stored as a
      // resource — 21 rows of VALUES
      "hep_violations" -> resourceSql("hep_violations"),
      // golden-constant oracle: raw YAML bytes → executor-side ingester →
      // rules; messages are byte-pinned (generated by
      // tools/pin_values_oracle.py from a verified run; the ingestion
      // semantics themselves are pinned by the 540-case differential
      // corpora in YamlIngestConformanceSpec / RawSubmissionConformanceSpec)
      "raw_yaml_violations" -> resourceSql("raw_yaml_violations"),
      // golden-VALUES pins for the computations that are genuinely not
      // SQL-expressible (LSH/IVF candidate generation, SimHash signatures,
      // KLL drift verdicts): output on the seeded test data is a
      // deterministic constant (Verify ran twice and matched byte-for-byte
      // on these), the VALUES were generated from a verified run
      // (tools/pin_values_oracle.py), and semantic correctness is anchored
      // by the recall-vs-exact / planted-pair / drift-injection ScalaTests
      "ann_topk" -> resourceSql("ann_topk"),
      "ivf_topk" -> resourceSql("ivf_topk"),
      "dedup_simhash" -> resourceSql("dedup_simhash"),
      "drift_by_day" -> resourceSql("drift_by_day"),
      // exact distincts + a literal-true bound verdict: the Spark side
      // recomputes hll_within_10pct from the live HLL++ estimate, so an
      // out-of-bounds sketch hash-mismatches against this oracle
      "a9_stats_hll" -> (docCols.map { c =>
        s"""SELECT '$c' AS "column", CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           | true AS hll_within_10pct FROM documents""".stripMargin
          .replaceAll("\n", " ")
      }.mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY \"column\"")),
      // golden-constant oracle: deterministic synthetic corpus phase counts
      // (phase 0 = the 496 id%101 structural oneOf residues)
      "hep_scaled_50k" -> ("""
        SELECT * FROM (VALUES (CAST(0 AS INT), CAST(496 AS BIGINT)),
                              (CAST(1 AS INT), CAST(1681 AS BIGINT)),
                              (CAST(2 AS INT), CAST(633 AS BIGINT)))
        AS t(phase, "count") ORDER BY phase""").replaceAll("\\s+", " ").trim,
      // the stub decoder is deterministic byte math over 'HDR0'+sha256hex —
      // fully SQL-expressible (media bytes are ASCII; width is the constant
      // int32('HDR0') % 4096 = 560; height is the low 12 bits of hex chars
      // 3-4; f0 replays the double accumulation and the final float cast)
      "multimodal_decode" -> ("""
        WITH m AS (SELECT doc_id AS id, 'HDR0' || sha256(text) AS media FROM documents)
        SELECT id, 'fake/v1' AS format, 560 AS width,
               (ascii(substr(media, 7, 1)) % 16) * 256 + ascii(substr(media, 8, 1)) AS height,
               CAST(68 AS BIGINT) AS nBytes, true AS valid,
               round(CAST(CAST(list_sum(list_transform(generate_series(1, 68, 8),
                   i -> ascii(substr(media, i, 1)) / 255.0)) / 68 * 8 AS REAL) AS DOUBLE), 4) AS f0
        FROM m ORDER BY id""").replaceAll("\\s+", " ").trim,
      // jsonschema-grammar messages over the documents table: enum + minimum
      // violations in properties-walk order (lang before n_chars)
      // the recursive-schema violations are pure doc_id arithmetic
      // (d%3 -> string v, d%5 -> extra key, else d%7 -> missing v), so
      // DuckDB derives counts + doc ranges live; messages are literals
      // with doubled quotes
      "custom_schema_recursive" -> {
        val nodeRepr = "{''type'': ''object'', ''properties'': {''v'': " +
          "{''type'': ''number''}, ''kids'': {''type'': ''array'', " +
          "''items'': {''$ref'': ''#/$defs/node''}}}, ''required'': " +
          "[''v''], ''unevaluatedProperties'': False}"
        ("""WITH d AS (SELECT doc_id FROM documents)
           |SELECT * FROM (
           |  SELECT '''s'' is not of type ''number'' in ''v'' (expected: {''type'': ''number''})' AS message,
           |    CAST(count(*) AS BIGINT) AS n, min(doc_id) AS min_doc, max(doc_id) AS max_doc
           |  FROM d WHERE doc_id % 3 = 0
           |  UNION ALL
           |  SELECT '''v'' is a required property in ''kids[0]'' (expected: NODE)' ,
           |    CAST(count(*) AS BIGINT), min(doc_id), max(doc_id)
           |  FROM d WHERE doc_id % 7 = 0 AND doc_id % 5 <> 0
           |  UNION ALL
           |  SELECT 'Unevaluated properties are not allowed (''extra'' was unexpected) in ''kids[0]'' (expected: NODE)',
           |    CAST(count(*) AS BIGINT), min(doc_id), max(doc_id)
           |  FROM d WHERE doc_id % 5 = 0
           |) ORDER BY message""".stripMargin
          .replace("NODE", nodeRepr).replaceAll("\\s+", " ").trim)
      },
      "custom_schema_docs" -> ("""
        WITH v AS (
          SELECT doc_id,
            CASE WHEN lang NOT IN ('en','de','fr','es','zh') THEN 1 ELSE 0 END AS lang_bad,
            CASE WHEN n_chars < 50 THEN 1 ELSE 0 END AS min_bad, lang, n_chars
          FROM documents)
        SELECT doc_id, seq, message FROM (
          SELECT doc_id, 0 AS seq,
                 '''' || lang || ''' is not one of [''en'', ''de'', ''fr'', ''es'', ''zh''] in ''lang'' (expected: {''type'': ''string'', ''enum'': [''en'', ''de'', ''fr'', ''es'', ''zh'']})' AS message
          FROM v WHERE lang_bad = 1
          UNION ALL
          SELECT doc_id, lang_bad AS seq,
                 CAST(n_chars AS VARCHAR) || ' is less than the minimum of 50 in ''n_chars'' (expected: {''type'': ''integer'', ''minimum'': 50})'
          FROM v WHERE min_bad = 1
        ) ORDER BY doc_id, seq""").replaceAll("\\s+", " ").trim,
      // brute-force cosine over originals + deterministically planted
      // near-dups (v + 0.01 per component, double arithmetic on both sides)
      "dedup_embedding" -> ("""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             p AS (SELECT vec_id + 100000 AS vec_id, list_transform(v, x -> x + 0.01) AS v
                   FROM e WHERE vec_id < 50),
             allv AS (SELECT * FROM e UNION ALL SELECT * FROM p)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(a.v, b.v), 6) AS cosine
        FROM allv a, allv b
        WHERE a.vec_id < b.vec_id AND list_cosine_similarity(a.v, b.v) >= 0.99
        ORDER BY id_a, id_b""").replaceAll("\\s+", " ").trim)
  }
}
