package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only equivalence probe: asserts a rewritten kernel is BIT-identical
  * to its pure-Column spec on the real driver data before trusting it
  * (optimization-round rule: prove equivalence, then optimize). */
object EquivProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .appName("graft-equiv")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // float×float: full cross of 50 queries × corpus
    val q = e.where(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val crossF = e.select(col("vec_id"), col("embedding").as("cv")).join(broadcast(q))
    val badF = crossF.select(
        graft.ops.Similarity.cosineSpec(col("qv"), col("cv")).as("spec"),
        graft.ops.Similarity.cosine(col("qv"), col("cv")).as("native"))
      .where(not(col("spec") <=> col("native"))).count()
    println(s"[equiv] cosine float mismatches: $badF")

    // double×double incl. the planted +0.01 transform (dedup_embedding shape)
    val d = e.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val planted = d.where(col("vec_id") < 50)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("v"), x => x + lit(0.01)).as("v"))
    val allD = d.unionByName(planted)
    val qd = allD.where(col("vec_id") < 60).select(col("vec_id").as("qid"), col("v").as("qv"))
    val badD = allD.select(col("v").as("cv")).join(broadcast(qd))
      .select(graft.ops.Similarity.cosineSpec(col("qv"), col("cv")).as("spec"),
        graft.ops.Similarity.cosine(col("qv"), col("cv")).as("native"))
      .where(not(col("spec") <=> col("native"))).count()
    println(s"[equiv] cosine double mismatches: $badD")

    // null / length-mismatch semantics
    import spark.implicits._
    val edge = Seq(
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0, 2.0, 3.0)),
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0))
    ).toDF("a", "b")
    val badE = edge.select(
        graft.ops.Similarity.cosineSpec(col("a"), col("b")).as("spec"),
        graft.ops.Similarity.cosine(col("a"), col("b")).as("native"))
      .where(not(col("spec") <=> col("native"))).count()
    println(s"[equiv] cosine edge mismatches: $badE")

    // zero-norm vectors: BOTH formulations must throw ANSI DIVIDE_BY_ZERO
    def throws(f: => Unit): Boolean =
      try { f; false } catch { case _: ArithmeticException => true
        case e: org.apache.spark.SparkException
          if e.getMessage.contains("DIVIDE_BY_ZERO") => true }
    val zero = Seq((Seq(0.0, 0.0), Seq(1.0, 2.0))).toDF("a", "b")
    val specThrows = throws(zero.select(
      graft.ops.Similarity.cosineSpec(col("a"), col("b"))).collect())
    val nativeThrows = throws(zero.select(
      graft.ops.Similarity.cosine(col("a"), col("b"))).collect())
    println(s"[equiv] zero-norm: spec throws=$specThrows native throws=$nativeThrows")

    // languageId: kernel path vs the pure-Column per-language filter spec
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val a = graft.ops.TextOps.languageId(docs, "text")
    val b = graft.ops.TextOps.languageIdSpec(docs, "text")
    assert(a.columns.sameElements(b.columns), "languageId column sets differ")
    val mismatch = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"[equiv] languageId kernel-vs-spec mismatches: $mismatch")

    // languageIdDim: native LangPred argmax vs the Column when-chain spec
    val da = graft.ops.TextOps.languageIdDim(docs.select("doc_id", "text"), "text")
    val db = graft.ops.TextOps.languageIdDimSpec(docs.select("doc_id", "text"), "text")
    assert(da.columns.sameElements(db.columns), "languageIdDim column sets differ")
    val dimMismatch = da.exceptAll(db).count() + db.exceptAll(da).count()
    println(s"[equiv] languageIdDim pred kernel-vs-spec mismatches: $dimMismatch")

    // text kernels: WsTokenCount/BpeishTokenCount/NormalizedMd5 vs specs
    // on the real documents plus a nasty-edge corpus
    val edgeTexts = Seq(
      "", " ", "  ", "\ta b", "a b ", " a\tb\nc ", "a", "123abc!?",
      "ħĸλ Ωμ", "écolé", " nbsp", "日本語 テスト", "ab\fc\rd",
      "mixed 字 x9 -- 😀 emoji", "😀😁",
      "UPPER lower MiXeD", "ΣΊΣΥΦΟΣ", "İstanbul", "ẞharp")
      .zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("doc_id", "text")
    for ((label, d) <- Seq(("docs", docs.select(col("doc_id"), col("text"))),
        ("edge", edgeTexts))) {
      val tk = graft.ops.TextOps.tokenCounts(d, "text")
        .select(col("doc_id"), col("ws_tokens"), col("bpeish_tokens"))
      val ts = graft.ops.TextOps.tokenCountsSpec(d, "text")
        .select(col("doc_id"), col("ws_tokens"), col("bpeish_tokens"))
      val tBad = tk.exceptAll(ts).count() + ts.exceptAll(tk).count()
      val fk = graft.ops.TextOps.fingerprint(d, "text")
        .select(col("doc_id"), col("content_md5"))
      val fs = graft.ops.TextOps.fingerprintSpec(d, "text")
        .select(col("doc_id"), col("content_md5"))
      val fBad = fk.exceptAll(fs).count() + fs.exceptAll(fk).count()
      println(s"[equiv] text kernels ($label): tokenCounts=$tBad fingerprint=$fBad")
      if (tBad > 0) {
        val joined = tk.withColumnRenamed("ws_tokens", "wsK")
          .withColumnRenamed("bpeish_tokens", "bpK")
          .join(ts.withColumnRenamed("ws_tokens", "wsS")
            .withColumnRenamed("bpeish_tokens", "bpS"), Seq("doc_id"))
          .where(col("wsK") =!= col("wsS") || col("bpK") =!= col("bpS"))
        joined.join(d, Seq("doc_id")).select("doc_id", "text", "wsK", "wsS", "bpK", "bpS")
          .collect().foreach(r => println(s"  [equivdbg] ${r}"))
      }
    }

    // HepGen: Column generator vs the Dataset.map closure spec
    val g1 = graft.testdata.HepGen.rows(spark, 50000)
    val g2 = graft.testdata.HepGen.rowsSpec(spark, 50000)
    println(s"[equiv] hepgen schema match: ${g1.schema.sql == g2.schema.sql}" +
      (if (g1.schema.sql != g2.schema.sql)
        s"\n  native: ${g1.schema.sql}\n  spec:   ${g2.schema.sql}" else ""))
    val j1 = g1.select(to_json(struct(g1.columns.map(col): _*))).collect().map(_.getString(0)).sorted
    val j2 = g2.select(to_json(struct(g2.columns.map(col): _*))).collect().map(_.getString(0)).sorted
    val genBad = j1.zip(j2).count { case (x, y) => x != y } +
      math.abs(j1.length - j2.length)
    println(s"[equiv] hepgen row mismatches: $genBad of ${j1.length}")
    if (genBad > 0) j1.zip(j2).find { case (x, y) => x != y }.foreach { case (x, y) =>
      println(s"  native: ${x.take(400)}")
      println(s"  spec:   ${y.take(400)}")
    }
    spark.stop()
  }
}
