package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.PageValidator
import graft.streaming.StreamingValidator
import graft.testdata.PagesGen

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val N = 4000L

  def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$name").toString

  /** Stage dirty pages as a file-stream source. */
  lazy val stagingDir: String = {
    val dir = tmp("stream_src")
    PagesGen.pages(spark, N, "dirty").write.mode("overwrite").parquet(dir)
    dir
  }
  lazy val pagesSchema = spark.read.parquet(stagingDir).schema
  def spec = PageValidator.pageSpec(PagesGen.Langs, htmlMaxBytes = 10000)

  test("streaming violations match the batch result (same compiled plan)") {
    val stream = spark.readStream.schema(pagesSchema).parquet(stagingDir)
    val q = StreamingValidator.violationStream(spec, stream)
      .writeStream.format("memory").queryName("stream_viol")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.sql("select * from stream_viol").count()
    val batch = graft.compile.ConstraintCompiler
      .violations(spec, spark.read.parquet(stagingDir)).count()
    assert(streamed === batch && batch > 0)
  }

  test("watermarked windowed violation counts emit per-window rows") {
    val stream = spark.readStream.schema(pagesSchema).parquet(stagingDir)
    val q = StreamingValidator.windowedViolationCounts(
        spec, stream, "warc_ts", windowLen = "30 days",
        watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("stream_win")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val rows = spark.sql("select * from stream_win").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_violations")).sum > 0)
  }

  test("stateful first-seen dedup counts duplicates once") {
    val stream = spark.readStream.schema(pagesSchema).parquet(stagingDir)
    val q = StreamingValidator.firstSeenWithState(spark,
        stream.where(col("url").isNotNull), "url")
      .writeStream.format("memory").queryName("stream_seen")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val out = spark.sql("select * from stream_seen")
    val hot = out.where("key = 'https://h0.example.org/p/hot'").collect()
    assert(hot.length === 1)
    assert(hot(0).getAs[Long]("timesSeen") > 1) // the planted hot duplicate
    assert(hot(0).getAs[Boolean]("firstSeen")) // first batch containing it
  }

  test("foreachBatch incremental validation appends checkpointed manifest rows") {
    val manifest = tmp("stream_manifest") + "/m"
    val ckpt = tmp("stream_ckpt")
    val stream = spark.readStream.schema(pagesSchema).parquet(stagingDir)
    val q = StreamingValidator.runIncremental(spark, stream, spec,
      manifest, ckpt, snapshotId = 7L)
    q.processAllAvailable()
    q.stop()
    val m = graft.report.Manifest.read(spark, manifest)
    assert(m.count() === PagesGen.NumParts)
    assert(m.where("snapshot_id = 7 and status = 'done'").count() ===
      PagesGen.NumParts)
    assert(m.agg(sum("violations")).collect()(0).getLong(0) > 0)
    assert(m.select("lineage").distinct().collect()
      .map(_.getString(0)).forall(_.startsWith("stream batch=")))
  }
}
