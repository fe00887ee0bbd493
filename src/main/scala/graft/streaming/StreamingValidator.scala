package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.compile.ConstraintCompiler
import graft.spec.TableSpec

/** Structured-Streaming face of the engine (SURVEY.md §2.7).
  *
  * The compiled row-rule scan is STATELESS — the exact same Catalyst
  * expressions run unchanged on a streaming DataFrame, so per-batch
  * validation is `violations(spec, stream)` with zero extra code. The
  * stateful pieces use the standard streaming operators:
  *  - [[dedupStream]]: first-seen url dedup via `dropDuplicates` +
  *    watermark (state store backed, scales with the state store);
  *  - [[firstSeenWithState]]: the same semantics spelled out with
  *    `mapGroupsWithState` for custom-state extensions;
  *  - [[windowedViolationCounts]]: watermarked tumbling-window violation
  *    counts per partition;
  *  - [[runIncremental]]: `foreachBatch` bridge into the batch engine +
  *    manifest, mirroring the reference's batch-at-a-time orchestration
  *    with checkpointed resume.
  */
object StreamingValidator {

  /** Row-rule violations on a streaming DataFrame — same compiled plan as
    * batch (ConstraintCompiler is stateless). */
  def violationStream(spec: TableSpec, stream: DataFrame): DataFrame =
    ConstraintCompiler.violations(spec, stream)

  /** First-seen deduplication over the stream. Watermark bounds the state:
    * urls older than the delay are evicted (exactly the bounded-state
    * tradeoff a 10^12-doc stream needs). */
  def dedupStream(stream: DataFrame, tsCol: String, keyCol: String,
      watermarkDelay: String = "1 hour"): DataFrame =
    stream.withWatermark(tsCol, watermarkDelay)
      .dropDuplicates(keyCol, tsCol)

  final case class SeenUpdate(key: String, firstSeen: Boolean, timesSeen: Long)

  /** mapGroupsWithState variant: emits (key, firstSeen, timesSeen) per
    * batch — the shape to extend when dedup needs custom state (e.g.
    * keep-best-by-quality instead of keep-first). */
  def firstSeenWithState(spark: SparkSession, stream: DataFrame,
      keyCol: String): DataFrame = {
    import spark.implicits._
    stream.select(col(keyCol).cast("string")).as[String]
      .groupByKey(identity)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[String], state: GroupState[Long]) =>
          val prev = state.getOption.getOrElse(0L)
          val n = rows.size
          state.update(prev + n)
          SeenUpdate(key, firstSeen = prev == 0, timesSeen = prev + n)
      }.toDF()
  }

  /** Watermarked tumbling-window violation counts per partition. */
  def windowedViolationCounts(spec: TableSpec, stream: DataFrame,
      tsCol: String, windowLen: String = "10 minutes",
      watermarkDelay: String = "30 minutes"): DataFrame = {
    val withTs = stream.withWatermark(tsCol, watermarkDelay)
    val failing = withTs.where(!ConstraintCompiler.rowPasses(spec))
    failing.groupBy(window(col(tsCol), windowLen),
        col(spec.partitionColumn))
      .agg(count(lit(1)).as("n_violations"))
  }

  /** foreachBatch bridge: every micro-batch runs the BATCH validator and
    * appends verdict rows to the manifest — checkpointed, so a restarted
    * stream resumes from the last committed batch (north-star resume). */
  def runIncremental(
      spark: SparkSession,
      stream: DataFrame,
      spec: TableSpec,
      manifestPath: String,
      checkpointDir: String,
      snapshotId: Long): org.apache.spark.sql.streaming.StreamingQuery = {
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val violations = ConstraintCompiler.violations(spec, batch)
        val verdicts = graft.engine.Passes.verdicts(
          violations, spec.partitionColumn,
          batch.select(col(spec.partitionColumn)))
        val docs = batch.groupBy(col(spec.partitionColumn))
          .agg(count(lit(1)).as("docs"))
        graft.report.Manifest.record(spark, manifestPath,
          verdicts.withColumnRenamed(spec.partitionColumn, "part_id"),
          docs.withColumnRenamed(spec.partitionColumn, "part_id"),
          snapshotId, s"stream batch=$batchId")
        ()
      }
      .start()
  }
}
