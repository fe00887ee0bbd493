package graft.report

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-partition lineage + metrics manifest and snapshot-style resume
  * (BASELINE.json north_star; FIXTURES.md §2).
  *
  * No Iceberg runtime ships in /opt/spark/jars (BASELINE.md), so snapshot
  * semantics are emulated over an append-only parquet table with the same
  * shape an Iceberg manifest would have: one row per (snapshot_id, part_id)
  * run with status, row/violation counts, timings and a lineage string.
  * Resumability = LEFT ANTI join of the input's partitions against the
  * manifest's completed rows — only unprocessed partitions are touched, so a
  * restarted 10^12-row run re-reads nothing it already validated.
  */
object Manifest {

  val schema: StructType = StructType(Seq(
    StructField("part_id", IntegerType),
    StructField("snapshot_id", LongType),
    StructField("status", StringType),
    StructField("docs", LongType),
    StructField("violations", LongType),
    StructField("started_ts", TimestampType),
    StructField("finished_ts", TimestampType),
    StructField("lineage", StringType)))

  /** Read the manifest; empty-but-typed when it doesn't exist yet. */
  def read(spark: SparkSession, path: String): DataFrame =
    if (new java.io.File(path).exists())
      spark.read.schema(schema).parquet(path)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Partitions of `parts` (one column: part_id) not yet completed at or
    * before `snapshotId` — the resume frontier. */
  def pending(parts: DataFrame, manifest: DataFrame, snapshotId: Long): DataFrame = {
    val done = manifest
      .where(col("status") === "done" && col("snapshot_id") <= snapshotId)
      .select(col("part_id"))
    parts.select(col("part_id")).distinct()
      .join(broadcast(done), Seq("part_id"), "left_anti")
  }

  /** Append per-partition completion rows built from a verdicts DataFrame
    * (part_id, n_violations, pass) and a docs-per-partition DataFrame. */
  def record(
      spark: SparkSession,
      path: String,
      verdicts: DataFrame,
      docsPerPart: DataFrame, // (part_id, docs)
      snapshotId: Long,
      lineage: String): Unit = {
    val rows = verdicts.join(docsPerPart, Seq("part_id"), "left")
      .select(
        col("part_id").cast("int"),
        lit(snapshotId).as("snapshot_id"),
        lit("done").as("status"),
        coalesce(col("docs"), lit(0L)).as("docs"),
        col("n_violations").cast("long").as("violations"),
        current_timestamp().as("started_ts"),
        current_timestamp().as("finished_ts"),
        lit(lineage).as("lineage"))
    rows.write.mode(SaveMode.Append).parquet(path)
  }

  /** Incremental validation driver: restrict `pages` to pending partitions,
    * run `process` over them, record completions, return the processed
    * partition ids (empty ⇒ nothing to do — the resume no-op). */
  def runIncremental(
      spark: SparkSession,
      path: String,
      pages: DataFrame,
      snapshotId: Long,
      lineage: String)(
      process: DataFrame => DataFrame /* pages → verdicts(part_id, n_violations, pass) */)
      : Seq[Int] = {
    val todo = pending(pages.select(col("part_id")), read(spark, path), snapshotId)
      .collect().map(_.getInt(0)).sorted
    if (todo.isEmpty) return Seq.empty
    val slice = pages.where(col("part_id").isin(todo.map(Integer.valueOf): _*))
    val verdicts = process(slice)
    val docsPerPart = slice.groupBy(col("part_id")).agg(count(lit(1)).as("docs"))
    record(spark, path, verdicts, docsPerPart, snapshotId, lineage)
    todo.toSeq
  }
}
