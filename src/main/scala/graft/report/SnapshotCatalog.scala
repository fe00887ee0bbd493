package graft.report

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Thin Iceberg-shaped snapshot seam over partitioned parquet (SURVEY.md
  * §7.4: no Iceberg runtime in /opt/spark/jars — this keeps the API
  * snapshot-shaped so a real catalog drops in).
  *
  * Layout: `<root>/snapshot=<id>/part-*.parquet`. `snapshot` is a real
  * partition column, so `readUpTo`/`readSnapshot` prune at the directory
  * level — a 10^12-row table scan of one snapshot touches only that
  * snapshot's files. Incremental validation = [[unprocessed]] (snapshot ids
  * absent from the manifest) → validate → [[Manifest.record]].
  */
final class SnapshotCatalog(spark: SparkSession, root: String) {

  def append(df: DataFrame, snapshotId: Long): Unit =
    df.withColumn("snapshot", lit(snapshotId))
      .write.mode(SaveMode.Append).partitionBy("snapshot").parquet(root)

  def snapshots(): Seq[Long] = {
    val d = new java.io.File(root)
    if (!d.exists()) Seq.empty
    else d.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("snapshot="))
      .map(_.getName.stripPrefix("snapshot=").toLong).sorted
  }

  def readSnapshot(snapshotId: Long): DataFrame =
    spark.read.parquet(root).where(col("snapshot") === snapshotId)

  def readUpTo(snapshotId: Long): DataFrame =
    spark.read.parquet(root).where(col("snapshot") <= snapshotId)

  /** Snapshot ids not yet recorded as done in the manifest. */
  def unprocessed(manifest: DataFrame): Seq[Long] = {
    val done = manifest.where(col("status") === "done")
      .select(col("snapshot_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    snapshots().filterNot(done)
  }

  /** Validate every unprocessed snapshot with `process` (slice → verdicts)
    * and record it; returns processed snapshot ids. Re-running after a crash
    * resumes exactly at the first unrecorded snapshot. */
  def runIncremental(manifestPath: String, lineage: String)(
      process: DataFrame => DataFrame): Seq[Long] = {
    val todo = unprocessed(Manifest.read(spark, manifestPath))
    todo.foreach { snap =>
      val slice = readSnapshot(snap)
      val verdicts = process(slice)
      val docs = slice.groupBy(col("part_id")).agg(count(lit(1)).as("docs"))
      Manifest.record(spark, manifestPath, verdicts, docs, snap,
        s"$lineage snapshot=$snap")
    }
    todo
  }
}
