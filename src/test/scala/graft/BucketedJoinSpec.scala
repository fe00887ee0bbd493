package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB path for the text-invariant join: bucket BOTH sides by url at
  * ingest so the per-run join is co-located — zero exchange, zero sort at
  * validation time. This test persists bucketed tables and asserts the join
  * plan has no shuffle. */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new java.io.File(s"spark-warehouse/$name")
    if (loc.exists()) {
      import scala.reflect.io.Directory
      new Directory(loc).deleteRecursively()
    }
  }

  test("invariant join over url-bucketed tables plans without Exchange") {
    val n = 20000L
    dropTable("pages_bucketed")
    dropTable("expected_bucketed")
    graft.testdata.PagesGen.pages(spark, n, "dirty")
      .where(col("url").isNotNull)
      .select(col("url"), col("part_id"), sha2(col("text").cast("binary"), 256).as("actual"))
      .write.bucketBy(16, "url").sortBy("url")
      .saveAsTable("pages_bucketed")
    graft.testdata.PagesGen.expectedText(spark, n)
      .write.bucketBy(16, "url").sortBy("url")
      .saveAsTable("expected_bucketed")

    // at real scale neither side broadcasts; force the SMJ path to show the
    // bucketed co-location (at 20k rows the planner would rightly broadcast)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = try {
      val p = spark.table("pages_bucketed")
      val e = spark.table("expected_bucketed")
      val j = p.join(e.withColumnRenamed("text_sha256", "expected"), Seq("url"))
        .where(col("actual") =!= col("expected"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        "bucketed join must not shuffle:\n" + plan)
      j.count()
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
    // and it still finds exactly the planted mutations + dup-url collisions
    val mismatches = joined
    // and it still finds exactly the planted mutations + dup-url collisions
    val expected = (0L until n).count(i =>
      i % 1000 == 31 || // mutated text
        (i % 1000 == 17 && i % 997 != 29)) // dup rows vs id-1's text
    assert(joined === expected)
    dropTable("pages_bucketed")
    dropTable("expected_bucketed")
  }
}
