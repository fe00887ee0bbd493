package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.report.{Manifest, SnapshotCatalog}
import graft.testdata.PagesGen

class CatalogAndCliSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$name").toString

  test("snapshot catalog: append/list/prune/incremental resume") {
    val root = tmp("catalog") + "/pages"
    val manifest = tmp("catalog_m") + "/manifest"
    val cat = new SnapshotCatalog(spark, root)
    cat.append(PagesGen.pages(spark, 2000, "dirty"), 1L)
    cat.append(PagesGen.pages(spark, 1000, "clean"), 2L)
    assert(cat.snapshots() === Seq(1L, 2L))
    assert(cat.readSnapshot(2L).count() === 1000L)
    assert(cat.readUpTo(2L).count() === 3000L)
    // snapshot pruning reaches the scan (partition filter on `snapshot`)
    val scan = cat.readSnapshot(2L).queryExecution.executedPlan
      .collectLeaves().head.toString
    assert(scan.contains("snapshot"), scan)

    def process(df: org.apache.spark.sql.DataFrame) =
      graft.engine.PageValidator.validate(spark, df.drop("snapshot"),
        PagesGen.langDim(spark), PagesGen.expectedText(spark, 2000),
        htmlMaxBytes = 10000).verdicts
    val first = cat.runIncremental(manifest, "test")(process)
    assert(first === Seq(1L, 2L))
    // resume: nothing to do
    assert(cat.runIncremental(manifest, "test")(
      _ => fail("must not reprocess")) === Seq.empty)
    // a third snapshot arrives; only it is processed
    cat.append(PagesGen.pages(spark, 500, "clean"), 3L)
    assert(cat.runIncremental(manifest, "test")(process) === Seq(3L))
    assert(Manifest.read(spark, manifest)
      .select("snapshot_id").distinct().count() === 3L)
  }

  test("CLI transcript: valid run prints the reference-shaped verdict lines") {
    val out = new java.io.ByteArrayOutputStream()
    val code = Console.withOut(new java.io.PrintStream(out)) {
      Cli.run(Array("--synthetic", "3000:clean"))
    }
    assert(code === 0)
    val lines = out.toString("UTF-8").split("\n").toSeq
    assert(lines.head === "synthetic:3000:clean is valid.")
    assert(lines.count(_.matches("\t partition \\d+ is valid")) ===
      PagesGen.NumParts)
  }

  test("CLI transcript: spec-file run reports violations") {
    val specPath = tmp("cli_spec") + "/spec.json"
    val spec = graft.spec.TableSpec("pages", "part_id", Seq("url"), Seq(
      graft.spec.NotNull("url"), graft.spec.MatchesRegex("url", "^https?://")))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(specPath),
      graft.spec.SpecJson.toJson(spec))
    val pagesPath = tmp("cli_pages") + "/pages"
    PagesGen.pages(spark, 3000, "dirty").write.parquet(pagesPath)
    val out = new java.io.ByteArrayOutputStream()
    val code = Console.withOut(new java.io.PrintStream(out)) {
      Cli.run(Array("--pages", pagesPath, "--spec", specPath))
    }
    assert(code === 1)
    val text = out.toString("UTF-8")
    assert(text.contains(s"ERROR: $pagesPath is invalid."))
    assert(text.contains("None is not of type 'string' in 'url'"))
  }
}
