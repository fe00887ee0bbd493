package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.PageValidator
import graft.testdata.PagesGen

/** Shared session for all suites (one JVM for the forked test run). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

class PageValidatorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val N = 5000L
  val Cap = 10000L // test html byte cap (reference default is 10 MiB)

  /** Scala mirror of PagesGen.Dirty's injection precedence, so expected
    * counts are computed independently of the Spark expressions. */
  def urlKind(id: Long): String =
    if (id % 1000 == 3) "null"
    else if (id % 1000 == 5) "bad_scheme"
    else if (id % 997 == 29) "hot"
    else if (id % 1000 == 17) "dup"
    else "clean"

  lazy val ids = 0L until N
  lazy val res = PageValidator.validate(
    spark,
    PagesGen.pages(spark, N, "dirty"),
    PagesGen.langDim(spark),
    PagesGen.expectedText(spark, N),
    htmlMaxBytes = Cap)

  lazy val cleanRes = PageValidator.validate(
    spark,
    PagesGen.pages(spark, N, "clean"),
    PagesGen.langDim(spark),
    PagesGen.expectedText(spark, N),
    htmlMaxBytes = Cap)

  test("clean profile: zero violations, all partitions pass") {
    assert(cleanRes.violations.count() === 0L)
    val v = cleanRes.verdicts.collect()
    assert(v.length === PagesGen.NumParts)
    assert(v.forall(_.getAs[Boolean]("pass")))
    assert(cleanRes.duplicates.count() === 0L)
    assert(cleanRes.textMismatches.count() === 0L)
    assert(cleanRes.refViolations.count() === 0L)
  }

  test("dirty profile: per-rule violation counts match injections") {
    val byRule = res.violations.groupBy("rule_id").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byRule("not_null:url") === ids.count(urlKind(_) == "null"))
    assert(byRule("regex:url") === ids.count(urlKind(_) == "bad_scheme"))
    assert(byRule("between:warc_ts") === ids.count(_ % 1000 == 41))
    assert(byRule("max_bytes:html") === ids.count(_ % 1000 == 37))
    assert(byRule("referential:lang") === ids.count(_ % 500 == 11))
  }

  test("dirty profile: duplicate urls found (incl. hot key), salted == unsalted") {
    val dups = res.duplicates.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val hotCnt = ids.count(urlKind(_) == "hot")
    assert(dups("https://h0.example.org/p/hot") === hotCnt)
    // each dup row creates a 2-group on the previous id's clean url
    val dupIds = ids.filter(urlKind(_) == "dup")
    assert(dups.size === dupIds.size + 1)
    assert(dupIds.forall(i => dups.values.count(_ == 2L) == dupIds.size))
    // salted and unsalted paths agree exactly
    val unsalted = graft.engine.Passes
      .duplicates(PagesGen.pages(spark, N, "dirty"), "url")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(unsalted === dups)
  }

  test("dirty profile: text invariant catches mutations and dup-url texts") {
    val bad = res.textMismatches.select("url").collect().map(_.getString(0)).toSet
    val mutated = ids.filter(i => i % 1000 == 31 && urlKind(i) == "clean")
    // mutated rows keep their own url; dup rows collide with id-1's url
    assert(mutated.forall(i => bad.exists(_.endsWith(s"/p/$i"))))
    assert(bad.size === mutated.size + ids.count(urlKind(_) == "dup"))
  }

  test("dirty profile: failing partitions are exactly those with violations") {
    val verdicts = res.verdicts.collect()
      .map(r => r.getInt(0) -> r.getAs[Boolean]("pass")).toMap
    assert(verdicts.size === PagesGen.NumParts)
    // expected failing partitions, mirrored in plain Scala
    val violatingIds =
      ids.filter(i => urlKind(i) == "null" || urlKind(i) == "bad_scheme") ++ // row rules
        ids.filter(i => i % 1000 == 41 || i % 1000 == 37) ++ // ts range, html cap
        ids.filter(_ % 500 == 11) ++ // referential lang
        ids.filter(_ % 1000 == 31) ++ // mutated text (invariant)
        ids.filter(urlKind(_) == "dup") // dup rows mismatch id-1's text
    val expectFail = violatingIds.map(i => (i % PagesGen.NumParts).toInt).toSet
    assert(verdicts.filter(!_._2).keySet === expectFail)
  }

  test("stats pass: single-aggregate column stats are sane") {
    val stats = res.stats.collect()
      .map(r => r.getString(0) -> r).toMap
    assert(stats("url").getAs[Long]("n_null") === ids.count(urlKind(_) == "null"))
    assert(stats("lang").getAs[Long]("n_null") === 0L)
    val urlDistinct = stats("url").getAs[Long]("approx_distinct")
    val exact = ids.map(i => urlKind(i) match {
      case "null" => null
      case "bad_scheme" => s"ftp://bad/$i"
      case "hot" => "hot"
      case "dup" => s"p/${i - 1}"
      case _ => s"p/$i"
    }).filter(_ != null).distinct.size
    assert(math.abs(urlDistinct - exact).toDouble / exact < 0.05)
  }
}
