package graft.testdata

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic Common-Crawl-style page table (FIXTURES.md §1).
  *
  * Schema: (url string, warc_ts timestamp, html binary, text string,
  * lang string, part_id int). Everything is derived from `spark.range(n)`
  * with `xxhash64(id, seed)` pseudo-randomness — pure Catalyst expressions,
  * so generation is distributed, seeded (seed=42) and reproducible at any
  * scale (the 10^12-row design point generates the same way, just wider).
  *
  * Profiles:
  *  - clean: every constraint passes.
  *  - dirty: per-rule violations injected at known id residues (see
  *    [[Dirty]]) so tests can compute exact expected counts.
  *  - skew:  one hot url host receives ~half the rows (salting/AQE tests).
  *  - drift: partitions >= driftFromPart have text lengths shifted +200
  *    (KS/χ² drift tests).
  */
object PagesGen {
  val Seed = 42L
  val NumParts = 8
  val Langs: Seq[String] = Seq("en", "de", "fr", "es", "zh", "pt", "it", "ja")
  val CrawlStart = 1735689600L // 2025-01-01T00:00:00Z
  val CrawlSpanSec = 31536000L // one year

  private val words = Seq(
    "the", "data", "spark", "page", "crawl", "web", "text", "table", "query",
    "row", "column", "scan", "join", "hash", "sort", "merge", "shuffle",
    "filter", "agg", "window", "stream", "batch", "fast", "slow", "small",
    "large", "key", "value", "order", "group")

  /** Deterministic id residues at which the dirty profile injects each
    * defect. Chosen mutually prime-ish so overlaps are rare but allowed. */
  object Dirty {
    val NullUrl = 1000L -> 3L
    val BadScheme = 1000L -> 5L
    val BadLang = 500L -> 11L
    val DupUrl = 1000L -> 17L // url copied from id-1
    val HotDup = 997L -> 29L  // url replaced by one constant hot key
    val MutatedText = 1000L -> 31L
    val OversizeHtml = 1000L -> 37L
    val OldTs = 1000L -> 41L
    def hits(n: Long, d: (Long, Long)): Long = {
      val (m, r) = d
      if (n <= r) 0L else (n - 1 - r) / m + 1
    }
  }

  private def h(seed: Long, cols: Column*): Column =
    xxhash64((lit(seed) +: cols): _*)

  private def is(id: Column, d: (Long, Long)): Column =
    pmod(id, lit(d._1)) === lit(d._2)

  /** Deterministic text of `nWords` pseudo-random dictionary words. */
  private def textExpr(id: Column, nWords: Column): Column =
    array_join(
      transform(sequence(lit(1), nWords), i =>
        element_at(
          typedLit(words),
          (pmod(h(7, id * lit(1000003) + i.cast("long")), lit(words.size)) + 1)
            .cast("int"))),
      " ")

  private def cleanUrl(id: Column, hostId: Column): Column =
    concat(lit("https://h"), hostId.cast("string"), lit(".example.org/p/"),
      id.cast("string"))

  def pages(spark: SparkSession, n: Long, profile: String = "clean",
      numParts: Int = NumParts): DataFrame = {
    val base = spark.range(n).toDF("id")
    val id = col("id")
    val rnd = h(1, id)
    val hostId = profile match {
      case "skew" => when(pmod(rnd, lit(2)) === 0, lit(0L)).otherwise(pmod(rnd, lit(1000)))
      case _ => pmod(rnd, lit(1000))
    }
    val partId = pmod(id, lit(numParts.toLong)).cast("int")
    val nWords = (lit(10) + pmod(h(2, id), lit(20))).cast("int")
    val nWordsDrift = profile match {
      // partitions in the upper half get systematically longer documents
      case "drift" => when(partId >= numParts / 2, nWords + lit(40)).otherwise(nWords)
      case _ => nWords
    }
    val cleanText = textExpr(id, nWordsDrift)
    val lang = element_at(typedLit(Langs),
      (pmod(h(3, id), lit(Langs.size)) + 1).cast("int"))
    val ts = timestamp_seconds(lit(CrawlStart) + pmod(h(4, id), lit(CrawlSpanSec)))

    val dirty = profile == "dirty"
    def inj(d: (Long, Long), bad: Column, good: Column): Column =
      if (dirty) when(is(id, d), bad).otherwise(good) else good

    val url0 = cleanUrl(id, hostId)
    val url = if (!dirty) url0 else
      when(is(id, Dirty.NullUrl), lit(null).cast("string"))
        .when(is(id, Dirty.BadScheme), concat(lit("ftp://bad/"), id.cast("string")))
        .when(is(id, Dirty.HotDup), lit("https://h0.example.org/p/hot"))
        .when(is(id, Dirty.DupUrl), cleanUrl(id - 1, pmod(h(1, id - 1), lit(1000))))
        .otherwise(url0)
    val text = inj(Dirty.MutatedText, concat(cleanText, lit(" MUTATED")), cleanText)
    val langC = inj(Dirty.BadLang, lit("xx"), lang)
    val tsC = inj(Dirty.OldTs, timestamp_seconds(lit(915148800L)), ts) // 1999
    val html0 = concat(lit("<html><body>"), cleanText, lit("</body></html>"))
    val html = inj(Dirty.OversizeHtml, concat(html0, repeat(lit("<pad/>"), 2000)), html0)

    base.select(
      url.as("url"), tsC.as("warc_ts"), html.cast("binary").as("html"),
      text.as("text"), langC.as("lang"), partId.as("part_id"))
  }

  /** The expected-text oracle table: (url, text_sha256) from the CLEAN
    * generator — the dirty profile's mutations are detected against this. */
  def expectedText(spark: SparkSession, n: Long, numParts: Int = NumParts): DataFrame =
    pages(spark, n, "clean", numParts)
      .select(col("url"), sha2(col("text").cast("binary"), 256).as("text_sha256"))

  /** Language dimension (broadcast side of the referential check). */
  def langDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Langs.toDF("lang")
  }
}
