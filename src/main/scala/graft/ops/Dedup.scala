package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text corpora — exact, MinHash+LSH,
  * SimHash, char-n-gram Jaccard and embedding near-dup. All signature
  * computation is pure Catalyst (one codegen'd projection per row); candidate
  * generation is the classic band-bucket shuffle: documents are only ever
  * compared inside a (band, bucket) cell, so the cross-product never
  * materializes. At 10^12 docs the only quadratic term is per-bucket,
  * bounded by `maxBucket`. Oversized buckets are dropped — NOT silently:
  * every candidate-generation path reports `n_buckets`, `dropped_buckets`
  * and `max_bucket_size` through an `observe()` metric (pass an
  * [[org.apache.spark.sql.Observation]] to read it; see also
  * [[Dedup.oversizedBuckets]] for the side-output of what was dropped).
  * Because every op here bands over MULTIPLE independent hash bands/tables,
  * one dropped bucket degrades recall gracefully instead of zeroing it.
  */
object Dedup {

  /** Identity on an array column that references it twice (slice + size).
    * CollapseProject only inlines a producer alias into a consumer when it's
    * referenced once or cheap; lambda-iterated references (transform over a
    * column) count as one reference, so without this barrier an expensive
    * array expression gets re-evaluated once per lambda iteration after the
    * projections collapse. */
  private[ops] def pin(c: Column): Column = slice(c, lit(1), size(c))

  /** Exact duplicates by content hash: groups with >1 member, keeper = min
    * id. Two-phase partial agg comes free from Spark's hash aggregate; the
    * member-id sample is BOUNDED (sketch.BoundedIdsAgg) because at web
    * scale a single boilerplate text can have 10^8 copies — `cnt` stays
    * exact, `ids` carries up to `maxIds` examples. */
  def exact(df: DataFrame, idCol: String, textCol: String,
      maxIds: Int = 1000): DataFrame = {
    graft.sketch.BoundedIdsAgg.register(df.sparkSession)
    df.select(md5(col(textCol).cast("binary")).as("content_hash"),
        col(idCol).as("id"))
      .groupBy(col("content_hash"))
      .agg(count(lit(1)).as("cnt"), min(col("id")).as("keep_id"),
        expr(s"bounded_ids(id, $maxIds)").as("b"))
      .where(col("cnt") > 1)
      .select(col("content_hash"), col("cnt"), col("keep_id"),
        col("b.ids").as("ids"))
  }

  /** k-word shingles of a token array (whole text if shorter than k). */
  def shingles(tokens: Column, k: Int): Column =
    when(size(tokens) < k, array(array_join(tokens, " ")))
      .otherwise(transform(sequence(lit(1), size(tokens) - (k - 1)),
        i => array_join(slice(tokens, i, lit(k)), " ")))

  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * minimum over the shingle set. Pure-Column spec of what the native
    * sketch.MinHashSig expression computes in one pass. */
  def minhashSignature(sh: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      s => array_min(transform(array_distinct(sh),
        x => xxhash64(concat(x, lit("#"), s.cast("string"))))))

  /** (id, band, band_hash) — one row per band; equal band hash ⇒ candidate.
    * Signature and band hashes via the native one-pass codegen'd expressions
    * (sketch.MinHashSig / sketch.BandHashes). */
  def minhashBands(
      df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 32, bands: Int = 8): DataFrame = {
    require(numHashes % bands == 0)
    graft.sketch.SignatureExprs.register(df.sparkSession)
    df.select(col(idCol).as("id"), split(col(textCol), "\\s+").as("toks"))
      .select(col("id"), posexplode(
        expr(s"band_hashes(minhash_sig(toks, $numHashes, $shingleK), $bands)")))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_hash"))
  }

  /** Candidate pairs (idA < idB) from any (id: long, band, band_hash) table.
    * Buckets larger than `maxBucket` are dropped (skew guard) and COUNTED:
    * the drop is reported via an `observe()` metric (n_buckets,
    * dropped_buckets, max_bucket_size) — attach `obs` to read it after the
    * action; production listeners see the named metrics either way.
    *
    * Collection uses the BOUNDED aggregate (sketch.BoundedIdsAgg): the
    * per-bucket buffer never holds more than maxBucket+1 ids even while a
    * hot bucket's TRUE size keeps counting — a plain `collect_list` would
    * materialize a 10^8-member skew bucket in one aggregation buffer before
    * any size filter could run. Kept buckets (n ≤ maxBucket) emit their
    * exact sorted id lists, so results are unchanged. */
  def bucketPairs(bands: DataFrame, maxBucket: Int = 1000,
      obs: Option[Observation] = None): DataFrame = {
    graft.sketch.BoundedIdsAgg.register(bands.sparkSession)
    val grouped = bands.groupBy(col("band"), col("band_hash"))
      .agg(expr(s"bounded_ids(id, ${maxBucket + 1})").as("b"))
    val metrics = Seq(
      count(lit(1)).as("n_buckets"),
      sum((col("b.n") > maxBucket).cast("long")).as("dropped_buckets"),
      max(col("b.n")).as("max_bucket_size"))
    val observed = obs match {
      case Some(o) => grouped.observe(o, metrics.head, metrics.tail: _*)
      case None => grouped.observe("graft.bucket_pairs", metrics.head, metrics.tail: _*)
    }
    // Pair generation by bucket-key SELF-JOIN over the exploded kept ids,
    // not an in-row quadratic array: a 1000-member bucket as one row means
    // a 499,500-struct array materialized by an INTERPRETED HigherOrder-
    // Function inside a single task (measured 250 s for the simhash family
    // at a 10× template-heavy corpus — BENCH.md round 5); the join form is
    // whole-stage-codegen'd, streams pairs, spills, and AQE splits skewed
    // bucket keys across tasks (same 35× headroom a real cluster needs).
    // (The probe side joins the RAW band rows, not a second copy of the
    // aggregate: the Observation node must appear exactly once in the
    // plan, and oversized buckets can't leak in — their keys don't exist
    // on the kept side.)
    val kept = observed
      .where(col("b.n").between(2, maxBucket))
      .select(col("band"), col("band_hash"), col("b.ids").as("ids"))
      .select(col("band"), col("band_hash"), explode(col("ids")).as("id_a"))
    kept
      .join(bands.select(col("band"), col("band_hash"), col("id").as("id_b")),
        Seq("band", "band_hash"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Side output: the (band, band_hash, bucket_size) cells that
    * [[bucketPairs]] would drop at this `maxBucket` — audit what truncation
    * costs instead of inferring it from the metric alone. */
  def oversizedBuckets(bands: DataFrame, maxBucket: Int = 1000): DataFrame =
    bands.groupBy(col("band"), col("band_hash"))
      .agg(count(lit(1)).as("bucket_size"))
      .where(col("bucket_size") > maxBucket)

  /** MinHash LSH near-duplicate detection, verified with true Jaccard over
    * shingle sets (bucket-join candidates only — no cross product). The
    * verify stage carries sorted 64-bit shingle-hash sets (one-pass
    * sketch.ShingleHashes) and merge-scans them (sketch.SortedJaccard), so
    * the candidate join shuffles 8-byte hashes instead of shingle strings
    * and never builds per-pair hash sets. */
  def minhashDedup(
      df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.7, maxBucket: Int = 1000,
      obs: Option[Observation] = None): DataFrame = {
    graft.sketch.SignatureExprs.register(df.sparkSession)
    val cand = bucketPairs(
      minhashBands(df, idCol, textCol, shingleK, numHashes, bands), maxBucket, obs)
    val sh = df.select(col(idCol).as("id"),
      expr(s"shingle_hashes(split($textCol, '\\\\s+'), $shingleK)").as("sh"))
    cand
      .join(sh.withColumnsRenamed(Map("id" -> "id_a", "sh" -> "sh_a")), Seq("id_a"))
      .join(sh.withColumnsRenamed(Map("id" -> "id_b", "sh" -> "sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("sorted_jaccard(sh_a, sh_b)").as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash over the token multiset: bit i set iff the weighted sum
    * of token-hash bit i is positive. Pure expression, unrolled over the 64
    * bits at plan-build time — no UDF. (The native sketch.SimHashSig
    * expression computes the same thing in one pass; this is its spec.) */
  def simhash(tokens: Column): Column = simhashOfHashes(transform(tokens, t => xxhash64(t)))

  /** SimHash from a pre-projected token-hash array column — callers should
    * materialize the hashes in their own projection first so the 64 bit
    * expressions don't each re-hash the token array. */
  def simhashOfHashes(hashes: Column): Column =
    (0 until 64).map { i =>
      val bitSum = aggregate(hashes, lit(0),
        (s, h) => s + when(shiftright(h, i).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(bitSum > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming, candidates
    * from 4×16-bit chunk equality (guarantees recall for distance ≤ 3). */
  def simhashDedup(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucket: Int = 1000,
      obs: Option[Observation] = None): DataFrame = {
    graft.sketch.SignatureExprs.register(df.sparkSession)
    val withSig = df
      .select(col(idCol).as("id"), split(col(textCol), "\\s+").as("toks"))
      .select(col("id"), expr("simhash_sig(toks)").as("sig"))
    val chunked = withSig.select(col("id"), col("sig"), posexplode(
        array((0 until 4).map(c =>
          shiftright(col("sig"), c * 16).bitwiseAND(0xFFFFL)): _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_hash"))
    val cand = bucketPairs(
      chunked.select(col("id"), col("band"), col("band_hash")), maxBucket, obs)
    cand
      .join(withSig.withColumnsRenamed(Map("id" -> "id_a", "sig" -> "sig_a")), Seq("id_a"))
      .join(withSig.withColumnsRenamed(Map("id" -> "id_b", "sig" -> "sig_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** Character n-gram Jaccard near-dup pairs. Candidates come from MinHash
    * banding over the n-gram set (`bands` independent bands of
    * numHashes/bands minhash values each — the same guarantee structure as
    * [[minhashDedup]], instead of a single data-dependent blocking key whose
    * hot values blow past `maxBucket` at scale). Verification is exact
    * Jaccard over the distinct n-gram HASH sets (sorted long arrays from the
    * one-pass sketch.CharNGramHashes expression), so the verify join
    * shuffles 8-byte hashes instead of raw n-gram strings; Jaccard over the
    * 64-bit hash sets equals Jaccard over the n-gram sets (collisions
    * negligible). */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
      n: Int = 4, threshold: Double = 0.8, numHashes: Int = 36,
      bands: Int = 6, maxBucket: Int = 1000,
      obs: Option[Observation] = None): DataFrame = {
    // r = numHashes/bands = 6 minhashes per band: at the 0.8 default
    // threshold a J=0.8 pair collides per band with prob 0.8^6 ≈ 0.26 (≥1 of
    // 6 bands: 84%, ~100% for the J≥0.9 pairs real corpora dedup), while a
    // J=0.5 template-sibling pair stays out (0.5^6 ≈ 1.6%). Wider bands
    // (r=2) admitted ~100× more candidates than true pairs on the
    // template-heavy test corpus — the verify join, not the banding, is
    // what must stay small.
    require(numHashes % bands == 0)
    graft.sketch.SignatureExprs.register(df.sparkSession)
    val bandRows = df.select(col(idCol).as("id"), posexplode(expr(
        s"band_hashes(char_minhash_sig($textCol, $numHashes, $n), $bands)")))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_hash"))
    val cand = bucketPairs(bandRows, maxBucket, obs)
    val g = df.select(col(idCol).as("id"),
      expr(s"char_ngram_hashes($textCol, $n)").as("g"))
    cand
      .join(g.withColumnsRenamed(Map("id" -> "id_a", "g" -> "g_a")), Seq("id_a"))
      .join(g.withColumnsRenamed(Map("id" -> "id_b", "g" -> "g_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("sorted_jaccard(g_a, g_b)").as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Embedding near-dup: cosine ≥ threshold among multi-table hyperplane-LSH
    * candidates (nTables independent bands of planesPerTable sign bits —
    * Similarity.lshTables). A pair is a candidate if it collides in ANY
    * table, so recall amplifies with nTables and a single dropped/hot bucket
    * in one table degrades recall gracefully instead of zeroing it (the old
    * single-band 2^12-bucket variant silently returned nothing once buckets
    * exceeded maxBucket). */
  def embeddingDedup(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, nTables: Int = 8, planesPerTable: Int = 8,
      dim: Int = 64, maxBucket: Int = 1000,
      obs: Option[Observation] = None): DataFrame = {
    val buckets = Similarity.lshTables(emb, idCol, vecCol, nTables, planesPerTable, dim)
      .select(col("id"), col("table").as("band"), col("bucket").as("band_hash"))
    val cand = bucketPairs(buckets, maxBucket, obs)
    val v = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
    cand
      .join(v.withColumnsRenamed(Map("id" -> "id_a", "v" -> "v_a")), Seq("id_a"))
      .join(v.withColumnsRenamed(Map("id" -> "id_b", "v" -> "v_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosine(col("v_a"), col("v_b")).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** [[embeddingDedup]] with the LSH geometry SIZED FROM THE DATA instead
    * of fixed: bucket granularity is a density knob (planesPerTable p
    * gives 2^p buckets/table, so per-bucket size — and the verify
    * quadratic — grows linearly with corpus density at fixed p; measured
    * 10.9 s → 62.4 s from 10× to 20× in BENCH.md round 5). One cheap
    * count sizes p ≈ log2(n/targetBucket), then nTables comes from the
    * hyperplane collision model so recall at `threshold` stays ≥
    * `recallTarget`: P(table hit) = (1 − acos(θ)/π)^p, tables =
    * ⌈ln(1−target)/ln(1−P)⌉. */
  def embeddingDedupAuto(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, targetBucket: Int = 64,
      recallTarget: Double = 0.98, dim: Int = 64, maxBucket: Int = 1000,
      obs: Option[Observation] = None): DataFrame = {
    val n = math.max(1L, emb.count())
    val planes = math.max(8,
      math.ceil(math.log(n.toDouble / targetBucket) / math.log(2)).toInt)
    val pPlane = 1.0 - math.acos(threshold) / math.Pi
    val pTable = math.pow(pPlane, planes)
    val tables = math.min(32, math.max(4,
      math.ceil(math.log1p(-recallTarget) / math.log1p(-pTable)).toInt))
    embeddingDedup(emb, idCol, vecCol, threshold, tables, planes, dim,
      maxBucket, obs)
  }
}
