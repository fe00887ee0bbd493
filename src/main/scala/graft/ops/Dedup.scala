package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text corpora — exact, MinHash+LSH,
  * SimHash and n-gram Jaccard. All signature computation is pure Catalyst
  * (one projection per row, whole-stage codegen); candidate generation is the
  * classic band-bucket shuffle: documents are only ever compared inside a
  * bucket, so the cross-product never materializes. At 10^12 docs the only
  * quadratic term is per-bucket, bounded by `maxBucket` (oversized buckets
  * are dropped and logged — they're near-identical boilerplate anyway).
  */
object Dedup {

  /** Identity on an array column that references it twice (slice + size).
    * CollapseProject only inlines a producer alias into a consumer when it's
    * referenced once or cheap; lambda-iterated references (transform over a
    * column) count as one reference, so without this barrier an expensive
    * array expression gets re-evaluated once per lambda iteration after the
    * projections collapse (e.g. the 32-hash MinHash signature recomputing
    * the shingle set 32×, which recomputes split() ~90× each). */
  private def pin(c: Column): Column = slice(c, lit(1), size(c))

  /** Exact duplicates by content hash: groups with >1 member, keeper = min id.
    * Two-phase partial agg comes free from Spark's hash aggregate. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("content_hash"))
      .agg(count(lit(1)).as("cnt"), min(col(idCol)).as("keep_id"),
        collect_list(col(idCol)).as("ids"))
      .where(col("cnt") > 1)

  /** k-word shingles of a token array (whole text if shorter than k). */
  def shingles(tokens: Column, k: Int): Column =
    when(size(tokens) < k, array(array_join(tokens, " ")))
      .otherwise(transform(sequence(lit(1), size(tokens) - (k - 1)),
        i => array_join(slice(tokens, i, lit(k)), " ")))

  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * minimum over the shingle set. */
  def minhashSignature(sh: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      s => array_min(transform(array_distinct(sh),
        x => xxhash64(concat(x, lit("#"), s.cast("string"))))))

  /** (id, band, band_hash) — one row per band; equal band hash ⇒ candidate. */
  def minhashBands(
      df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 32, bands: Int = 8): DataFrame = {
    require(numHashes % bands == 0)
    val r = numHashes / bands
    // signature via the native one-pass Catalyst expression (sketch
    // .MinHashSig); the pure-Column formulation (shingles+minhashSignature)
    // is kept above as the spec of what it computes
    graft.sketch.SignatureExprs.register(df.sparkSession)
    df.select(col(idCol).as("id"), split(col(textCol), "\\s+").as("toks"))
      .select(col("id"),
        expr(s"minhash_sig(toks, $numHashes, $shingleK)").as("sig"))
      .select(col("id"), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(array_join(slice(pin(col("sig")), b * r + 1, lit(r)), ",")))))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_hash"))
  }

  /** Candidate pairs (idA < idB) from any (id, band, band_hash) table.
    * Buckets larger than `maxBucket` are dropped (skew guard). */
  def bucketPairs(bands: DataFrame, maxBucket: Int = 1000): DataFrame =
    bands.groupBy(col("band"), col("band_hash"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .where(size(col("ids")).between(2, maxBucket))
      .select(explode(flatten(transform(col("ids"), (a, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))),
          b => struct(a.as("id_a"), b.as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b")).distinct()

  /** MinHash LSH near-duplicate detection, verified with true Jaccard over
    * shingle sets (bucket-join candidates only — no cross product). */
  def minhashDedup(
      df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.7): DataFrame = {
    val cand = bucketPairs(minhashBands(df, idCol, textCol, shingleK, numHashes, bands))
    val sh = df.select(col(idCol).as("id"),
      array_distinct(shingles(split(col(textCol), "\\s+"), shingleK)).as("sh"))
    cand
      .join(sh.withColumnsRenamed(Map("id" -> "id_a", "sh" -> "sh_a")), Seq("id_a"))
      .join(sh.withColumnsRenamed(Map("id" -> "id_b", "sh" -> "sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash over the token multiset: bit i set iff the weighted sum
    * of token-hash bit i is positive. Pure expression, unrolled over the 64
    * bits at plan-build time — no UDF. (At extreme scale a single custom
    * Expression computing all bits in one array pass would cut the 64×
    * re-traversal; unnecessary at current corpus sizes.) */
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
      maxHamming: Int = 3): DataFrame = {
    graft.sketch.SignatureExprs.register(df.sparkSession)
    val withSig = df
      .select(col(idCol).as("id"), split(col(textCol), "\\s+").as("toks"))
      .select(col("id"), expr("simhash_sig(toks)").as("sig"))
    val chunked = withSig.select(col("id"), col("sig"), posexplode(
        array((0 until 4).map(c =>
          shiftright(col("sig"), c * 16).bitwiseAND(0xFFFFL)): _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_hash"))
    val cand = bucketPairs(chunked.select(col("id"), col("band"), col("band_hash")))
    cand
      .join(withSig.withColumnsRenamed(Map("id" -> "id_a", "sig" -> "sig_a")), Seq("id_a"))
      .join(withSig.withColumnsRenamed(Map("id" -> "id_b", "sig" -> "sig_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** Character n-gram Jaccard similarity between candidate pairs grouped by a
    * cheap blocking key (default: same token-count bucket + same first
    * token). Exact pairwise Jaccard, but only inside blocks. */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
      n: Int = 4, threshold: Double = 0.8, maxBucket: Int = 1000): DataFrame = {
    // native one-pass n-gram expression (sketch.CharNGrams); equivalent to
    // array_distinct(transform(sequence(1, length-n+1), i -> substring(...)))
    graft.sketch.SignatureExprs.register(df.sparkSession)
    val withG = df.select(col(idCol).as("id"),
      expr(s"char_ngrams($textCol, $n)").as("g"),
      xxhash64(concat(
        floor(size(split(col(textCol), "\\s+")) / 5).cast("string"), lit("|"),
        coalesce(element_at(split(col(textCol), "\\s+"), 1), lit("")))).as("block"))
    val bands = withG.select(col("id"), lit(0).as("band"), col("block").as("band_hash"))
    val cand = bucketPairs(bands, maxBucket)
    val g = withG.select(col("id"), col("g"))
    cand
      .join(g.withColumnsRenamed(Map("id" -> "id_a", "g" -> "g_a")), Seq("id_a"))
      .join(g.withColumnsRenamed(Map("id" -> "id_b", "g" -> "g_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("g_a"), col("g_b"))).cast("double") /
          size(array_union(col("g_a"), col("g_b")))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Embedding near-dup: cosine ≥ threshold among LSH-bucketed candidates
    * (see Similarity.hyperplaneBuckets for the scale path). */
  def embeddingDedup(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, planes: Int = 12): DataFrame = {
    val buckets = Similarity.hyperplaneBuckets(emb, idCol, vecCol, planes)
    val cand = bucketPairs(buckets.select(col("id"), lit(0).as("band"),
      col("bucket").as("band_hash")))
    val v = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
    cand
      .join(v.withColumnsRenamed(Map("id" -> "id_a", "v" -> "v_a")), Seq("id_a"))
      .join(v.withColumnsRenamed(Map("id" -> "id_b", "v" -> "v_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosine(col("v_a"), col("v_b")).as("cosine"))
      .where(col("cosine") >= threshold)
  }
}
