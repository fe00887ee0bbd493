package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  *
  * - [[bruteForceTopK]] is the exact baseline: broadcast the (small) query
  *   set, one scan of the corpus, per-row dot products via zip_with/aggregate,
  *   then a two-phase bounded-heap top-k aggregate ([[graft.sketch
  *   .TopKPairsAgg]]). Partial aggregation keeps ≤k pairs per query per input
  *   partition, so the shuffle carries k·|queries|·|partitions| 16-byte pairs
  *   — never the |corpus|×|queries| scored cross product.
  * - [[hyperplaneBuckets]] is the scale path (LSH/IVF-style): deterministic
  *   seeded random hyperplanes → sign-bit bucket id; ANN probes compare only
  *   within the query's bucket, turning 10^12-row scans into bucket lookups.
  */
object Similarity {

  /** dot(a, b) over array<float/double> columns — zip_with + aggregate,
    * no UDF. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Final top-k of a scored (query_id, vec_id, cosine) table via the
    * bounded-heap aggregate: partial top-k per input partition (map-side
    * combine), k-merge on the reduce side, rank = position in the sorted
    * result array. */
  private[ops] def topKOfScored(scored: DataFrame, k: Int): DataFrame = {
    graft.sketch.TopKPairsAgg.register(scored.sparkSession)
    scored.groupBy(col("query_id"))
      .agg(expr(s"topk_pairs(cosine, vec_id, $k)").as("topk"))
      .select(col("query_id"), posexplode(col("topk")))
      .select(col("query_id"), col("col.id").as("vec_id"),
        col("col.score").as("cosine"), (col("pos") + 1).cast("int").as("rank"))
  }

  /** Exact top-k cosine neighbours for each query vector.
    * Output: (query_id, vec_id, cosine, rank), rank 1..k by cosine desc,
    * ties by vec_id asc. */
  def bruteForceTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int = 10): DataFrame = {
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("qv"))
    val c = corpus.select(col(corpusId).as("vec_id"), col(corpusVec).as("cv"))
    val scored = c.join(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), cosine(col("qv"), col("cv")).as("cosine"))
    topKOfScored(scored, k)
  }

  /** Deterministic seeded hyperplanes (dim × planes), generated driver-side
    * once and shipped as a literal — no data-dependent state. */
  def planes(dim: Int, nPlanes: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** (id, bucket) — sign-bit LSH bucket of each vector. */
  def hyperplaneBuckets(df: DataFrame, idCol: String, vecCol: String,
      nPlanes: Int = 12, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val ps = planes(dim, nPlanes, seed)
    val bucket = ps.zipWithIndex.map { case (p, i) =>
      when(dot(col(vecCol), typedLit(p)) > 0, shiftleft(lit(1L), i)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))
    df.select(col(idCol).as("id"), bucket.as("bucket"))
  }

  /** Multi-table LSH bucket ids: (id, table, bucket) — one row per table,
    * each table using independently-seeded hyperplanes. Standard LSH recall
    * amplification: a true neighbour is found if it collides in ANY table.
    * Buckets come from the one-pass codegen'd sketch.HyperplaneSigs kernel
    * (bit-identical to the pure-Column `dot(vec, typedLit(plane)) > 0`
    * formulation, which evaluated interpreted HigherOrderFunctions
    * nTables×planesPerTable times per row). */
  def lshTables(df: DataFrame, idCol: String, vecCol: String,
      nTables: Int, planesPerTable: Int, dim: Int, seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val sigs = ColumnBridge.column(graft.sketch.HyperplaneSigs(
      ColumnBridge.expression(col(vecCol)), nTables, planesPerTable, dim, seed))
    df.select(col(idCol).as("id"), posexplode(sigs))
      .withColumnsRenamed(Map("pos" -> "table", "col" -> "bucket"))
  }

  /** IVF (inverted-file) ANN top-k: `nCells` centroids are a deterministic
    * seeded uniform sample of the corpus (the vectors with the smallest
    * xxhash64(id) — a one-pass TopK, no k-means iterations needed for a
    * recall baseline), collected once on the driver (nCells·dim doubles)
    * and shipped inside the codegen'd sketch.IvfCells expression. Every
    * corpus vector takes its single nearest cell; each query probes its
    * `nprobe` nearest cells; exact cosine + bounded-heap top-k within the
    * probed cells. Scale shape: centroids broadcast, corpus shuffles once
    * on cell id (or is bucketed by it at write time), each query touches
    * ~nprobe/nCells of the corpus instead of scanning it. */
  def ivfTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int = 10, nCells: Int = 16, nprobe: Int = 4): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val centroids: Seq[Seq[Double]] = corpus
      .select(col(corpusVec).cast("array<double>").as("v"))
      .withColumn("h", xxhash64(to_json(col("v"))))
      .orderBy("h").limit(nCells)
      .collect().map(_.getSeq[Double](0).toSeq).toSeq
    def cells(vec: String, p: Int) = ColumnBridge.column(
      graft.sketch.IvfCells(ColumnBridge.expression(col(vec)), centroids, p))
    val cb = corpus.select(col(corpusId).as("vec_id"), col(corpusVec).as("cv"))
      .withColumn("cell", element_at(cells("cv", 1), 1))
    val qb = queries.select(col(queryId).as("query_id"), col(queryVec).as("qv"))
      .withColumn("cell", explode(cells("qv", nprobe)))
    val scored = cb.join(broadcast(qb), Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), cosine(col("qv"), col("cv")).as("cosine"))
    topKOfScored(scored, k)
  }

  /** ANN top-k via multi-table hyperplane LSH: candidates are corpus vectors
    * sharing a (table, bucket) cell with the query in any of `nTables`
    * tables, then exact cosine within candidates and the same bounded-heap
    * top-k as [[bruteForceTopK]]. Compared-pair count drops by
    * ~2^planesPerTable/nTables vs brute force. */
  def annTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int = 10, nPlanes: Int = 4, dim: Int = 64,
      nTables: Int = 8): DataFrame = {
    val cb = lshTables(corpus, corpusId, corpusVec, nTables, nPlanes, dim)
      .withColumnRenamed("id", "vec_id")
      .join(corpus.select(col(corpusId).as("vec_id"), col(corpusVec).as("cv")), Seq("vec_id"))
    val qb = lshTables(queries, queryId, queryVec, nTables, nPlanes, dim)
      .withColumnRenamed("id", "query_id")
      .join(queries.select(col(queryId).as("query_id"), col(queryVec).as("qv")), Seq("query_id"))
    val scored = cb.join(broadcast(qb), Seq("table", "bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("qv"), col("cv"))
      .dropDuplicates("query_id", "vec_id")
      .select(col("query_id"), col("vec_id"), cosine(col("qv"), col("cv")).as("cosine"))
    topKOfScored(scored, k)
  }
}
