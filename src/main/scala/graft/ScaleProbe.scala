package graft

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Scale evidence for the dedup/ANN bucket machinery (BENCH.md): run the
  * whole near-dup family and both ANN paths against an N× replica of the
  * sf corpus, recording the observe() bucket metrics
  * (n_buckets / dropped_buckets / max_bucket_size), candidate/pair
  * volumes, wall time, and recall@10 vs brute force — the degradation
  * story measured, not asserted.
  *
  * Replicas are perturbed (a per-replica token appended to text; a
  * deterministic jitter on embeddings) so near-dup structure densifies
  * the way a template-heavy web corpus does at scale, instead of
  * degenerating into exact copies.
  *
  *   SPARK_GRAFT_SCALE_FACTOR (default 10) × SPARK_GRAFT_SF_DIR
  *   (default /root/testdata/sf0.1), local[SPARK_GRAFT_CPUS].
  */
object ScaleProbe {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-shuffle")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val reps = explode(sequence(lit(0), lit(factor - 1))).as("rep")
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    val docs = docs0.select(col("doc_id"), col("text"), reps)
      .select((col("doc_id") * factor + col("rep")).as("doc_id"),
        concat(col("text"), lit(" rep"), col("rep")).as("text"))
      .persist()
    val nDocs = docs.count()

    val emb0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // jitter each replica by a deterministic per-(id, rep, dim) offset small
    // enough to keep cosine-to-base ≈ 1 (dups densify) while separating ids
    val emb = emb0.select(col("vec_id"), col("embedding"), reps)
      .select((col("vec_id") * factor + col("rep")).as("vec_id"),
        transform(col("embedding"),
          (x, i) => (x + (pmod(xxhash64(col("vec_id"), col("rep"), i), lit(1000))
            .cast("double") - 500.0) / 2e5).cast("float")).as("embedding"))
      .persist()
    val nEmb = emb.count()
    println(s"[scale] corpus: $nDocs docs, $nEmb embeddings (factor $factor)")

    def report(name: String, obs: Observation, out: Long, sec: Double): Unit = {
      val m = obs.get
      println(f"[scale] $name%-16s ${sec}%7.2f s  pairs=$out%-8d " +
        s"n_buckets=${m("n_buckets")} dropped=${m("dropped_buckets")} " +
        s"max_bucket=${m("max_bucket_size")}")
    }

    // ---- near-dup family -------------------------------------------------
    locally {
      val obs = Observation()
      val (n, sec) = timed(graft.ops.Dedup.minhashDedup(
        docs, "doc_id", "text", obs = Some(obs)).count())
      report("minhash", obs, n, sec)
    }
    locally {
      val obs = Observation()
      val (n, sec) = timed(graft.ops.Dedup.simhashDedup(
        docs, "doc_id", "text", obs = Some(obs)).count())
      report("simhash", obs, n, sec)
    }
    locally {
      val obs = Observation()
      val (n, sec) = timed(graft.ops.Dedup.ngramJaccard(
        docs, "doc_id", "text", obs = Some(obs)).count())
      report("ngram", obs, n, sec)
    }
    locally {
      val obs = Observation()
      val (n, sec) = timed(graft.ops.Dedup.embeddingDedup(
        emb, "vec_id", "embedding", obs = Some(obs)).count())
      report("embedding", obs, n, sec)
    }
    locally {
      val obs = Observation()
      val (n, sec) = timed(graft.ops.Dedup.embeddingDedupAuto(
        emb, "vec_id", "embedding", obs = Some(obs)).count())
      report("embedding_auto", obs, n, sec)
    }
    locally {
      val (n, sec) = timed(graft.ops.Dedup.exact(
        docs, "doc_id", "text").count())
      println(f"[scale] exact            $sec%7.2f s  groups=$n")
    }

    // ---- ANN recall vs brute force --------------------------------------
    val queries = emb.orderBy("vec_id").limit(100).persist()
    queries.count()
    def pairSet(df: DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (exact, bfSec) = timed(pairSet(graft.ops.Similarity.bruteForceTopK(
      emb, "vec_id", "embedding", queries, "vec_id", "embedding")))
    println(f"[scale] brute-force      $bfSec%7.2f s  pairs=${exact.size}")
    locally {
      val (got, sec) = timed(pairSet(graft.ops.Similarity.annTopK(
        emb, "vec_id", "embedding", queries, "vec_id", "embedding")))
      println(f"[scale] ann_lsh          $sec%7.2f s  recall@10=" +
        f"${exact.intersect(got).size.toDouble / exact.size}%.3f")
    }
    locally {
      val (got, sec) = timed(pairSet(graft.ops.Similarity.ivfTopK(
        emb, "vec_id", "embedding", queries, "vec_id", "embedding")))
      println(f"[scale] ivf              $sec%7.2f s  recall@10=" +
        f"${exact.intersect(got).size.toDouble / exact.size}%.3f")
    }
    spark.stop()
  }
}
