package graft.sketch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for near-dup signatures (SURVEY.md §4 —
  * "custom Expression beats a Scala UDF"). The pure-Column formulations in
  * graft.ops.Dedup are correct but evaluate nested HigherOrderFunction
  * lambdas interpretively (per-element virtual calls, one pass per hash
  * function); these compute the whole signature in ONE tight array pass:
  *
  *  - token hashes via XXH64 once per token,
  *  - shingle hashes by rotate-combine over the window (order-sensitive),
  *  - the numHashes MinHash values by affine rehash (a·h+b) of the shingle
  *    hash — the standard trick that avoids hashing the string k times.
  *
  * ~10× over the lambda formulation at the 10^12-doc design point this is
  * the difference between a day and a week of cluster time.
  */
case class MinHashSig(child: Expression, numHashes: Int, shingleK: Int,
    seed: Long = 42L)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  @transient private lazy val (as, bs) = {
    val r = new java.util.Random(seed)
    (Array.fill(numHashes)(r.nextLong() | 1L), Array.fill(numHashes)(r.nextLong()))
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val toks = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      toks(i) = if (s == null) 0L
        else XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)
      i += 1
    }
    val nw = math.max(n - shingleK + 1, 1)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var w = 0
    while (w < nw) {
      var h = 0x9E3779B97F4A7C15L
      var j = w
      val end = math.min(w + shingleK, n)
      while (j < end) {
        h = java.lang.Long.rotateLeft(h ^ toks(j), 27) * 0x165667B19E3779F9L
        j += 1
      }
      var q = 0
      while (q < numHashes) {
        val hv = as(q) * h + bs(q)
        if (hv < mins(q)) mins(q) = hv
        q += 1
      }
      w += 1
    }
    ArrayData.toArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

/** 64-bit SimHash in one pass: per token hash, add ±1 into 64 counters,
  * assemble the sign bits. */
case class SimHashSig(child: Expression, seed: Long = 42L)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(c: Expression): SimHashSig =
    copy(child = c)
}

/** Distinct character n-grams of a string in one pass (native replacement
  * for the interpreted `transform(sequence(...), i -> substring(...))`
  * formulation; same semantics: whole string when shorter than n). */
case class CharNGrams(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val len = s.numChars()
    if (len < n) return ArrayData.toArrayData(Array[Any](s))
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    var i = 0
    while (i <= len - n) {
      seen.add(s.substring(i, i + n))
      i += 1
    }
    ArrayData.toArrayData(seen.toArray)
  }

  override protected def withNewChildInternal(c: Expression): CharNGrams =
    copy(child = c)
}

object SignatureExprs {
  /** Register `minhash_sig(tokens, numHashes, shingleK)` and
    * `simhash_sig(tokens)` for expr()/SQL use. Idempotent. */
  def register(spark: SparkSession): Unit = {
    def litInt(e: Expression): Int =
      e.eval(null).asInstanceOf[Number].intValue()
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig",
      exprs => MinHashSig(exprs.head, litInt(exprs(1)), litInt(exprs(2))),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_sig", exprs => SimHashSig(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_ngrams", exprs => CharNGrams(exprs.head, litInt(exprs(1))), "built-in")
  }
}
