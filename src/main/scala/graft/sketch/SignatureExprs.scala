package graft.sketch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

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
  * All expressions implement `doGenCode` (the generated code calls the
  * expression's own `compute` kernel through a reference object), so the
  * projection stays inside WholeStageCodegen — a CodegenFallback here would
  * knock the entire stage back to interpreted row-at-a-time execution.
  * ~10× over the lambda formulation; at the 10^12-doc design point this is
  * the difference between a day and a week of cluster time.
  */
case class MinHashSig(child: Expression, numHashes: Int, shingleK: Int,
    seed: Long = 42L)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  @transient private lazy val (as, bs) = MinHashSig.coeffs(numHashes, seed)

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  /** One-pass kernel; public so generated code can call it. */
  def compute(arr: ArrayData): ArrayData = {
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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minHashSig", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

object MinHashSig {
  private[sketch] def coeffs(numHashes: Int, seed: Long): (Array[Long], Array[Long]) = {
    val r = new java.util.Random(seed)
    (Array.fill(numHashes)(r.nextLong() | 1L), Array.fill(numHashes)(r.nextLong()))
  }
}

/** 64-bit SimHash in one pass: per token hash, add ±1 into 64 counters,
  * assemble the sign bits. */
case class SimHashSig(child: Expression, seed: Long = 42L)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(compute(v.asInstanceOf[ArrayData]))

  def compute(arr: ArrayData): Long = {
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
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("simHashSig", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): SimHashSig =
    copy(child = c)
}

/** Distinct character n-grams of a string in one pass (native replacement
  * for the interpreted `transform(sequence(...), i -> substring(...))`
  * formulation; same semantics: whole string when shorter than n). */
case class CharNGrams(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  def compute(s: UTF8String): ArrayData = {
    val len = s.numChars()
    if (len < n) return ArrayData.toArrayData(Array[Any](s))
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= len - n) {
      seen.add(s.substring(i, i + n))
      i += 1
    }
    ArrayData.toArrayData(seen.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("charNGrams", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): CharNGrams =
    copy(child = c)
}

/** Sorted distinct XXH64 hashes of a string's character n-grams, in one
  * pass. This is the long-array form used for candidate-pair verification:
  * Jaccard over the hash sets equals Jaccard over the n-gram sets (64-bit
  * hash collisions are negligible), and the verify join then shuffles
  * 8-byte hashes instead of the raw n-gram strings. Whole string hashed
  * when shorter than n (mirrors [[CharNGrams]]). */
case class CharNGramHashes(child: Expression, n: Int, seed: Long = 42L)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_ngram_hashes"

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  def compute(s: UTF8String): ArrayData = {
    val hs = CharNGramHashes.distinctSortedHashes(s, n, seed)
    ArrayData.toArrayData(hs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("charNGramHashes", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): CharNGramHashes =
    copy(child = c)
}

object CharNGramHashes {
  /** XXH64 of each char n-gram; ASCII fast path hashes the bytes in place
    * (no substring allocation), multi-byte text falls back to substring. */
  private[sketch] def ngramHashes(s: UTF8String, n: Int, seed: Long): Array[Long] = {
    val chars = s.numChars()
    if (chars < n) {
      return Array(XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed))
    }
    val out = new Array[Long](chars - n + 1)
    if (s.numBytes() == chars) { // pure ASCII: char index == byte index
      val base = s.getBaseObject
      val off = s.getBaseOffset
      var i = 0
      while (i <= chars - n) {
        out(i) = XXH64.hashUnsafeBytes(base, off + i, n, seed)
        i += 1
      }
    } else {
      var i = 0
      while (i <= chars - n) {
        val g = s.substring(i, i + n)
        out(i) = XXH64.hashUnsafeBytes(g.getBaseObject, g.getBaseOffset, g.numBytes, seed)
        i += 1
      }
    }
    out
  }

  private[sketch] def distinctSortedHashes(s: UTF8String, n: Int, seed: Long): Array[Long] = {
    val hs = ngramHashes(s, n, seed)
    java.util.Arrays.sort(hs)
    var w = 0
    var i = 0
    while (i < hs.length) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    if (w == hs.length) hs else java.util.Arrays.copyOf(hs, w)
  }
}

/** MinHash signature over a string's character n-gram set, in one pass
  * from the raw string — the LSH banding side of n-gram Jaccard dedup.
  * Same affine-rehash construction as [[MinHashSig]], same n-gram hashing
  * as [[CharNGramHashes]] (so banding and verification see the same set). */
case class CharMinHashSig(child: Expression, numHashes: Int, n: Int,
    seed: Long = 42L)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_minhash_sig"

  @transient private lazy val (as, bs) = MinHashSig.coeffs(numHashes, seed)

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  def compute(s: UTF8String): ArrayData = {
    val hs = CharNGramHashes.ngramHashes(s, n, seed)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      var q = 0
      while (q < numHashes) {
        val hv = as(q) * h + bs(q)
        if (hv < mins(q)) mins(q) = hv
        q += 1
      }
      i += 1
    }
    ArrayData.toArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("charMinHashSig", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): CharMinHashSig =
    copy(child = c)
}

/** Per-band hashes of a MinHash signature: splits the signature array into
  * `bands` equal groups of r values and XXH64-chains each group to one
  * 64-bit band hash. Replaces the interpreted
  * `transform(sequence(...), b -> xxhash64(array_join(slice(sig...))))`
  * banding (which re-sliced and string-joined the signature per band). */
case class BandHashes(child: Expression, bands: Int, seed: Long = 42L)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "band_hashes"

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  def compute(sig: ArrayData): ArrayData = {
    val n = sig.numElements()
    require(n % bands == 0, s"signature length $n not divisible by $bands bands")
    val r = n / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = seed
      var j = b * r
      val end = j + r
      while (j < end) {
        h = XXH64.hashLong(sig.getLong(j), h)
        j += 1
      }
      out(b) = h
      b += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bandHashes", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): BandHashes =
    copy(child = c)
}

/** Sorted distinct k-token shingle hashes — the SET underlying
  * [[MinHashSig]]'s signature (same XXH64 token hashing, same
  * rotate-combine window hash), exposed for exact Jaccard verification of
  * LSH candidates. Jaccard over these 64-bit hash sets equals Jaccard over
  * the shingle-string sets (collisions negligible), and the verify join
  * then shuffles 8-byte hashes instead of reassembled shingle strings. */
case class ShingleHashes(child: Expression, shingleK: Int, seed: Long = 42L)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  def compute(arr: ArrayData): ArrayData = {
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
    val hs = new Array[Long](nw)
    var w = 0
    while (w < nw) {
      var h = 0x9E3779B97F4A7C15L
      var j = w
      val end = math.min(w + shingleK, n)
      while (j < end) {
        h = java.lang.Long.rotateLeft(h ^ toks(j), 27) * 0x165667B19E3779F9L
        j += 1
      }
      hs(w) = h
      w += 1
    }
    java.util.Arrays.sort(hs)
    var wp = 0
    var k = 0
    while (k < hs.length) {
      if (wp == 0 || hs(k) != hs(wp - 1)) { hs(wp) = hs(k); wp += 1 }
      k += 1
    }
    ArrayData.toArrayData(if (wp == hs.length) hs else java.util.Arrays.copyOf(hs, wp))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("shingleHashes", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): ShingleHashes =
    copy(child = c)
}

/** Exact Jaccard of two SORTED-distinct long arrays by one merge scan —
  * |A∩B| / (|A|+|B|−|A∩B|) with no hash-set allocation (replaces
  * `size(array_intersect)/size(array_union)` on the candidate-verify hot
  * path, which builds two hash sets per pair). */
case class SortedJaccard(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sorted_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("sortedJaccard", this)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $self.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedJaccard =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity of two numeric array columns in ONE codegen'd pass —
  * bit-identical to the pure-Column formulation in graft.ops.Similarity
  * (`dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))` with dot =
  * `aggregate(zip_with(a, b, (x,y) => x.cast(double)*y.cast(double)), 0.0,
  * _+_)`): each accumulator is the same left fold from 0.0 in index order,
  * so IEEE rounding matches term for term, and the null semantics are
  * replayed exactly (null array, length mismatch — zip_with pads with null —
  * or any null element all make the Column dot null, hence cosine null).
  * The Column spelling evaluates THREE interpreted CodegenFallback
  * HigherOrderFunction aggregates per pair and knocks the whole projection
  * out of whole-stage codegen; this runs inside it. */
case class CosineSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  @transient private lazy val leftElemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val rightElemType: DataType =
    right.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  private def get(arr: ArrayData, et: DataType, i: Int): Double = et match {
    case DoubleType => arr.getDouble(i)
    case FloatType => arr.getFloat(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case IntegerType => arr.getInt(i).toDouble
    case _ => arr.get(i, et).asInstanceOf[Number].doubleValue()
  }

  /** One-pass kernel; public so generated code can call it. Returns null
    * (boxed) on length mismatch or any null element — the zip_with/aggregate
    * null semantics. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    val lt = leftElemType; val rt = rightElemType
    var dab = 0.0; var daa = 0.0; var dbb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = get(a, lt, i); val y = get(b, rt, i)
      dab += x * y; daa += x * x; dbb += y * y
      i += 1
    }
    val div = math.sqrt(daa) * math.sqrt(dbb)
    // ANSI parity: the Column spec's Divide throws on a 0.0 divisor
    // (zero-norm or empty vectors) instead of yielding NaN/Infinity
    if (div == 0.0)
      throw org.apache.spark.sql.graft.ColumnBridge.divideByZeroError()
    java.lang.Double.valueOf(dab / div)
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("cosineSim", this)
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val boxed = ctx.freshName("cosBoxed")
    val code =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${leftGen.isNull} && !${rightGen.isNull}) {
          java.lang.Double $boxed = $self.compute(${leftGen.value}, ${rightGen.value});
          if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.doubleValue(); }
        }"""
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Per-table hyperplane-LSH bucket ids of an embedding vector, in one pass:
  * `nTables` independent tables of `planesPerTable` seeded Gaussian
  * hyperplanes; bit i of table t's bucket is the sign of dot(vec,
  * plane(t,i)). Bit-identical to the pure-Column formulation in
  * graft.ops.Similarity.lshTables (same plane sequence via
  * Similarity.planes, same ascending-index double summation) but ~50×
  * cheaper: the zip_with/aggregate HigherOrderFunctions are interpreted AND
  * CodegenFallback, so the Column version paid per-element virtual calls ×
  * nTables×planesPerTable and knocked the whole projection out of
  * whole-stage codegen. */
case class HyperplaneSigs(child: Expression, nTables: Int, planesPerTable: Int,
    dim: Int, seed: Long = 42L)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_sigs"

  // flattened [table][plane][component] — identical sequence to
  // Similarity.planes(dim, planesPerTable, seed + t)
  @transient private lazy val planes: Array[Double] = {
    val out = new Array[Double](nTables * planesPerTable * dim)
    var t = 0
    while (t < nTables) {
      val rnd = new scala.util.Random(seed + t)
      var i = 0
      while (i < planesPerTable * dim) {
        out(t * planesPerTable * dim + i) = rnd.nextGaussian()
        i += 1
      }
      t += 1
    }
    out
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  def compute(vec: ArrayData): ArrayData = {
    val et = child.dataType.asInstanceOf[ArrayType].elementType
    val n = math.min(vec.numElements(), dim)
    val x = new Array[Double](n)
    var k = 0
    while (k < n) {
      x(k) = et match {
        case FloatType => vec.getFloat(k).toDouble
        case DoubleType => vec.getDouble(k)
        case _ => vec.getLong(k).toDouble
      }
      k += 1
    }
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var i = 0
      while (i < planesPerTable) {
        val off = (t * planesPerTable + i) * dim
        var acc = 0.0
        var j = 0
        while (j < n) { acc += x(j) * planes(off + j); j += 1 }
        if (acc > 0) bucket |= (1L << i)
        i += 1
      }
      out(t) = bucket
      t += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("hyperplaneSigs", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneSigs =
    copy(child = c)
}

/** Per-language stopword-hit scores of a token array in ONE pass over the
  * tokens: the word→languages dimension (built once on the driver,
  * broadcast inside the expression — the "broadcast dimension table"
  * shape) maps each token to every language claiming it; output is
  * array<long> of hit counts in language order. The pure-Column
  * formulation (one interpreted `filter(tokens, isin(...))` per language)
  * costs a full token pass × |languages| and breaks whole-stage codegen;
  * this is O(tokens) hash lookups regardless of language count. */
case class LangScores(child: Expression, wordLists: Seq[Seq[String]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lang_scores"

  @transient private lazy val wordToLangs: java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    wordLists.zipWithIndex.foreach { case (words, li) =>
      words.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, if (prev == null) Array(li) else prev :+ li)
      }
    }
    m
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  def compute(toks: ArrayData): ArrayData = {
    val scores = new Array[Long](wordLists.size)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (t != null) {
        val langs = wordToLangs.get(t)
        if (langs != null) {
          var j = 0
          while (j < langs.length) { scores(langs(j)) += 1L; j += 1 }
        }
      }
      i += 1
    }
    ArrayData.toArrayData(scores)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("langScores", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): LangScores =
    copy(child = c)
}

/** SHA-256 lowercase hex of a binary column — value-identical to Spark's
  * `sha2(bin, 256)` (same digest, same lowercase-hex rendering, null in →
  * null out) but reuses a THREAD-LOCAL MessageDigest: Spark's kernel goes
  * through commons-codec DigestUtils, which calls
  * MessageDigest.getInstance per row (provider lookup + allocation —
  * measured ~1.5 s of the 10M-doc invariant pass at local[8]). */
case class Sha256Hex(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "sha256_hex"

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[Array[Byte]])

  def compute(bytes: Array[Byte]): UTF8String = {
    val md = Sha256Hex.digests.get()
    md.reset()
    val digest = md.digest(bytes)
    val hex = new Array[Byte](64)
    val tab = NormalizedMd5.HexDigits
    var j = 0
    while (j < 32) {
      hex(j * 2) = tab((digest(j) >> 4) & 0xF)
      hex(j * 2 + 1) = tab(digest(j) & 0xF)
      j += 1
    }
    UTF8String.fromBytes(hex)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("sha256Hex", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }
  override protected def withNewChildInternal(c: Expression): Sha256Hex =
    copy(child = c)
}

object Sha256Hex {
  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("SHA-256"))
}

/** Whitespace token count in one byte pass: the number of fields
  * `split(text, "\\s+")` (Spark limit -1) produces = number of maximal
  * ASCII-whitespace runs + 1 — Java regex `\s` is ASCII-only
  * ([ \t\n\x0B\f\r]), leading empty fields are kept for non-zero-width
  * matches and limit -1 keeps trailing empties, so the run formula is
  * exact (incl. "" -> 1, " " -> 2). Multi-byte UTF-8 units never match
  * an ASCII class, so scanning bytes is safe. */
case class WsTokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "ws_token_count"

  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(compute(v.asInstanceOf[UTF8String]))

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    var runs = 0L
    var inRun = false
    var i = 0
    while (i < bytes.length) {
      if (isWs(bytes(i))) { if (!inRun) { runs += 1; inRun = true } }
      else inRun = false
      i += 1
    }
    runs + 1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("wsTokenCount", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }
  override protected def withNewChildInternal(c: Expression): WsTokenCount =
    copy(child = c)
}

/** BPE-ish pre-token count in one byte pass — the number of matches of
  * `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]` (regexp_extract_all): one per maximal
  * ASCII letter run, one per maximal digit run, one per OTHER non-ASCII-
  * whitespace CODE POINT — Java regex character classes match full code
  * points, so an astral (4-byte UTF-8) character is ONE match
  * (probe-verified on emoji). */
case class BpeishTokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "bpeish_token_count"

  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(compute(v.asInstanceOf[UTF8String]))

  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    var n = 0L
    var i = 0
    val L = bytes.length
    while (i < L) {
      val b = bytes(i)
      if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) {
        n += 1
        do i += 1 while (i < L && ((bytes(i) >= 'A' && bytes(i) <= 'Z') ||
          (bytes(i) >= 'a' && bytes(i) <= 'z')))
      } else if (b >= '0' && b <= '9') {
        n += 1
        do i += 1 while (i < L && bytes(i) >= '0' && bytes(i) <= '9')
      } else if (b == ' ' || b == '\t' || b == '\n' || b == 0x0B ||
          b == '\f' || b == '\r') {
        i += 1
      } else if ((b & 0x80) == 0) { // other ASCII punctuation: one match
        n += 1; i += 1
      } else if ((b & 0xF8) == 0xF0) { // 4-byte sequence: one code point
        n += 1; i += 4
      } else if ((b & 0xF0) == 0xE0) { // 3-byte sequence: one BMP unit
        n += 1; i += 3
      } else if ((b & 0xE0) == 0xC0) { // 2-byte sequence: one BMP unit
        n += 1; i += 2
      } else { // stray continuation byte (malformed): defensive skip
        n += 1; i += 1
      }
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bpeishTokenCount", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }
  override protected def withNewChildInternal(c: Expression): BpeishTokenCount =
    copy(child = c)
}

/** Normalized content hash in one pass: md5 hex of
  * `regexp_replace(trim(lower(text)), "\\s+", " ")` — lowercasing via the
  * same UTF8String.toLowerCase Spark's lower() uses, trim strips ASCII
  * spaces only (UTF8String.trim), every internal ASCII-whitespace run
  * collapses to a single 0x20, then MD5 over the UTF-8 bytes rendered as
  * lowercase hex (byte-identical to Spark's md5()). */
case class NormalizedMd5(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "normalized_md5"

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def compute(s: UTF8String): UTF8String = {
    val lowered = s.toLowerCase.trim.getBytes
    // collapse whitespace runs to single spaces in-place into a new buffer
    val buf = new Array[Byte](lowered.length)
    var o = 0
    var i = 0
    var inRun = false
    while (i < lowered.length) {
      val b = lowered(i)
      if (isWs(b)) {
        if (!inRun) { buf(o) = ' '; o += 1; inRun = true }
      } else { buf(o) = b; o += 1; inRun = false }
      i += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(buf, 0, o)
    val digest = md.digest()
    val hex = new Array[Byte](32)
    val tab = NormalizedMd5.HexDigits
    var j = 0
    while (j < 16) {
      hex(j * 2) = tab((digest(j) >> 4) & 0xF)
      hex(j * 2 + 1) = tab(digest(j) & 0xF)
      j += 1
    }
    UTF8String.fromBytes(hex)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("normalizedMd5", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }
  override protected def withNewChildInternal(c: Expression): NormalizedMd5 =
    copy(child = c)
}

object NormalizedMd5 {
  private[sketch] val HexDigits: Array[Byte] = "0123456789abcdef".getBytes
}

/** Argmax language prediction over a LangScores array: the language with
  * the strictly greatest score, ties to the earliest (lexicographically
  * smallest, since callers pass langs sorted), 'und' when all scores are
  * zero or the array is null. Bit-identical to the Column formulation
  * `langs.map(l => struct(score_l, l)).reduce((a,b) => when(b.s > a.s, b)
  * .otherwise(a))` + the `> 0` guard — which SimplifyExtractValueOps
  * expands to O(2^|langs|) duplicated CASE WHEN branches (measured 255
  * CASE WHENs and a 27 KB plan for 9 languages vs 15 for 4). */
case class LangPred(child: Expression, langs: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "lang_pred"

  @transient private lazy val langStrs: Array[UTF8String] =
    langs.map(UTF8String.fromString).toArray
  @transient private lazy val und = UTF8String.fromString("und")

  // null scores array -> the Column chain degrades to 'und', not null
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) und else compute(v.asInstanceOf[ArrayData])
  }

  def compute(scores: ArrayData): UTF8String = {
    val n = math.min(scores.numElements(), langStrs.length)
    if (n == 0) return und
    var bestScore = scores.getLong(0) // reduce seeds from langs(0)
    var bestIdx = 0
    var i = 1
    while (i < n) {
      val s = scores.getLong(i)
      if (s > bestScore) { bestScore = s; bestIdx = i } // strict > : ties keep first
      i += 1
    }
    if (bestScore > 0) langStrs(bestIdx) else und
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("langPred", this)
    val childGen = child.genCode(ctx)
    val code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = false;
        UTF8String ${ev.value} = ${childGen.isNull}
          ? $self.nullValue() : $self.compute(${childGen.value});"""
    ev.copy(code = code)
  }

  /** 'und' for a null scores array — matches the degraded Column chain. */
  def nullValue(): UTF8String = und

  override protected def withNewChildInternal(c: Expression): LangPred =
    copy(child = c)
}

/** The `nprobe` nearest IVF cells of a vector (by cosine against the
  * driver-trained centroid list), in one codegen'd pass. Centroids are
  * pre-normalized at construction so the per-cell score is a plain dot
  * product. Used by Similarity.ivfTopK: corpus vectors take their single
  * nearest cell, queries probe their `nprobe` nearest. */
case class IvfCells(child: Expression, centroids: Seq[Seq[Double]], nprobe: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ivf_cells"

  @transient private lazy val cents: Array[Array[Double]] =
    centroids.map { c =>
      val a = c.toArray
      val n = math.sqrt(a.map(x => x * x).sum)
      if (n == 0) a else a.map(_ / n)
    }.toArray

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  def compute(vec: ArrayData): ArrayData = {
    val et = child.dataType.asInstanceOf[ArrayType].elementType
    val n = vec.numElements()
    val x = new Array[Double](n)
    var k = 0
    while (k < n) {
      x(k) = et match {
        case FloatType => vec.getFloat(k).toDouble
        case DoubleType => vec.getDouble(k)
        case _ => vec.getLong(k).toDouble
      }
      k += 1
    }
    val scores = new Array[Double](cents.length)
    var c = 0
    while (c < cents.length) {
      val ct = cents(c)
      val m = math.min(n, ct.length)
      var acc = 0.0
      var j = 0
      while (j < m) { acc += x(j) * ct(j); j += 1 }
      scores(c) = acc
      c += 1
    }
    val p = math.min(nprobe, cents.length)
    val order = scores.zipWithIndex.sortBy { case (s, i) => (-s, i) }
    ArrayData.toArrayData(order.take(p).map(_._2))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("ivfCells", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): IvfCells =
    copy(child = c)
}

object SignatureExprs {
  /** Register `minhash_sig(tokens, numHashes, shingleK)`, `simhash_sig
    * (tokens)`, `char_ngrams(s, n)`, `char_ngram_hashes(s, n)`,
    * `char_minhash_sig(s, numHashes, n)` and `band_hashes(sig, bands)`
    * for expr()/SQL use. Idempotent. */
  def register(spark: SparkSession): Unit = {
    def litInt(e: Expression): Int =
      e.eval(null).asInstanceOf[Number].intValue()
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "minhash_sig",
      exprs => MinHashSig(exprs.head, litInt(exprs(1)), litInt(exprs(2))),
      "built-in")
    reg.createOrReplaceTempFunction(
      "simhash_sig", exprs => SimHashSig(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "char_ngrams", exprs => CharNGrams(exprs.head, litInt(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction(
      "char_ngram_hashes",
      exprs => CharNGramHashes(exprs.head, litInt(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction(
      "char_minhash_sig",
      exprs => CharMinHashSig(exprs.head, litInt(exprs(1)), litInt(exprs(2))),
      "built-in")
    reg.createOrReplaceTempFunction(
      "band_hashes",
      exprs => BandHashes(exprs.head, litInt(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction(
      "shingle_hashes",
      exprs => ShingleHashes(exprs.head, litInt(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction(
      "sorted_jaccard",
      exprs => SortedJaccard(exprs(0), exprs(1)), "built-in")
  }
}
