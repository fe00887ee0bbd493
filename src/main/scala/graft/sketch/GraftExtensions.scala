package graft.sketch

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions registering the engine's custom Catalyst surface,
  * so `spark.sql.extensions=graft.sketch.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) makes every graft function
  * available in every session of a cluster without per-session
  * registration — the spark-submit-friendly twin of
  * [[SignatureExprs.register]] / [[KllSketchAgg.register]] /
  * [[TopKPairsAgg.register]]. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litInt(e: Expression): Int =
    e.eval(null).asInstanceOf[Number].intValue()

  override def apply(e: SparkSessionExtensions): Unit = {
    def inject(name: String, clazz: Class[_],
        builder: Seq[Expression] => Expression): Unit =
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name), builder))

    inject("kll_sketch", classOf[KllSketchAgg],
      exprs => KllSketchAgg(exprs.head))
    inject("topk_pairs", classOf[TopKPairsAgg],
      exprs => TopKPairsAgg(exprs(0), exprs(1), litInt(exprs(2))))
    inject("minhash_sig", classOf[MinHashSig],
      exprs => MinHashSig(exprs.head, litInt(exprs(1)), litInt(exprs(2))))
    inject("simhash_sig", classOf[SimHashSig],
      exprs => SimHashSig(exprs.head))
    inject("char_ngrams", classOf[CharNGrams],
      exprs => CharNGrams(exprs.head, litInt(exprs(1))))
    inject("char_ngram_hashes", classOf[CharNGramHashes],
      exprs => CharNGramHashes(exprs.head, litInt(exprs(1))))
    inject("char_minhash_sig", classOf[CharMinHashSig],
      exprs => CharMinHashSig(exprs.head, litInt(exprs(1)), litInt(exprs(2))))
    inject("band_hashes", classOf[BandHashes],
      exprs => BandHashes(exprs.head, litInt(exprs(1))))
    inject("shingle_hashes", classOf[ShingleHashes],
      exprs => ShingleHashes(exprs.head, litInt(exprs(1))))
    inject("sorted_jaccard", classOf[SortedJaccard],
      exprs => SortedJaccard(exprs(0), exprs(1)))
    inject("hyperplane_sigs", classOf[HyperplaneSigs],
      exprs => HyperplaneSigs(exprs.head, litInt(exprs(1)), litInt(exprs(2)),
        litInt(exprs(3))))
  }
}
