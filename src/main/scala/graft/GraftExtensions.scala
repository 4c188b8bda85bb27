package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{BpeCount, CosineSimilarity, FeatureHashVec,
  HyperplaneSig, MinHashSig, SimHash64, SimHashSig, SizedArg, VectorAvg}

/** Session-extension entry point: users opt in with
  * `spark.sql.extensions=graft.GraftExtensions` and get the native
  * functions in every new SparkSession — the declarative alternative to
  * [[graft.functions.GraftFunctions.register]] (which the queries call
  * imperatively so they also work on sessions created without the config,
  * e.g. the driver's own).
  *
  * No optimizer rule for the global-window-top-k antipattern is injected
  * on purpose: Spark's own `LimitPushDownThroughWindow` +
  * `InferWindowGroupLimit` already rewrite `filter(rn <= k)` over an
  * unpartitioned row_number window into a pushed-down limit. The patterns
  * Spark can NOT fix — full global numbering like `(rn - 1) % 3 == 1` —
  * are covered by [[graft.operators.RankOps.globalRowNumber]] instead.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => MinHashSig(exprs.head,
        if (exprs.length > 1) SizedArg.literalInt("minhash_sig", "rows", exprs(1))
        else MinHashSig.DefaultRows,
        if (exprs.length > 2) SizedArg.literalInt("minhash_sig", "bands", exprs(2))
        else MinHashSig.DefaultBands)))
    ext.injectFunction((
      FunctionIdentifier("vector_avg"),
      new ExpressionInfo(classOf[VectorAvg].getName, "vector_avg"),
      (exprs: Seq[Expression]) => VectorAvg(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("simhash_sig"),
      new ExpressionInfo(classOf[SimHashSig].getName, "simhash_sig"),
      (exprs: Seq[Expression]) => SimHashSig(exprs.head,
        if (exprs.length > 1) SizedArg.literalInt("simhash_sig", "words", exprs(1))
        else SimHashSig.DefaultWords)))
    ext.injectFunction((
      FunctionIdentifier("hyperplane_sig"),
      new ExpressionInfo(classOf[HyperplaneSig].getName, "hyperplane_sig"),
      (exprs: Seq[Expression]) => HyperplaneSig(exprs.head,
        SizedArg.literalInt("hyperplane_sig", "width", exprs(1)),
        SizedArg.literalInt("hyperplane_sig", "probes", exprs(2)))))
    ext.injectFunction((
      FunctionIdentifier("bpe_count"),
      new ExpressionInfo(classOf[BpeCount].getName, "bpe_count"),
      (exprs: Seq[Expression]) => BpeCount(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("feature_hash_vec"),
      new ExpressionInfo(classOf[FeatureHashVec].getName, "feature_hash_vec"),
      (exprs: Seq[Expression]) => FeatureHashVec(exprs.head,
        SizedArg.literalInt("feature_hash_vec", "dim", exprs(1)))))
  }
}
