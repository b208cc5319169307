package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's custom
  * expressions as SQL functions, so a cluster user gets them with
  *   --conf spark.sql.extensions=graft.functions.GraftExtensions
  * and can write e.g. `SELECT graft_simhash(tokens) FROM docs` in plain SQL.
  * (In-process users can call GraftFunctions.register / the Column API.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_rolling_hash"),
      info("graft_rolling_hash", "graft_rolling_hash(str) - 64-bit polynomial content fingerprint"),
      (exprs: Seq[Expression]) => RollingHash64(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "graft_simhash(tokens) - 64-bit SimHash sketch of a token array"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity of two float vectors"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_word_shingles"),
      info("graft_word_shingles", "graft_word_shingles(tokens, k) - distinct word k-shingles"),
      (exprs: Seq[Expression]) =>
        WordShinglesExpr(exprs(0), exprs(1).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("graft_char_shingles"),
      info("graft_char_shingles", "graft_char_shingles(str, k) - distinct char k-gram count"),
      (exprs: Seq[Expression]) =>
        CharShingleCountExpr(exprs(0), exprs(1).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "graft_minhash(shingles, n) - n-slot MinHash signature"),
      (exprs: Seq[Expression]) =>
        MinHashExpr(exprs(0), exprs(1).eval().asInstanceOf[Int])))
  }
}
