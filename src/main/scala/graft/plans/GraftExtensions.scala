package graft.plans

import graft.functions.{CosineSimilarity, Int8Quantize, WordNgrams}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions for SQL use (`SELECT cosine_sim(a, b)`,
  * `SELECT word_ngrams(text, 3)`) and injects the
  * [[BandedIntervalJoinRule]] optimizer rule (interval-only theta joins →
  * banded equi joins; gated on `spark.graft.rangeJoin.bandSeconds`).
  * Installed session-wide by `GraftSession.configure` via
  * `spark.sql.extensions`; also usable with
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => BandedIntervalJoinRule())
    e.injectOptimizerRule(_ => DimsFirstJoinReorder())
    e.injectFunction(
      (FunctionIdentifier("cosine_sim"),
        new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
        (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
    e.injectFunction(
      (FunctionIdentifier("int8_quantize"),
        new ExpressionInfo(classOf[Int8Quantize].getName, "int8_quantize"),
        (args: Seq[Expression]) => Int8Quantize(args(0))))
    e.injectFunction(
      (FunctionIdentifier("word_ngrams"),
        new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams"),
        (args: Seq[Expression]) => args(1) match {
          case Literal(n: Int, _) => WordNgrams(args(0), n)
          case other => throw new IllegalArgumentException(
            s"word_ngrams(text, n): n must be an integer literal, got $other")
        }))
  }
}
