package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.graft.CosineSimilarity

/** Session extensions entry point — wire with
  * `spark.sql.extensions=graft.GraftExtensions`.
  *
  * Registers the engine's custom Catalyst expressions for SQL use. No
  * optimizer rules or planner strategies are injected: every reference-parity
  * operator plans fine through stock Catalyst (SURVEY §4), and an
  * LSH-bucketed rewrite of cosine-threshold joins would change results — it
  * stays an explicit API ([[graft.ops.Similarity.annTopK]]), not a silent
  * plan rewrite.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(exprs(0), exprs(1))))
  }
}
