package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.CosineSim

/** Production registration path for graft's native expressions
  * (SURVEY.md §2b custom-operator preference (c)): deploy with
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *
  * and `cosine_sim` is available in SQL on every session of the
  * cluster. Driver-contract queries instead register per-session via
  * `CosineSim.register` because they receive an already-built session;
  * both paths install the same expression builder.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(
        classOf[CosineSim].getCanonicalName, null, "cosine_sim",
        "cosine_sim(a, b) - cosine similarity of two float vectors", ""),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSim(children(0), children(1))))
  }
}
