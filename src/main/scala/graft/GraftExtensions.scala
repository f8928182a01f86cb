package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, DotProduct}

/** Session extension registering graft's native Catalyst expressions with
  * the SQL function registry, so the SQL front-end can call them directly:
  *
  *   spark.sql("SELECT cosine_similarity(a.embedding, b.embedding) ...")
  *
  * Install via `SparkSession.builder.withExtensions(new GraftExtensions)`
  * or `--conf spark.sql.extensions=graft.GraftExtensions` (GraftSession
  * does the former). This is the (c)-tier extension point from the design
  * guidance — functions only; no custom Rule/Strategy is needed anywhere
  * in this engine (SURVEY.md §4: the plans are already optimal declarative
  * shapes, and a gratuitous rewrite rule would just add planning cost).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, null, "vector_dot",
        "vector_dot(a, b) - dot product of two double arrays in index order",
        ""),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, null,
        "cosine_similarity",
        "cosine_similarity(a, b) - cosine similarity of two double arrays",
        ""),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
  }
}
