package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Config-driven registration of the graft function family: a session
  * built with
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * (spark-submit `--conf`, cluster defaults, or any builder) resolves
  * every native expression from SQL text with no imperative
  * `graft.functions.registerAll` call — the deployment shape for shared
  * clusters, SQL gateways, and notebooks where user code never touches
  * the session builder. Uses only the public `SparkSessionExtensions`
  * injection API; the builder table is the same one `registerAll` uses,
  * so the two registration paths cannot drift.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    functions.sqlBuilders.foreach { case (name, builder) =>
      extensions.injectFunction(
        (FunctionIdentifier(name), new ExpressionInfo("graft", name), builder))
    }
}
