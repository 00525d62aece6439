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
  *
  * Typed contract of the `topk_by` aggregate at this SQL surface: the
  * id argument must be BIGINT (`CAST(id AS BIGINT)` for narrower ids —
  * the Column API applies that cast for you, raw SQL does not), the
  * score BIGINT or DOUBLE (BIGINT compares exactly at any magnitude;
  * no implicit widening, because a silent cast of a fixed-point BIGINT
  * score to DOUBLE would corrupt ordering past 2^53), and k a non-null
  * INT literal. Violations fail at analysis with a message naming the
  * rule (see `TopKByScore.checkInputDataTypes`), pinned by
  * GraftExtensionsSpec.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    functions.sqlBuilders.foreach { case (name, builder) =>
      extensions.injectFunction(
        (FunctionIdentifier(name), new ExpressionInfo("graft", name), builder))
    }
}
