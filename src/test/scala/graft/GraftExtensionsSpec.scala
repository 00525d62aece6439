package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The config-driven registration path: a session constructed with
  * `spark.sql.extensions=graft.GraftExtensions` must resolve the native
  * functions from SQL with no registerAll call. Builds a second
  * SparkSession over the shared SparkContext (extensions apply
  * per-session), restoring the previous default/active sessions after.
  */
class GraftExtensionsSpec extends AnyFunSuite with SharedSpark {

  test("spark.sql.extensions=graft.GraftExtensions registers the SQL surface") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = Tables.configure(
        SparkSession.builder()
          .master("local[2]")
          .config("spark.sql.extensions", "graft.GraftExtensions"))
        .getOrCreate()
      val row = s.sql(
        """SELECT
          |  l2_norm(array(3.0F, 4.0F)) AS nrm,
          |  cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS cs,
          |  size(chunk_text('a b c d e', 3, 1)) AS ct
          |""".stripMargin).collect()(0)
      assert(row.getDouble(0) == 5.0)
      assert(math.abs(row.getDouble(1) - 1.0) < 1e-9)
      assert(row.getInt(2) == 4)
      // the aggregate path: a bare AggregateFunction from the builder
      // must be analyzer-wrapped into an AggregateExpression
      val agg = s.sql(
        """SELECT topk_by(id, s, 1)[0].id AS best
          |FROM VALUES (1L, 0.3D), (2L, 0.7D) AS t(id, s)
          |""".stripMargin).collect()(0)
      assert(agg.getLong(0) == 2L)
      // ad-hoc SQL with a non-BIGINT id must fail AT ANALYSIS with the
      // aggregate's own message (naming the fix), not a runtime cast
      // error — the typed-id contract documented on GraftExtensions
      val idErr = intercept[org.apache.spark.sql.AnalysisException] {
        s.sql("""SELECT topk_by(id, s, 1) FROM
                |VALUES (1, 0.3D) AS t(id, s)""".stripMargin).collect()
      }
      assert(idErr.getMessage.contains("topk_by id must be BIGINT"),
        idErr.getMessage)
      // a foldable NULL k likewise fails at analysis, not mid-execution
      val kErr = intercept[org.apache.spark.sql.AnalysisException] {
        s.sql("""SELECT topk_by(id, s, CAST(NULL AS INT)) FROM
                |VALUES (1L, 0.3D) AS t(id, s)""".stripMargin).collect()
      }
      assert(kErr.getMessage.contains("non-null INT literal"), kErr.getMessage)
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
