package graft

import org.scalatest.funsuite.AnyFunSuite

/** The native expressions must be reachable from SQL text after
  * `graft.functions.registerAll` (the library's SQL surface).
  */
class SqlFunctionsSpec extends AnyFunSuite with SharedSpark {

  test("all graft functions are callable from spark.sql") {
    graft.functions.registerAll(spark)
    val row = spark.sql(
      """SELECT
        |  cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS cs,
        |  dot_product(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS dp,
        |  l2_dist_sq(array(0.0F, 0.0F), array(3.0F, 4.0F)) AS d2,
        |  l2_norm(array(3.0F, 4.0F)) AS nrm,
        |  size(hash_embed('some text', 16)) AS hd,
        |  simhash64('a b c') AS sh,
        |  rolling_hash('ab') AS rh,
        |  size(minhash_sig(array('abc','def'), 32)) AS ms,
        |  size(minhash_text('abcdefgh', 6, 32)) AS mt,
        |  sig_jaccard_est(array(1L, 2L), array(1L, 3L)) AS sje,
        |  size(chunk_text('a b c d e', 3, 1)) AS ct,
        |  size(byte_histogram(cast('abc' AS BINARY), 16)) AS bh
        |""".stripMargin).collect()(0)
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-9)
    assert(row.getDouble(1) == 11.0)
    assert(row.getDouble(2) == 25.0)
    assert(row.getDouble(3) == 5.0)
    assert(row.getInt(4) == 16)
    assert(row.getLong(5) == graft.functions.VectorOps.simhash64("a b c"))
    assert(row.getLong(6) == graft.functions.VectorOps.rollingHash("ab"))
    assert(row.getInt(7) == 32)
    assert(row.getInt(8) == 32)
    assert(row.getDouble(9) == 0.5)
    assert(row.getInt(10) == 4)
    assert(row.getInt(11) == 16)
  }

  test("pq_adc resolves from SQL and sums the right LUT blocks") {
    graft.functions.registerAll(spark)
    // 2 subspaces, K=3: codes (2, 0) pick lut[0*3+2]=5.0 and lut[1*3+0]=7.0
    val row = spark.sql(
      """SELECT
        |  pq_adc(array(2, 0),
        |    array(1.0D, 3.0D, 5.0D, 7.0D, 11.0D, 13.0D)) AS s,
        |  pq_adc(array(2, 0), CAST(NULL AS ARRAY<DOUBLE>)) AS n
        |""".stripMargin).collect()(0)
    assert(row.getDouble(0) == 12.0)
    assert(row.isNullAt(1))
    // an out-of-range code must fail loudly, never read a foreign block
    val err = intercept[Exception] {
      spark.sql("SELECT pq_adc(array(3, 0), array(1.0D, 2.0D, 3.0D, 4.0D))")
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    assert(messages(err).exists(m => m != null && m.contains("out of range")))
  }

  test("pq_adc rejects mistyped SQL input at analysis time") {
    graft.functions.registerAll(spark)
    // array<bigint> codes through the raw SQL-registry path: without the
    // declared input types this would reach toIntArray and be MISREAD
    // (4-byte strides over 8-byte longs) into garbage codes — it must
    // fail analysis instead, never produce a wrong ADC sum
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT pq_adc(array(2L, 0L), array(1.0D, 2.0D, 3.0D, 4.0D))")
        .collect()
    }
    assert(err.getMessage != null)
  }
}
