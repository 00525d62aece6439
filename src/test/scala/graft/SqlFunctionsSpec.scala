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
}
