package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic key-salting for skewed equi-joins (100 TB toolkit).
  *
  * AQE's skew-join split handles most sort-merge skew automatically; this
  * explicit variant covers the cases AQE cannot: a hot key whose rows
  * must hash-join against a non-broadcastable build side, or engines
  * running with AQE disabled. The salt is a hash of the probe row's
  * non-key columns — deterministic (no `rand()`, so results are
  * reproducible and retry-safe) while still spreading a hot key across
  * `saltFactor` reducers; the build side is replicated `saltFactor`×.
  *
  * Limitation: rows of a hot key that are FULLY duplicated (identical in
  * every non-key column) hash to one salt and stay on one reducer —
  * deterministic salting cannot spread indistinguishable rows. Collapse
  * exact duplicates first, or fall back to AQE's runtime split.
  */
object SkewJoin {

  /** Equi-join `big ⋈ small` on `bigKey == smallKey` with the big side
    * salted and the small side replicated. Semantics identical to the
    * plain inner join; the shuffle key becomes (key, salt). Both sides
    * are aliased (`gsj_b`/`gsj_s`) so the common co-named-key case
    * (e.g. both sides keyed `orderkey`) resolves unambiguously; like
    * any `===` join, the output then carries both key columns —
    * disambiguate downstream with `col("gsj_b.<key>")`.
    */
  def saltedEquiJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      saltFactor: Int = 8): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val nonKey: Seq[Column] = big.columns.filterNot(_ == bigKey).map(col(_)).toSeq
    val saltExpr =
      if (nonKey.isEmpty) lit(0) else pmod(hash(nonKey: _*), lit(saltFactor))
    val saltedBig = big.withColumn("__graft_salt_b", saltExpr).as("gsj_b")
    val replicatedSmall = small.withColumn("__graft_salt_s",
      explode(sequence(lit(0), lit(saltFactor - 1)))).as("gsj_s")
    saltedBig
      .join(replicatedSmall,
        col(s"gsj_b.$bigKey") === col(s"gsj_s.$smallKey") &&
          col("gsj_b.__graft_salt_b") === col("gsj_s.__graft_salt_s"))
      .drop("__graft_salt_b", "__graft_salt_s")
  }
}
