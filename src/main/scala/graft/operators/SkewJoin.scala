package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md / 100 TB design notes).
  *
  * AQE's skew-join handling covers sort-merge joins at runtime, but a
  * hand-salted join is the explicit tool when one side has pathological
  * hot keys and the other side is small enough to replicate: the skewed
  * (large) side gets a random salt in [0, buckets), the replicated
  * (small) side is exploded across every salt value, and the join key
  * becomes (key, salt) — splitting each hot key's rows across `buckets`
  * tasks instead of one straggler.
  *
  * Semantics are identical to `skewed.join(small, keys, "inner"/"left")`;
  * equivalence is unit-tested. The salt uses a seeded deterministic
  * column (hash of the row's own values) rather than rand() so replays
  * and retries are stable.
  */
object SkewJoin {

  /** Inner or left salted equi-join on `key`. `buckets` = salt fan-out —
    * set to (hot-key rows / target rows per task). */
  def saltedJoin(
      skewed: DataFrame, small: DataFrame, key: String,
      buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0)
    require(joinType == "inner" || joinType == "left",
      "salted join supports inner and left joins")
    // deterministic salt: hash of the full skewed row, stable under retry
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(skewed.columns.map(col): _*), lit(buckets)).cast("int"))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    val out = salted.join(replicated, Seq(key, "__salt"), joinType)
    out.drop("__salt")
  }
}
