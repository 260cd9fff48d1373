package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC-style table maintenance — the compaction step every long-lived
  * 100 TB corpus needs: fold a (much smaller) batch of upserts into a
  * base table without rewriting semantics into ad-hoc joins at every
  * call site.
  *
  * Scale shape: `base LEFT ANTI JOIN keys(updates)` + union. The anti
  * join is the only operation touching the big side and it shuffles (or
  * broadcast-prunes, when the update batch is small enough for AQE to
  * broadcast the deduped key set) by the merge key exactly once; the
  * union is a no-shuffle concatenation. Nothing is collected.
  */
object Merge {

  /** Upsert: rows of `updates` replace base rows sharing their key;
    * update rows with unseen keys are inserts. Both inputs must share a
    * schema. Deterministic for a deterministic `updates` batch: if
    * `updates` itself carries duplicate keys, callers dedup first
    * (e.g. [[Dedup.exact]]) — this operator does not pick among them. */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    val missing = keys.filterNot(base.columns.contains)
    require(missing.isEmpty, s"key columns missing from base: ${missing.mkString(", ")}")
    base.join(updates.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .unionByName(updates)
  }

  /** Delete-aware variant: tombstone keys are removed from the result
    * entirely (the GDPR/right-to-be-forgotten path). */
  def upsertWithDeletes(
      base: DataFrame, updates: DataFrame, deletes: DataFrame,
      keys: Seq[String]): DataFrame =
    upsert(base, updates, keys)
      .join(deletes.select(keys.map(col): _*).distinct(), keys, "left_anti")
}
