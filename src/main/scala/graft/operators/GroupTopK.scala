package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Scale-safe per-group top-k for LOW-CARDINALITY group keys
  * (SURVEY.md §2.C row 5; 100 TB design notes).
  *
  * The standard ranked-window idiom — `row_number over (partition by key
  * order by ...)` — shuffles every row of its group to ONE task: with 5
  * distinct keys, each task sorts 20% of the table, a straggler by
  * construction at scale. This operator keeps the same semantics with a
  * salted two-phase plan:
  *
  *  1. local phase — rank within (key, salt) where salt is a
  *     deterministic hash of the ordering columns mod `salts`; parallelism
  *     is #keys x salts, each task sorting ~1/(#keys*salts) of the data;
  *     survivors per (key, salt) bucket: k.
  *  2. merge phase — rank the <= salts*k survivors per key; this window
  *     IS single-task-per-key, but over a bounded, tiny input.
  *
  * The result is independent of the salt assignment: every global top-k
  * row ranks <= k inside whatever bucket it lands in (a bucket holds a
  * subset of its key's rows), so phase 1 never discards a global top-k
  * row, and phase 2 computes the exact final ranking. Equivalence with
  * the plain window form is unit-tested; the physical shape (first
  * exchange on (key, salt), second on the bounded survivor set) is
  * asserted in PlanSpec.
  *
  * The ordering should be a total order (add a unique tie-break column,
  * e.g. the row id) — same caveat as the window form, which is otherwise
  * nondeterministic at the rank-k boundary.
  */
object GroupTopK {

  /** Top `k` rows per group of `keys`, ranked by `ordering`, with the
    * rank exposed as `rankCol`. `salts` = local-phase fan-out per key;
    * size it to (rows per hot key / target rows per task). */
  def topK(
      df: DataFrame, keys: Seq[String], ordering: Seq[Column], k: Int,
      rankCol: String = "rn", salts: Int = 32): DataFrame = {
    require(k > 0 && salts > 0)
    // deterministic salt: hash of the full row (as in SkewJoin.saltedJoin)
    // — stable under retry/replay, uniform on any non-degenerate data.
    // Map-typed columns are not hashable in Spark; skip them (any other
    // column set still spreads, and with NO hashable columns the salt
    // degenerates to 0 = the plain window plan, which stays correct).
    val hashable = df.schema.fields
      .filterNot(f => hasMapType(f.dataType)).map(f => col(f.name)).toSeq
    val saltExpr =
      if (hashable.isEmpty) lit(0)
      else pmod(xxhash64(hashable: _*), lit(salts)).cast("int")
    val salted = df.withColumn("__salt", saltExpr)
    val local = Window.partitionBy((keys.map(col) :+ col("__salt")): _*)
      .orderBy(ordering: _*)
    val survivors = salted
      .withColumn("__local_rn", row_number().over(local))
      .filter(col("__local_rn") <= k)
      .drop("__salt", "__local_rn")
    val merge = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    survivors.withColumn(rankCol, row_number().over(merge))
      .filter(col(rankCol) <= k)
  }

  private def hasMapType(dt: DataType): Boolean = dt match {
    case _: MapType => true
    case ArrayType(e, _) => hasMapType(e)
    case s: StructType => s.fields.exists(f => hasMapType(f.dataType))
    case _ => false
  }
}
