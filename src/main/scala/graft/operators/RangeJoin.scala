package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Banded (bucketized) range join for time-proximity predicates with NO
  * equi key (SURVEY.md §2.C row 3).
  *
  * `left.join(right, rTs > lTs && rTs <= lTs + W)` has no equi conjunct,
  * so Spark can only plan a broadcast nested-loop / cartesian product —
  * quadratic, and a non-starter at scale. Banding restores an equi key:
  * band(ts) = floor(epochMicros / W). A right row with rTs ∈
  * (lTs, lTs + W] satisfies band(rTs) ∈ {band(lTs), band(lTs) + 1}, so
  * the left side is replicated to those two band keys (a 2x explode, not
  * a cross product), the join runs as a plain shuffled equi join on the
  * band, and the exact range predicate filters residual pairs. Each
  * qualifying (l, r) pair meets exactly once — a right row lives in ONE
  * band and the left row emits each band key at most once — so no dedup
  * pass is needed.
  *
  * At 100 TB this is the shape you want: shuffle keyed by time band
  * (high cardinality, naturally balanced for steady event streams), cost
  * linear in matches. A hot band (traffic spike) can additionally ride
  * [[SkewJoin]]'s salting. The BNLJ form stays available as the oracle
  * baseline for bounded inputs.
  */
object RangeJoin {

  /** Pairs where `right.rTime` is in `(left.lTime, left.lTime + windowSec]`.
    * Left and right must have disjoint column names; output carries all
    * columns of both sides. */
  def bandedAfter(
      left: DataFrame, lTime: String,
      right: DataFrame, rTime: String,
      windowSec: Long): DataFrame = {
    require(windowSec > 0, "windowSec must be positive")
    val wUs = windowSec * 1000000L
    val lBand = floor(unix_micros(col(lTime)) / wUs).cast("long")
    val rBand = floor(unix_micros(col(rTime)) / wUs).cast("long")
    val lBanded = left.withColumn("__band", explode(array(lBand, lBand + 1)))
    val rBanded = right.withColumn("__band", rBand)
    lBanded.join(rBanded, Seq("__band"))
      .filter(col(rTime) > col(lTime) &&
        unix_micros(col(rTime)) <= unix_micros(col(lTime)) + wUs)
      .drop("__band")
  }
}
