package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("banded range join equals the naive theta join, including band-boundary cases") {
    val s = spark
    import s.implicits._
    // left at 0s, 100s, 3600s; rights placed just inside/outside the
    // (l, l+120] window and straddling band boundaries (band width=120s)
    val left = Seq((1L, ts(0)), (2L, ts(100)), (3L, ts(3600)))
      .toDF("lid", "lts")
    val right = Seq(
      (10L, ts(0)),    // equal to left 1: excluded (strict >)
      (11L, ts(1)),    // in window of 1
      (12L, ts(120)),  // exactly l+120 of 1: included (inclusive <=)
      (13L, ts(121)),  // outside for 1 (>120), inside for 2's (100, 220]
      (14L, ts(239)),  // outside for 2 (>220), band-boundary probe
      (15L, ts(3700)), // inside for 3
      (16L, ts(3721))  // outside for 3
    ).toDF("rid", "rts")
    val banded = RangeJoin.bandedAfter(left, "lts", right, "rts", 120)
      .select("lid", "rid").orderBy("lid", "rid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val naive = left.join(right,
        col("rts") > col("lts") &&
        col("rts") <= col("lts") + expr("INTERVAL 120 SECONDS"))
      .select("lid", "rid").orderBy("lid", "rid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(banded === naive)
    assert(banded === Seq((1L, 11L), (1L, 12L), (2L, 12L), (2L, 13L), (3L, 15L)))
  }

  test("banded range join emits each qualifying pair exactly once") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, ts(50))).toDF("lid", "lts")
    val right = Seq((10L, ts(60))).toDF("rid", "rts")
    val out = RangeJoin.bandedAfter(left, "lts", right, "rts", 120).collect()
    assert(out.length === 1)
  }
}
