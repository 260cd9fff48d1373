package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SequencesSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("transitionMatrix: per-key adjacency in time order, conditional probabilities") {
    val s = spark
    import s.implicits._
    // user 1: a -> b -> a ; user 2: a -> c — transitions from 'a': b, a? no:
    // u1 steps (a,b), (b,a); u2 step (a,c). from 'a': {b:1, c:1} p=0.5 each
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a", 1L),
      (1L, ts("2024-01-01 10:01:00"), "b", 2L),
      (1L, ts("2024-01-01 10:02:00"), "a", 3L),
      (2L, ts("2024-01-01 10:00:00"), "a", 4L),
      (2L, ts("2024-01-01 10:05:00"), "c", 5L))
      .toDF("user_id", "ts", "state", "event_id")
    val out = Sequences.transitionMatrix(df, "user_id", "ts", "state", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out.keySet === Set(("a", "b"), ("b", "a"), ("a", "c")))
    assert(out(("a", "b")) === (1L, 0.5) && out(("a", "c")) === (1L, 0.5))
    assert(out(("b", "a")) === (1L, 1.0))
    // tie-break makes equal timestamps deterministic: two events at the
    // same instant order by event_id
    val tied = Seq(
      (1L, ts("2024-01-01 10:00:00"), "x", 1L),
      (1L, ts("2024-01-01 10:00:00"), "y", 2L))
      .toDF("user_id", "ts", "state", "event_id")
    val t = Sequences.transitionMatrix(tied, "user_id", "ts", "state", "event_id")
      .collect()
    assert(t.length === 1 && t.head.getString(0) === "x" && t.head.getString(1) === "y")
  }

  test("conversionFunnel: strict first-touch ordering gates each stage") {
    val s = spark
    import s.implicits._
    val df = Seq(
      // user 1 converts fully in order
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:01:00"), "click"),
      (1L, ts("2024-01-01 10:02:00"), "buy"),
      // user 2 clicked BEFORE viewing: stops at view
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      // user 3 never viewed: converts nothing
      (3L, ts("2024-01-01 10:00:00"), "click"),
      // user 4 view -> click, no buy
      (4L, ts("2024-01-01 10:00:00"), "view"),
      (4L, ts("2024-01-01 11:00:00"), "click"))
      .toDF("user_id", "ts", "event_type")
    val out = Sequences.conversionFunnel(df, "user_id", "ts", "event_type",
        Seq("view", "click", "buy"))
      .orderBy("stage_idx").collect()
    assert(out.map(_.getString(1)).toSeq === Seq("view", "click", "buy"))
    assert(out.map(_.getLong(2)).toSeq === Seq(3L, 2L, 1L)) // users 1,2,4 / 1,4 / 1
    assert(math.abs(out(1).getDouble(3) - 2.0 / 3.0) < 1e-12)
    // empty first stage: rates are null, not a division error
    val none = Sequences.conversionFunnel(df, "user_id", "ts", "event_type",
        Seq("nope", "view")).orderBy("stage_idx").collect()
    assert(none.head.getLong(2) === 0L && none.forall(_.isNullAt(3)))
  }

  test("topPaths: complete sliding windows only, per-key, counted") {
    val s = spark
    import s.implicits._
    // u1: a b c b c -> paths a>b>c, b>c>b, c>b>c ; u2: a b c -> a>b>c
    val df = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"), (1L, 4L, "b"), (1L, 5L, "c"),
      (2L, 1L, "a"), (2L, 2L, "b"), (2L, 3L, "c"))
      .map { case (u, i, st) => (u, ts(f"2024-01-01 00:00:0$i"), st, i) }
      .toDF("user_id", "ts", "state", "event_id")
    val out = Sequences.topPaths(df, "user_id", "ts", "state", "event_id",
        length = 3, minCount = 1L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a>b>c" -> 2L, "b>c>b" -> 1L, "c>b>c" -> 1L))
    // minCount prunes the singletons; no cross-user windows exist
    val top = Sequences.topPaths(df, "user_id", "ts", "state", "event_id", 3, 2L)
      .collect()
    assert(top.length === 1 && top.head.getString(0) === "a>b>c")
  }

  test("retentionCohorts: first-period cohorts, offset counts, rates") {
    val s = spark
    import s.implicits._
    // period = 1 day. users 1,2 start day 0; user 1 returns day 1 and 2;
    // user 3 starts day 1 and returns day 2
    val df = Seq(
      (1L, ts("2024-01-01 00:00:01")), (1L, ts("2024-01-02 05:00:00")),
      (1L, ts("2024-01-03 07:00:00")),
      (2L, ts("2024-01-01 10:00:00")),
      (3L, ts("2024-01-02 01:00:00")), (3L, ts("2024-01-03 01:00:00")))
      .toDF("user_id", "ts")
    val out = Sequences.retentionCohorts(df, "user_id", "ts", periodDays = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    // cohort 0 = {1, 2}; day-1 and day-2 returns = {1} -> 0.5
    assert(out((0L, 0L)) === (2L, 1.0))
    assert(out((0L, 1L)) === (1L, 0.5) && out((0L, 2L)) === (1L, 0.5))
    // cohort 1 = {3}, returns at offset 1
    assert(out((1L, 0L)) === (1L, 1.0) && out((1L, 1L)) === (1L, 1.0))
    assert(out.size === 5)
  }
}
