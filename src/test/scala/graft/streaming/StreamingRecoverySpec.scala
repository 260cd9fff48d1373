package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkSpec

/** Kill-and-restore tests for the mapGroupsWithState /
  * flatMapGroupsWithState monitors: each query is stopped mid-stream and
  * restarted from its checkpoint, and the post-restart emissions must
  * continue from the ACCUMULATED state (counts, sketches, decay folds),
  * not restart from zero. The sinks' replay-safety is covered in
  * StreamingSpec; this is the state-store recovery contract for the
  * monitors themselves. MemoryStream retains its batches in-process, so
  * a restarted query re-resolves the checkpointed offsets against the
  * same source instance — the single-JVM analogue of an executor/driver
  * loss on a real cluster. */
class StreamingRecoverySpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Run `monitor` through a foreachBatch-buffered query (foreachBatch is
    * the recovery-capable sink; the memory sink refuses checkpoint
    * restarts), collecting every emission. */
  private def runWithCheckpoint[T](monitor: Dataset[T], ckpt: String,
      buf: ArrayBuffer[T]): StreamingQuery =
    monitor.writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (ds: Dataset[T], _: Long) =>
        val rows = ds.collect()
        buf.synchronized { buf ++= rows }
        ()
      }
      .start()

  private def tmpCkpt(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_ckpt_$tag").toString

  test("quantile monitor restores its KLL state from the checkpoint") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val ckpt = tmpCkpt("kll")
    val buf = ArrayBuffer[QuantileUpdate]()
    def monitor = Streams.quantileMonitor(mem.toDF(), "user_id", "value", Seq(0.5))

    val q1 = runWithCheckpoint(monitor, ckpt, buf)
    try {
      mem.addData(
        Ev(ts("2024-01-01 10:00:00"), 1L, 1.0, 1),
        Ev(ts("2024-01-01 10:01:00"), 1L, 2.0, 2),
        Ev(ts("2024-01-01 10:02:00"), 1L, 3.0, 3),
        Ev(ts("2024-01-01 10:03:00"), 1L, 4.0, 4))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(buf.last.count === 4L)

    val q2 = runWithCheckpoint(monitor, ckpt, buf)
    try {
      mem.addData(
        Ev(ts("2024-01-01 10:04:00"), 1L, 5.0, 5),
        Ev(ts("2024-01-01 10:05:00"), 1L, 6.0, 6))
      q2.processAllAvailable()
      val last = buf.synchronized(buf.last)
      // state survived the restart: the sketch holds all 6 values, and at
      // this size KLL is exact — median of [1..6] under the sketch's
      // lower-rank convention
      assert(last.count === 6L,
        s"post-restart count must continue from checkpointed state, got ${last.count}")
      assert(last.quantiles.head === 3.0)
    } finally q2.stop()
  }

  test("trending monitor restores its Misra-Gries counters from the checkpoint") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val ckpt = tmpCkpt("mg")
    val buf = ArrayBuffer[TrendingUpdate]()
    def monitor = Streams.trendingTermsMonitor(
      mem.toDF().withColumn("k", org.apache.spark.sql.functions.lit("all")),
      "k", "text", capacity = 8)

    val q1 = runWithCheckpoint(monitor, ckpt, buf)
    try {
      mem.addData(Doc(1L, "alpha alpha beta"))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(buf.last.processed === 3L)

    val q2 = runWithCheckpoint(monitor, ckpt, buf)
    try {
      mem.addData(Doc(2L, "alpha gamma"))
      q2.processAllAvailable()
      val last = buf.synchronized(buf.last)
      assert(last.processed === 5L,
        s"processed-token count must continue from state, got ${last.processed}")
      val counts = last.terms.toMap
      // MG at capacity 8 over 4 distinct terms is exact
      assert(counts("alpha") === 3L)
      assert(counts("beta") === 1L)
      assert(counts("gamma") === 1L)
    } finally q2.stop()
  }

  test("rate monitor restores its trailing hour buckets from the checkpoint") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val ckpt = tmpCkpt("rate")
    val buf = ArrayBuffer[RateUpdate]()
    def monitor = Streams.rateMonitor(mem.toDF(), "user_id", "ts", trailingHours = 24)

    // batch 1: baseline hours 10:xx=1, 11:xx=3, 12:xx=2 events
    val q1 = runWithCheckpoint(monitor, ckpt, buf)
    try {
      mem.addData(
        Ev(ts("2024-01-01 10:00:00"), 1L, 0.0, 1),
        Ev(ts("2024-01-01 11:00:00"), 1L, 0.0, 2),
        Ev(ts("2024-01-01 11:10:00"), 1L, 0.0, 3),
        Ev(ts("2024-01-01 11:20:00"), 1L, 0.0, 4),
        Ev(ts("2024-01-01 12:00:00"), 1L, 0.0, 5),
        Ev(ts("2024-01-01 12:10:00"), 1L, 0.0, 6))
      q1.processAllAvailable()
    } finally q1.stop()

    // restart, then a 5-event spike in hour 13: baseline must be the
    // RESTORED {1, 3, 2} buckets -> mean 2, sd 1, z = (5-2)/1 = 3
    val q2 = runWithCheckpoint(monitor, ckpt, buf)
    try {
      mem.addData((1 to 5).map(i =>
        Ev(ts(s"2024-01-01 13:0$i:00"), 1L, 0.0, 10L + i)): _*)
      q2.processAllAvailable()
      val spike = buf.synchronized(
        buf.filter(u => u.cnt === 5L).last)
      assert(spike.n_baseline === 3L,
        s"baseline must come from checkpointed buckets, got ${spike.n_baseline}")
      assert(spike.z === Some(3.0))
    } finally q2.stop()
  }

  test("engagement monitor restores its decay fold from the checkpoint") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val ckpt = tmpCkpt("eng")
    val buf = ArrayBuffer[EngagementUpdate]()
    // half-life 1 day; batch 2's event lands exactly one day after batch
    // 1's, so the restored sum decays by exactly 1/2
    def monitor = Streams.engagementMonitor(mem.toDF(), "user_id", "ts", "value", 1.0)

    val q1 = runWithCheckpoint(monitor, ckpt, buf)
    try {
      mem.addData(Ev(ts("2024-01-01 10:00:00"), 1L, 4.0, 1))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(buf.last.decayed_sum === 4.0)

    val q2 = runWithCheckpoint(monitor, ckpt, buf)
    try {
      mem.addData(Ev(ts("2024-01-02 10:00:00"), 1L, 1.0, 2))
      q2.processAllAvailable()
      val last = buf.synchronized(buf.last)
      assert(last.n_events === 2L,
        s"event count must continue from state, got ${last.n_events}")
      // 4.0 halved over one half-life + the new 1.0 at the reference
      assert(math.abs(last.decayed_sum - 3.0) < 1e-9)
      assert(last.last_seen_us ===
        ts("2024-01-02 10:00:00").getTime * 1000L)
    } finally q2.stop()
  }
}
