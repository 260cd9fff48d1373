package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loaders for the engine's test corpus (TESTDATA.md).
  *
  * Scale notes: `spark.read.parquet` is the vectorized columnar reader;
  * filters/projections push down automatically. The only special case is
  * nanosecond-precision timestamps: Spark (through 4.1) refuses
  * INT64(TIMESTAMP(NANOS)) parquet columns, so we read them as raw nanos
  * via `spark.sql.legacy.parquet.nanosAsLong` and floor-convert to
  * microsecond TimestampType — a lossless ordering-preserving truncation
  * (floor), matching how any downstream date_trunc bucketing floors.
  *
  * Timestamp flavor: the generator's `events.ts` has alternated between
  * TIMESTAMP(NANOS) and plain TIMESTAMP(MICROS, isAdjustedToUTC=false);
  * the latter loads as TimestampNTZType, which Spark 4 refuses in
  * instant-expecting functions (unix_micros, watermarks) — so the
  * stream-time column normalizes to instant TimestampType either way.
  * All engine sessions (Verify/Bench/tests) pin
  * spark.sql.session.timeZone=UTC, so the NTZ→TIMESTAMP cast is the
  * identity on the underlying micros — the same instant DuckDB sees
  * reading the file natively. Date-ladder columns (l_shipdate,
  * o_orderdate) stay NTZ as loaded: they never feed instant functions,
  * and describe/date queries OUTPUT them, where NTZ is required for
  * parity with DuckDB's naive rendering (see the verify skill). */
object Tables {

  val All: Seq[String] = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Inferred-schema memo, keyed by file path. `spark.read.parquet`
    * with no user schema runs a driver JOB per call to read footers
    * (visible as "parquet at Tables.scala" in any job log) — ~45 ms of
    * pure scheduling latency that every query paid 1–2× at CONSTRUCTION
    * time, ~10–20 s across a 247-query bench pass (r17 measurement).
    * A production deployment reads through a catalog whose schema is
    * declared once, not re-inferred per query — this memo is that
    * catalog seam: METADATA only (a StructType), never rows; every
    * action still scans the parquet files themselves. Keyed by path so
    * distinct scale dirs coexist; entries are tiny and bounded by the
    * table count. */
  private val schemaMemo =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/$name.parquet"
    val schema = schemaMemo.computeIfAbsent(path,
      _ => spark.read.parquet(path).schema)
    val df = spark.read.schema(schema).parquet(path)
    // any nanos-as-long column comes back as LongType where the writer meant
    // a timestamp; convert the known stream-time column.
    // integer `div`, NOT `/`: double division of epoch-nanos (~1.7e18)
    // exceeds the 2^53 double mantissa and corrupts the microsecond digit
    if (name == "events") df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    } else df
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
