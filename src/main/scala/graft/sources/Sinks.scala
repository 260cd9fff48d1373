package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}

/** Result sinks (SURVEY.md §2.C scans/sinks row): columnar parquet as
  * the default, csv/json for interop, and bucketed managed tables for
  * co-located (shuffle-free) joins on a stable key.
  *
  * Bucketing is the 100 TB lever here: two tables bucketed+sorted on the
  * same key with the same bucket count join WITHOUT a shuffle exchange on
  * either side — the exchange that would otherwise move the fact table is
  * pre-paid once at write time. */
object Sinks {

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** ORC — the other columnar interchange format Spark ships natively
    * (predicate pushdown + column pruning work the same as parquet);
    * for pipelines whose upstream warehouse is ORC-based. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Compacting writer — the small-files remedy: pick the output file
    * count from the optimizer's size estimate so each file lands near
    * `targetFileBytes` (default 128 MB, the usual HDFS/parquet sweet
    * spot). A 100 TB pipeline that writes per-micro-batch or
    * per-fine-partition otherwise accumulates millions of KB-sized files
    * whose open/footer overhead dominates reads. Uses repartition (a
    * shuffle) for even file sizes — compaction IS the job here, so the
    * one-time shuffle is the point, not an accident. */
  def writeCompacted(df: DataFrame, path: String,
      targetFileBytes: Long = 128L << 20): Unit = {
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val files = math.max(1L, (bytes.toLong + targetFileBytes - 1) / targetFileBytes).toInt
    df.repartition(files).write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Hive-style partitioned parquet layout — directory-per-value on the
    * partition columns. The physical design for low-cardinality scan
    * predicates at 100 TB: equality/IN filters on a partition column
    * become DIRECTORY skips (static pruning, no footer reads at all),
    * and a selective dimension join on the partition column becomes a
    * runtime skip via dynamic partition pruning (the subquery-built
    * filter Spark injects into the scan; asserted in PlanSpec).
    * Partition columns must be low-cardinality — one directory (and at
    * least one file) per value; a high-cardinality partition key is the
    * small-files anti-pattern [[writeCompacted]] exists to fix. */
  def writePartitioned(df: DataFrame, path: String, parts: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(parts: _*).parquet(path)

  /** Write a managed table bucketed (and sorted) by `key` for co-located
    * joins; read back with `spark.table(name)`. */
  def writeBucketed(df: DataFrame, name: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(name)

  /** [[writeBucketed]] with an explicit filesystem location (external
    * table) — bucketed layouts outside the session warehouse. */
  def writeBucketedExternal(df: DataFrame, name: String, path: String,
      key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .format("parquet")
      .saveAsTable(name)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Z-ordered parquet layout: range-partition by the Morton key of two
    * dimension columns, sort within partitions, write. Files then hold
    * disjoint z-ranges (range partitioning guarantees it), so parquet
    * min/max footer stats prune files for predicates on EITHER
    * dimension — the two-column file-skipping layout a 100 TB events
    * table wants for (user, time)-style scans. The key column itself is
    * written so readers can push a z-range predicate directly. */
  def writeZOrdered(df: DataFrame, path: String,
      xCol: String, yCol: String, bits: Int, files: Int): Unit = {
    import org.apache.spark.sql.functions.col
    val keyed = df.withColumn("zkey",
      graft.functions.ZOrder.morton2(
        graft.functions.ZOrder.clampCode(col(xCol), bits),
        graft.functions.ZOrder.clampCode(col(yCol), bits), bits))
    keyed.repartitionByRange(files, col("zkey"))
      .sortWithinPartitions("zkey")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Deterministic TRAINING-SHARD export — the materialization of
    * [[graft.operators.Sampling.shuffleOrder]]'s reproducible global
    * permutation: rows land in `shards` near-equal parquet shard
    * directories (`shard=0..`), each holding a contiguous span of the
    * md5(seed # key) order, rows sorted by that hash within the shard.
    * Reading shard dirs in shard order (rows in file order, or sorted by
    * the written `shuffle_hash` for a global tie-proof order) replays
    * the identical training order on any cluster, any number of times.
    *
    * Shard boundaries are DETERMINISTIC, not sampled: the shard id is a
    * fixed-width bucket of the hash's three leading hex digits (uniform
    * for a cryptographic digest, monotone in the hash order — the same
    * no-sampling principle as Packing.deterministicSlice), so shard
    * membership is a pure function of (seed, key). repartitionByRange
    * here would draw sampled boundaries — a re-run could shift rows
    * between shards, breaking resume-from-shard-k training runs.
    * One shuffle total (hash partition by shard id), one file per shard
    * (each shard is exactly one write task). `shards` ≤ 4096 (the hex
    * prefix granularity). */
  def writeTrainingShards(df: DataFrame, path: String, keyCol: String,
      seed: Long, shards: Int): Unit = {
    import org.apache.spark.sql.functions._
    require(shards > 0 && shards <= 4096, s"shards must be in 1..4096, got $shards")
    val h = md5(concat_ws("#", lit(seed), col(keyCol).cast("string")))
    val bucket = (conv(substring(col("shuffle_hash"), 1, 3), 16, 10).cast("int")
      * shards / 4096).cast("int")
    df.withColumn("shuffle_hash", h)
      .withColumn("shard", bucket)
      .repartition(shards, col("shard"))
      .sortWithinPartitions("shard", "shuffle_hash")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard")
      .parquet(path)
  }

  /** [[writeTrainingShards]] plus the profile sidecar a 100 TB pipeline
    * should ALWAYS write: one mergeable profile row per (shard, column)
    * ([[graft.operators.Profiles]] — exact moments + KLL/HLL sketch
    * bytes) stored at `path/_profiles`. Profiling reads the WRITTEN
    * artifact back (a columnar scan of just `profileCols` + the shard
    * partition column), not the input lineage — the profile always
    * describes exactly what landed on disk, and costs a narrow scan
    * instead of re-executing the upstream plan. The `_profiles` prefix
    * keeps the sidecar invisible to readers of `path` (underscore paths
    * are filtered by Spark's file index, like `_SUCCESS`). The corpus
    * profile of ANY subset of shards — or of many shard exports unioned
    * — is `Profiles.mergeProfiles` over the sidecar rows: profiling the
    * corpus never rescans it. Returns the sidecar frame. */
  def writeTrainingShardsWithProfiles(df: DataFrame, path: String, keyCol: String,
      seed: Long, shards: Int, profileCols: Seq[String], k: Int = 200): DataFrame = {
    writeTrainingShards(df, path, keyCol, seed, shards)
    writeProfileSidecar(df.sparkSession, path, profileCols, k)
  }

  /** Generic profiled-shard export: rows land in a parquet directory per
    * `shardCol` value with the `_profiles` sidecar next to them. Unlike
    * [[writeTrainingShards]] (whose hash order deliberately DECORRELATES
    * shards from every column, for training reproducibility), the shard
    * key here is the caller's — typically an ingest-time bucket (day,
    * source, batch id), the layout a 100 TB corpus actually arrives in —
    * so the sidecar's per-shard min/max DO separate values and
    * [[readPruned]] can drop whole shards. */
  def writeShardedWithProfiles(df: DataFrame, path: String, shardCol: Column,
      profileCols: Seq[String], k: Int = 200): DataFrame = {
    import org.apache.spark.sql.functions.col
    df.withColumn("shard", shardCol.cast("int"))
      .repartition(col("shard"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard")
      .parquet(path)
    writeProfileSidecar(df.sparkSession, path, profileCols, k)
  }

  /** Profile the WRITTEN artifact (a narrow columnar scan of just
    * `profileCols` + the shard partition column — the profile always
    * describes exactly what landed on disk) into `path/_profiles`. */
  private def writeProfileSidecar(spark: SparkSession, path: String,
      profileCols: Seq[String], k: Int): DataFrame = {
    import org.apache.spark.sql.functions.col
    val written = spark.read.parquet(path)
    graft.operators.Profiles.shardProfiles(written, col("shard"), profileCols, k)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/_profiles")
    spark.read.parquet(s"$path/_profiles")
  }

  /** Sidecar-pruned read of a profiled-shard export: the `_profiles`
    * rows carry EXACT per-(shard, column) min/max, so a range predicate
    * on a profiled column drops whole shards from the scan before Spark
    * ever lists their files. This is the zone map ABOVE parquet's
    * per-file footer stats: footer pruning still pays the file listing
    * and footer reads — at 100 TB a million-file corpus makes the
    * listing itself a cost — while the sidecar decision reads
    * |shards| × |cols| rows (≤ a few thousand) on the driver, the same
    * economics as a catalog's partition pruning.
    *
    * Returns the rows of `path` with `lower ≤ column ≤ upper` (a missing
    * bound is unbounded): shards whose [min, max] interval cannot
    * intersect the range — including all-null shards, which a range
    * predicate excludes anyway — are never read, and the row-level
    * filter is re-applied inside surviving shards (shard pruning is
    * necessarily coarse). Pruning hinges on layout: it bites when the
    * shard key correlates with `column` ([[writeShardedWithProfiles]]'s
    * ingest-time buckets), and degrades to a full scan — never a wrong
    * answer — on the decorrelated [[writeTrainingShards]] hash order. */
  def readPruned(spark: SparkSession, path: String, column: String,
      lower: Option[Double] = None, upper: Option[Double] = None): DataFrame =
    readPrunedAll(spark, path, Seq((column, lower, upper)))

  /** Conjunctive [[readPruned]]: a shard survives only when EVERY
    * (column, lower, upper) range can intersect its [min, max] interval
    * — zone-map pruning composes across profiled columns, so an export
    * profiled on (ingest day, value) prunes on either or both. The
    * row-level conjunction is re-applied inside surviving shards. */
  def readPrunedAll(spark: SparkSession, path: String,
      preds: Seq[(String, Option[Double], Option[Double])]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    require(preds.nonEmpty, "readPrunedAll requires at least one predicate")
    val prof = spark.read.parquet(s"$path/_profiles")
      .select(col("shard").cast("string").as("shard"), col("col"),
        col("min"), col("max"))
      .collect() // ≤|shards|×|cols| rows — a driver-side decision,
                 // never grows with the data
      .groupBy(_.getString(0))
    // a shard with NO profile row for a predicate column is kept — the
    // sidecar prunes only what it can prove out (never a wrong answer)
    val live = prof.collect { case (shard, rows) =>
      val byCol = rows.map(r => r.getString(1) -> (r.get(2), r.get(3))).toMap
      val ok = preds.forall { case (c, lo, hi) =>
        byCol.get(c).forall { case (mn, mx) =>
          // all-null shard (null min): a range predicate excludes it
          mn != null &&
            lo.forall(_ <= mx.asInstanceOf[Number].doubleValue()) &&
            hi.forall(_ >= mn.asInstanceOf[Number].doubleValue())
        }
      }
      if (ok) Some(shard) else None
    }.flatten.toSeq.sorted
    val src =
      if (live.isEmpty) spark.read.parquet(path).limit(0)
      else spark.read.option("basePath", path)
        .parquet(live.map(s => s"$path/shard=$s"): _*)
    preds.foldLeft(src) { case (df, (c, lo, hi)) =>
      df.filter(lo.map(col(c) >= _).getOrElse(lit(true)) &&
        hi.map(col(c) <= _).getOrElse(lit(true)))
    }
  }
}
