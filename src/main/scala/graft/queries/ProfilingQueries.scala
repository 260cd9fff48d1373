package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{Bounds, ColumnRules, Report}
import graft.operators.Describe
import graft.queries.QueryDef.{r, rSql}
import graft.sources.Tables

/** Oracle-checked queries over the profiling/validation engine
  * (reference surface petk/exploration.py + petk/tools.py + petk/
  * validation.py). Each query routes through the engine ([[Report]]), not
  * ad-hoc aggregation, so the oracle checks the engine itself. */
object ProfilingQueries {

  /** Driver-side twin of [[QueryDef.r]] for stats already collected. */
  private def rd(x: Double, digits: Int): Double = {
    val s = math.pow(10, digits)
    math.floor(x * s + 0.5) / s
  }

  private def oneRow(spark: SparkSession, fields: Seq[(String, DataType, Any)]): DataFrame = {
    val schema = StructType(fields.map { case (n, t, _) => StructField(n, t) })
    spark.createDataFrame(
      java.util.Collections.singletonList(Row(fields.map(_._3): _*)), schema)
  }

  /** Full numeric describe() ladder on lineitem.l_extendedprice
    * (petk/tools.py:37-68). One row, every NUMERIC stat. */
  def describeNumericLineitem(spark: SparkSession, dir: String): DataFrame = {
    val rep = Report(Tables.lineitem(spark, dir), key = Some("l_orderkey"))
    val p = rep.describe(Seq("l_extendedprice")).head
    val s = p.stats
    def d(k: String) = s(k).asInstanceOf[Double]
    def l(k: String) = s(k).asInstanceOf[Long]
    def b(k: String) = s(k).asInstanceOf[Boolean]
    oneRow(spark, Seq(
      ("count", LongType, l("count")),
      ("n_null", LongType, l("n_null")),
      ("p_null", DoubleType, d("p_null")),
      ("distinct_count", LongType, l("distinct_count")),
      ("is_constant", BooleanType, b("is_constant")),
      ("is_unique", BooleanType, b("is_unique")),
      ("p_unique", DoubleType, d("p_unique")),
      ("min", DoubleType, d("min")),
      ("max", DoubleType, d("max")),
      ("q05", DoubleType, rd(d("5%"), 6)),
      ("q25", DoubleType, rd(d("25%"), 6)),
      ("q50", DoubleType, rd(d("50%"), 6)),
      ("q75", DoubleType, rd(d("75%"), 6)),
      ("q95", DoubleType, rd(d("95%"), 6)),
      ("mean", DoubleType, rd(d("mean"), 6)),
      ("std", DoubleType, rd(d("std"), 6)),
      ("variance", DoubleType, rd(d("variance"), 4)),
      ("iqr", DoubleType, rd(d("iqr"), 6)),
      ("kurtosis", DoubleType, rd(d("kurtosis"), 6)),
      ("skewness", DoubleType, rd(d("skewness"), 6)),
      ("sum", DoubleType, rd(d("sum"), 2)),
      ("mad", DoubleType, rd(d("mad"), 6)),
      ("cv", DoubleType, rd(d("cv"), 6)),
      ("n_zeros", LongType, l("n_zeros")),
      ("p_zeros", DoubleType, d("p_zeros")),
      ("n_infinite", LongType, l("n_infinite")),
      ("p_infinite", DoubleType, d("p_infinite"))))
  }

  private val describeNumericOracle: String = {
    val c = "l_extendedprice"
    def q(p: String) = s"quantile_cont($c, $p)"
    s"""SELECT count($c) AS "count",
       | count(*) - count($c) AS n_null,
       | (count(*) - count($c)) / CAST(count(*) AS DOUBLE) AS p_null,
       | count(DISTINCT $c) AS distinct_count,
       | count(DISTINCT $c) = 1 AS is_constant,
       | count(DISTINCT $c) = count(*) AS is_unique,
       | count(DISTINCT $c) / CAST(count(*) AS DOUBLE) AS p_unique,
       | min($c) AS "min", max($c) AS "max",
       | ${rSql(q("0.05"), 6)} AS q05,
       | ${rSql(q("0.25"), 6)} AS q25,
       | ${rSql(q("0.5"), 6)} AS q50,
       | ${rSql(q("0.75"), 6)} AS q75,
       | ${rSql(q("0.95"), 6)} AS q95,
       | ${rSql(s"avg($c)", 6)} AS mean,
       | ${rSql(s"stddev_samp($c)", 6)} AS std,
       | ${rSql(s"var_samp($c)", 4)} AS variance,
       | ${rSql(s"${q("0.75")} - ${q("0.25")}", 6)} AS iqr,
       | ${rSql(s"kurtosis($c)", 6)} AS kurtosis,
       | ${rSql(s"skewness($c)", 6)} AS skewness,
       | ${rSql(s"sum($c)", 2)} AS "sum",
       | ${rSql(s"avg(abs($c - (SELECT avg($c) FROM lineitem)))", 6)} AS mad,
       | ${rSql(s"stddev_samp($c) / avg($c)", 6)} AS cv,
       | count(CASE WHEN $c = 0 THEN 1 END) AS n_zeros,
       | count(CASE WHEN $c = 0 THEN 1 END) / CAST(count(*) AS DOUBLE) AS p_zeros,
       | count(CASE WHEN isinf($c) THEN 1 END) AS n_infinite,
       | count(CASE WHEN isinf($c) THEN 1 END) / CAST(count(*) AS DOUBLE) AS p_infinite
       |FROM lineitem""".stripMargin
  }

  /** STRING-ladder describe on orders.o_orderpriority: base + distinct
    * block only (petk/tools.py:18-34). */
  def describeStringOrders(spark: SparkSession, dir: String): DataFrame = {
    val rep = Report(Tables.orders(spark, dir), key = Some("o_orderkey"))
    val p = rep.describe(Seq("o_orderpriority")).head
    val s = p.stats
    oneRow(spark, Seq(
      ("content_type", StringType, s("content_type")),
      ("count", LongType, s("count")),
      ("n_null", LongType, s("n_null")),
      ("p_null", DoubleType, s("p_null")),
      ("distinct_count", LongType, s("distinct_count")),
      ("is_constant", BooleanType, s("is_constant")),
      ("is_unique", BooleanType, s("is_unique")),
      ("p_unique", DoubleType, s("p_unique"))))
  }

  private val describeStringOracle: String =
    """SELECT 'STRING' AS content_type,
      | count(o_orderpriority) AS "count",
      | count(*) - count(o_orderpriority) AS n_null,
      | (count(*) - count(o_orderpriority)) / CAST(count(*) AS DOUBLE) AS p_null,
      | count(DISTINCT o_orderpriority) AS distinct_count,
      | count(DISTINCT o_orderpriority) = 1 AS is_constant,
      | count(DISTINCT o_orderpriority) = count(*) AS is_unique,
      | count(DISTINCT o_orderpriority) / CAST(count(*) AS DOUBLE) AS p_unique
      |FROM orders""".stripMargin

  /** DATE-ladder describe on lineitem.l_shipdate: base + distinct +
    * min/max (petk/tools.py:41-48; interpolated date quantiles are
    * unit-tested, not oracle-checked — SURVEY.md §5.2). */
  def describeDateLineitem(spark: SparkSession, dir: String): DataFrame = {
    val rep = Report(Tables.lineitem(spark, dir), key = Some("l_orderkey"))
    val p = rep.describe(Seq("l_shipdate")).head
    val s = p.stats
    oneRow(spark, Seq(
      ("content_type", StringType, s("content_type")),
      ("count", LongType, s("count")),
      ("n_null", LongType, s("n_null")),
      ("distinct_count", LongType, s("distinct_count")),
      ("is_unique", BooleanType, s("is_unique")),
      // NTZ, not instant: tz-aware parquet would mismatch DuckDB's naive
      ("min", TimestampNTZType, s("min")),
      ("max", TimestampNTZType, s("max"))))
  }

  private val describeDateOracle: String =
    """SELECT 'DATE' AS content_type,
      | count(l_shipdate) AS "count",
      | count(*) - count(l_shipdate) AS n_null,
      | count(DISTINCT l_shipdate) AS distinct_count,
      | count(DISTINCT l_shipdate) = count(*) AS is_unique,
      | min(l_shipdate) AS "min", max(l_shipdate) AS "max"
      |FROM lineitem""".stripMargin

  /** BOOLEAN-ladder describe (petk/tools.py:37-40) on a derived bool
    * column (the corpus has no native bool column): l_returnflag = 'A'. */
  def describeBoolLineitem(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .withColumn("is_return", col("l_returnflag") === lit("A"))
    val rep = Report(li, key = Some("l_orderkey"))
    val p = rep.describe(Seq("is_return")).head
    val s = p.stats
    oneRow(spark, Seq(
      ("content_type", StringType, s("content_type")),
      ("count", LongType, s("count")),
      ("distinct_count", LongType, s("distinct_count")),
      ("is_constant", BooleanType, s("is_constant")),
      ("mean", DoubleType, rd(s("mean").asInstanceOf[Double], 6))))
  }

  private val describeBoolOracle: String =
    s"""SELECT 'BOOLEAN' AS content_type,
       | count(*) AS "count",
       | CAST(count(DISTINCT l_returnflag = 'A') AS BIGINT) AS distinct_count,
       | count(DISTINCT l_returnflag = 'A') = 1 AS is_constant,
       | ${rSql("avg(CAST(l_returnflag = 'A' AS INT))", 6)} AS mean
       |FROM lineitem""".stripMargin

  /** introduce() on lineitem (petk/exploration.py:34-49): rows/columns/
    * observations + the column-type census (EMPTY-refined classifier).
    * memory_usage is excluded — it is a Spark-side size estimate with no
    * pandas/DuckDB equivalent (SURVEY.md A7). */
  def introduceLineitem(spark: SparkSession, dir: String): DataFrame = {
    val rep = Report(Tables.lineitem(spark, dir), key = Some("l_orderkey"))
    rep.introduce()
      .filter(col("metric") =!= "memory_usage")
      .orderBy("section", "metric")
  }

  private val introduceOracle: String = {
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
      "l_linestatus", "l_shipdate")
    val missing = cols.map(c => s"(count(*) - count($c))").mkString(" + ")
    s"""SELECT * FROM (
       | SELECT 'basic' AS section, 'columns' AS metric, CAST(11 AS BIGINT) AS value FROM lineitem LIMIT 1)
       |UNION ALL SELECT 'basic', 'rows', count(*) FROM lineitem
       |UNION ALL SELECT 'observations', 'total', 11 * count(*) FROM lineitem
       |UNION ALL SELECT 'observations', 'missing', $missing FROM lineitem
       |UNION ALL SELECT 'columns', 'date', 1
       |UNION ALL SELECT 'columns', 'numeric', 8
       |UNION ALL SELECT 'columns', 'string', 2
       |ORDER BY section, metric""".stripMargin
  }

  /** validate() `accepted` rule on orders.o_orderstatus
    * (petk/validation.py:47-51): every row whose status is outside
    * {O, F} — including nulls, matching pandas ~isin(NaN) = True. */
  def validateAcceptedOrders(spark: SparkSession, dir: String): DataFrame = {
    val rep = Report(Tables.orders(spark, dir),
      schema = Map("o_orderstatus" -> ColumnRules(accepted = Some(Seq("O", "F")))),
      key = Some("o_orderkey"))
    rep.validate()
  }

  private val validateAcceptedOracle: String =
    """SELECT 'o_orderstatus' AS "column", o_orderkey AS "index",
      | 'accepted' AS "function",
      | 'Value not within the accepted range' AS notes
      |FROM orders
      |WHERE o_orderstatus IS NULL OR o_orderstatus NOT IN ('O', 'F')
      |ORDER BY "column", "index", "function", notes""".stripMargin

  /** validate() `range` rule on lineitem.l_quantity with bounds [2, 49]
    * (petk/validation.py:36-45, petk/tools.py:104-110). Row key is the
    * composite l_orderkey*8 + l_linenumber (linenumber <= 7). */
  def validateRangeLineitem(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .withColumn("li_key", col("l_orderkey") * 8 + col("l_linenumber"))
    val rep = Report(li,
      schema = Map("l_quantity" -> ColumnRules(range = Some(Bounds(Some(2.0), Some(49.0))))),
      key = Some("li_key"))
    rep.validate()
  }

  private val validateRangeOracle: String =
    """SELECT 'l_quantity' AS "column",
      | l_orderkey * 8 + l_linenumber AS "index",
      | 'range' AS "function",
      | CASE WHEN l_quantity < 2 THEN 'Value is less than the lower bound'
      |      WHEN l_quantity > 49 THEN 'Value is greater than the upper bound'
      | END AS notes
      |FROM lineitem
      |WHERE l_quantity < 2 OR l_quantity > 49
      |ORDER BY "column", "index", "function", notes""".stripMargin

  /** Multi-rule validate() on orders — accepted + range in one schema,
    * exercising findings assembly + (column, index, function) ordering
    * (petk/exploration.py:107-124). */
  def validateMultiOrders(spark: SparkSession, dir: String): DataFrame = {
    val rep = Report(Tables.orders(spark, dir),
      schema = Map(
        "o_orderstatus" -> ColumnRules(accepted = Some(Seq("O", "F"))),
        "o_totalprice" -> ColumnRules(range = Some(Bounds(Some(25000.0), Some(250000.0))))),
      key = Some("o_orderkey"))
    rep.validate()
  }

  // findings relation shared by the plain and verbose validation oracles
  private val multiFindingsSql: String =
    """SELECT 'o_orderstatus' AS "column", o_orderkey AS "index",
      |  'accepted' AS "function", 'Value not within the accepted range' AS notes
      | FROM orders WHERE o_orderstatus IS NULL OR o_orderstatus NOT IN ('O', 'F')
      | UNION ALL
      | SELECT 'o_totalprice', o_orderkey, 'range',
      |  CASE WHEN o_totalprice < 25000 THEN 'Value is less than the lower bound'
      |       WHEN o_totalprice > 250000 THEN 'Value is greater than the upper bound' END
      | FROM orders WHERE o_totalprice < 25000 OR o_totalprice > 250000""".stripMargin

  private val validateMultiOracle: String =
    s"""SELECT * FROM (
       |$multiFindingsSql)
       |ORDER BY "column", "index", "function", notes""".stripMargin

  /** Verbose validation (A56): findings joined back to the source rows —
    * the reference's validate(verbose=True) (petk/exploration.py:139-141)
    * under an exact oracle. Projects a stable column subset (the join
    * itself is what A56 asserts; floats ride rounded). */
  def validateVerboseOrders(spark: SparkSession, dir: String): DataFrame = {
    val rep = Report(Tables.orders(spark, dir),
      schema = Map(
        "o_orderstatus" -> ColumnRules(accepted = Some(Seq("O", "F"))),
        "o_totalprice" -> ColumnRules(range = Some(Bounds(Some(25000.0), Some(250000.0))))),
      key = Some("o_orderkey"))
    rep.validate(verbose = true)
      .select(col("column"), col("index"), col("function"), col("notes"),
        col("o_orderstatus"), col("o_orderpriority"),
        r(col("o_totalprice"), 2).as("o_totalprice"))
      .orderBy("column", "index", "function", "notes")
  }

  private val validateVerboseOracle: String =
    s"""WITH f AS (
       |$multiFindingsSql)
       |SELECT f."column", f."index", f."function", f.notes,
       | o.o_orderstatus, o.o_orderpriority,
       | ${rSql("o.o_totalprice", 2)} AS o_totalprice
       |FROM f JOIN orders o ON f."index" = o.o_orderkey
       |ORDER BY "column", "index", "function", notes""".stripMargin

  /** The 100 TB mode: single-pass describe with HLL++ distinct and
    * KLL quantiles. The SKETCH fields (distinct_count, q50) are
    * approximate by contract, so an independent engine cannot reproduce
    * them value-for-value; like `kll_quantile_check`, the engine instead
    * measures each estimate's error against the EXACT answer on the gate
    * data and emits bound-satisfaction booleans the oracle asserts — the
    * distinct estimate within ±10% of the exact cardinality (HLL++ at
    * rsd 0.05 expects ~1.6%), the median estimate's rank within ±0.05
    * (KLL k=1024 expects ~0.4%), so the booleans are stable, not flaky.
    * The verification pass exists only for the gate; the exact fields of
    * the same describe pass keep their value oracle here and in
    * [[describeApproxMoments]]. */
  def describeApproxLineitem(spark: SparkSession, dir: String): DataFrame = {
    val rep = Report(Tables.lineitem(spark, dir), key = Some("l_orderkey"),
      approximate = true)
    val s = rep.describe(Seq("l_extendedprice")).head.stats
    val q50Est = s("50%").asInstanceOf[Double]
    val distinctEst = s("distinct_count").asInstanceOf[Long].toDouble
    val v = Tables.lineitem(spark, dir)
      .select(col("l_extendedprice").cast("double").as("v"))
    v.agg(count(col("v")).as("n"), countDistinct(col("v")).as("nd"),
        count(when(col("v") < lit(q50Est), 1)).as("lt"),
        count(when(col("v") <= lit(q50Est), 1)).as("le"))
      .select(
        lit(s("count").asInstanceOf[Long]).as("count"),
        lit(rd(s("mean").asInstanceOf[Double], 6)).as("mean"),
        lit(rd(s("std").asInstanceOf[Double], 6)).as("std"),
        (abs(lit(distinctEst) / col("nd") - 1.0) <= 0.1).as("distinct_ok"),
        ((col("lt") / col("n") - 0.05 <= 0.5) &&
          (col("le") / col("n") + 0.05 >= 0.5)).as("q50_within_eps"))
  }

  private val describeApproxLineitemOracle: String = {
    val c = "l_extendedprice"
    s"""SELECT count($c) AS "count",
       | ${rSql(s"avg($c)", 6)} AS mean,
       | ${rSql(s"stddev_samp($c)", 6)} AS std,
       | true AS distinct_ok, true AS q50_within_eps
       |FROM lineitem""".stripMargin
  }

  /** Exact-by-definition statistics of the approximate (single-pass) mode:
    * count/mean/std/sum/min/max come from the same codegen'd moments agg
    * whether or not sketches ride along, so they have an exact oracle even
    * in 100 TB mode. */
  def describeApproxMoments(spark: SparkSession, dir: String): DataFrame = {
    val rep = Report(Tables.lineitem(spark, dir), key = Some("l_orderkey"),
      approximate = true)
    val p = rep.describe(Seq("l_extendedprice")).head
    val s = p.stats
    oneRow(spark, Seq(
      ("count", LongType, s("count")),
      ("n_null", LongType, s("n_null")),
      ("min", DoubleType, s("min")),
      ("max", DoubleType, s("max")),
      ("mean", DoubleType, rd(s("mean").asInstanceOf[Double], 6)),
      ("std", DoubleType, rd(s("std").asInstanceOf[Double], 6)),
      ("sum", DoubleType, rd(s("sum").asInstanceOf[Double], 2)),
      ("n_zeros", LongType, s("n_zeros"))))
  }

  private val describeApproxMomentsOracle: String = {
    val c = "l_extendedprice"
    s"""SELECT count($c) AS "count",
       | count(*) - count($c) AS n_null,
       | min($c) AS "min", max($c) AS "max",
       | ${rSql(s"avg($c)", 6)} AS mean,
       | ${rSql(s"stddev_samp($c)", 6)} AS std,
       | ${rSql(s"sum($c)", 2)} AS "sum",
       | count(CASE WHEN $c = 0 THEN 1 END) AS n_zeros
       |FROM lineitem""".stripMargin
  }

  /** Whole-table profile in the engine's long-form result-sink shape:
    * (column, statistic, value) for every numeric lineitem column at once
    * — the describe ladder's cross-column assembly under ONE oracle row
    * set, not just per-type single-column slices. */
  def describeLongLineitem(spark: SparkSession, dir: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rep = Report(Tables.lineitem(spark, dir), key = Some("l_orderkey"))
    val rows = rep.describe(LongFormCols).flatMap { p =>
      val s = p.stats
      def d(k: String) = s(k).asInstanceOf[Number].doubleValue()
      Seq(
        ("count", d("count")), ("n_null", d("n_null")),
        ("distinct_count", d("distinct_count")),
        ("min", d("min")), ("max", d("max")),
        ("mean", rd(d("mean"), 6)), ("std", rd(d("std"), 6)),
        ("sum", rd(d("sum"), 2)), ("q50", rd(d("50%"), 6))
      ).map { case (stat, v) => Row(p.column, stat, v) }
    }
    spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("column", StringType), StructField("statistic", StringType),
      StructField("value", DoubleType))))
      .orderBy("column", "statistic")
  }

  // low-cardinality numerics: the point here is the cross-column long-form
  // assembly; the expensive high-cardinality freq pass is already under
  // bench+oracle via describe_numeric_lineitem (l_extendedprice)
  private val LongFormCols = Seq("l_quantity", "l_discount", "l_tax", "l_linenumber")

  private val describeLongOracle: String = {
    def stats(c: String) = Seq(
      "count" -> s"CAST(count($c) AS DOUBLE)",
      "n_null" -> s"CAST(count(*) - count($c) AS DOUBLE)",
      "distinct_count" -> s"CAST(count(DISTINCT $c) AS DOUBLE)",
      "min" -> s"CAST(min($c) AS DOUBLE)",
      "max" -> s"CAST(max($c) AS DOUBLE)",
      "mean" -> rSql(s"avg($c)", 6),
      "std" -> rSql(s"stddev_samp($c)", 6),
      "sum" -> rSql(s"CAST(sum($c) AS DOUBLE)", 2), // HUGEINT-safe for int columns
      "q50" -> rSql(s"quantile_cont($c, 0.5)", 6))
    val selects = for { c <- LongFormCols; (st, ex) <- stats(c) } yield
      s"""SELECT '$c' AS "column", '$st' AS statistic, $ex AS "value" FROM lineitem"""
    selects.mkString("", "\nUNION ALL\n", "\nORDER BY \"column\", statistic")
  }

  /** Whole-table profile: every lineitem column through the describe
    * ladder — one codegen pass + per-family unpivoted frequency jobs,
    * rendered long-form (column, statistic, value). Exercised by the test
    * suite rather than the bench registry: at local bench scale its cost
    * is almost entirely one-time plan compilation (measured 11.55s at
    * 60k rows vs 11.58s at 600k — marginal data cost ~0), and every stat
    * definition is already oracle-checked by the per-type queries. */
  def describeFullLineitem(spark: SparkSession, dir: String): DataFrame = {
    val rep = Report(Tables.lineitem(spark, dir), key = Some("l_orderkey"))
    rep.describeDF().orderBy("column", "statistic")
  }

  // ------------------------------------------- cross-column profile extras

  private val CorrCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_partkey")

  /** Pairwise Pearson correlation matrix over five lineitem columns —
    * ten codegen'd corr aggregates in ONE scan (Stats.correlationMatrix),
    * long-form output. */
  def corrMatrixLineitem(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.correlationMatrix(Tables.lineitem(spark, dir), CorrCols)
      .select(col("col_a"), col("col_b"), r(col("corr"), 6).as("corr"))
      .orderBy("col_a", "col_b")

  private val corrMatrixOracle: String = {
    val pairs = for {
      i <- CorrCols.indices; j <- (i + 1) until CorrCols.size
    } yield (CorrCols(i), CorrCols(j))
    val selects = pairs.map { case (a, b) =>
      s"""SELECT '$a' AS col_a, '$b' AS col_b, ${rSql(s"corr($a, $b)", 6)} AS corr FROM lineitem"""
    }
    selects.mkString("", "\nUNION ALL\n", "\nORDER BY col_a, col_b")
  }

  /** Spearman rank correlation (Pearson on average ranks, pandas
    * rank(method='average') tie convention). */
  def spearmanLineitem(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.spearman(
        Tables.lineitem(spark, dir), "l_extendedprice", "l_quantity")
      .select(r(col("spearman"), 6).as("spearman"))

  private val spearmanOracle: String =
    s"""WITH rk AS (
       | SELECT rank() OVER (ORDER BY l_extendedprice)
       |         + (count(*) OVER (PARTITION BY l_extendedprice) - 1) / 2.0 AS ra,
       |        rank() OVER (ORDER BY l_quantity)
       |         + (count(*) OVER (PARTITION BY l_quantity) - 1) / 2.0 AS rb
       | FROM lineitem)
       |SELECT ${rSql("corr(ra, rb)", 6)} AS spearman FROM rk""".stripMargin

  /** Equi-width 20-bin histogram of l_extendedprice: bounds pass + bucket
    * hash-agg (Stats.histogram). */
  def histogramLineitem(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.histogram(Tables.lineitem(spark, dir), "l_extendedprice", 20)
      .select(col("bucket"), r(col("lo"), 6).as("lo"), r(col("hi"), 6).as("hi"), col("cnt"))
      .orderBy("bucket")

  private val histogramOracle: String = {
    val w = "((b.mx - b.mn) / 20)"
    s"""WITH b AS (SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx FROM lineitem),
       |h AS (
       | SELECT CAST(least(floor((l_extendedprice - b.mn) / $w), 19) AS INT) AS bucket,
       |        count(*) AS cnt
       | FROM lineitem, b WHERE l_extendedprice IS NOT NULL GROUP BY 1)
       |SELECT h.bucket,
       | ${rSql(s"b.mn + h.bucket * $w", 6)} AS lo,
       | ${rSql(s"b.mn + (h.bucket + 1) * $w", 6)} AS hi,
       | h.cnt
       |FROM h, b ORDER BY h.bucket""".stripMargin
  }

  /** Equi-depth 10-bin histogram of l_extendedprice: bucket edges are
    * exact type-7 deciles, so each bin holds ~10% of rows — the binning
    * for skewed measures (Stats.equiDepthHistogram). */
  def equidepthLineitem(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.equiDepthHistogram(Tables.lineitem(spark, dir), "l_extendedprice", 10)
      .select(col("bin"), r(col("lo"), 6).as("lo"), r(col("hi"), 6).as("hi"), col("cnt"))
      .orderBy("bin")

  private val equidepthOracle: String = {
    val bins = 10
    val probs = (0 to bins).map(i => (i.toDouble / bins).toString).mkString("[", ", ", "]")
    // DuckDB arrays are 1-indexed: edge i+1 = ed[i+1]; CASE ladder
    // mirrors Stats.equiDepthHistogram bit for bit
    val cases = (1 until bins)
      .map(i => s"WHEN l_extendedprice < e.ed[${i + 1}] THEN ${i - 1}")
      .mkString("\n   ")
    s"""WITH e AS (SELECT quantile_cont(l_extendedprice, $probs) AS ed FROM lineitem),
       |b AS (
       | SELECT CASE
       |   $cases
       |   ELSE ${bins - 1} END AS bin
       | FROM lineitem, e WHERE l_extendedprice IS NOT NULL)
       |SELECT b.bin,
       | ${rSql("e.ed[b.bin + 1]", 6)} AS lo,
       | ${rSql("e.ed[b.bin + 2]", 6)} AS hi,
       | count(*) AS cnt
       |FROM b, e GROUP BY b.bin, lo, hi ORDER BY b.bin""".stripMargin
  }

  /** Shannon entropy (nats) of the two categorical orders columns. */
  def entropyOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    Seq("o_orderpriority", "o_orderstatus").map { c =>
      graft.operators.Stats.entropy(o, c)
        .select(lit(c).as("column"), r(col("entropy"), 6).as("entropy"))
    }.reduce(_.unionByName(_)).orderBy("column")
  }

  private val entropyOracle: String = {
    def one(c: String) =
      s"""SELECT '$c' AS "column", ${rSql("ln(sum(n)) - sum(n * ln(n)) / sum(n)", 6)} AS entropy
         |FROM (SELECT CAST(count(*) AS DOUBLE) AS n FROM orders
         |      WHERE $c IS NOT NULL GROUP BY $c)""".stripMargin
    s"""${one("o_orderpriority")}
       |UNION ALL
       |${one("o_orderstatus")}
       |ORDER BY "column"""".stripMargin
  }

  /** Per-language document-length quantiles: the describe quantile
    * kernel grouped by a categorical — exact type-7 interpolation per
    * group in one hash agg (Stats.groupedQuantiles). */
  def groupedQuantilesDocs(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.groupedQuantiles(
        Tables.documents(spark, dir), "lang", "n_chars", Seq(0.25, 0.5, 0.75))
      .select(col("lang"), r(col("q25"), 6).as("q25"), r(col("q50"), 6).as("q50"),
        r(col("q75"), 6).as("q75"), col("n"))
      .orderBy("lang")

  private val groupedQuantilesOracle: String =
    s"""SELECT lang,
       | ${rSql("quantile_cont(n_chars, 0.25)", 6)} AS q25,
       | ${rSql("quantile_cont(n_chars, 0.50)", 6)} AS q50,
       | ${rSql("quantile_cont(n_chars, 0.75)", 6)} AS q75,
       | count(n_chars) AS n
       |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** Z-score feature standardization over two lineitem measures —
    * moments once, broadcast back, never an unpartitioned window. */
  def zscoreLineitem(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.zscore(
        Tables.lineitem(spark, dir), Seq("l_quantity", "l_extendedprice"))
      .select((col("l_orderkey") * 8 + col("l_linenumber")).as("li_key"),
        r(col("z_l_quantity"), 6).as("z_l_quantity"),
        r(col("z_l_extendedprice"), 6).as("z_l_extendedprice"))
      .orderBy("li_key")

  private val zscoreOracle: String =
    s"""WITH m AS (
       | SELECT avg(l_quantity) AS mq, stddev_samp(l_quantity) AS sq,
       |        avg(l_extendedprice) AS me, stddev_samp(l_extendedprice) AS se
       | FROM lineitem)
       |SELECT l_orderkey * 8 + l_linenumber AS li_key,
       | ${rSql("(l_quantity - m.mq) / m.sq", 6)} AS z_l_quantity,
       | ${rSql("(l_extendedprice - m.me) / m.se", 6)} AS z_l_extendedprice
       |FROM lineitem, m ORDER BY li_key""".stripMargin

  /** Top-3 most frequent values per categorical column, ranked through
    * the salted GroupTopK (no single-task sort on the low-cardinality
    * "column" key). */
  def topValuesOrders(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.topValues(
        Tables.orders(spark, dir), Seq("o_orderpriority", "o_orderstatus"), 3)
      .orderBy("column", "rank")

  private val topValuesOracle: String =
    """SELECT "column", "value", cnt, rank FROM (
      | SELECT "column", "value", cnt,
      |  CAST(row_number() OVER (PARTITION BY "column" ORDER BY cnt DESC, "value" ASC) AS INT) AS rank
      | FROM (
      |  SELECT 'o_orderpriority' AS "column", o_orderpriority AS "value", count(*) AS cnt
      |  FROM orders WHERE o_orderpriority IS NOT NULL GROUP BY 2
      |  UNION ALL
      |  SELECT 'o_orderstatus', o_orderstatus, count(*)
      |  FROM orders WHERE o_orderstatus IS NOT NULL GROUP BY 2))
      |WHERE rank <= 3 ORDER BY "column", rank""".stripMargin

  /** PSI drift of l_extendedprice between early and late ship dates —
    * 10 equal-width bins over the combined range, proportions clamped at
    * 1e-6, one output row. The oracle replays binning, clamping and the
    * PSI sum with identical arithmetic. */
  def psiLineitem(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Drift.psi(
        Tables.lineitem(spark, dir), "l_extendedprice",
        col("l_shipdate") < lit("1998-01-01").cast("date"))
      .select(r(col("psi"), 6).as("psi"), col("n_base"), col("n_other"))

  private val psiOracle: String =
    s"""WITH v AS (
       | SELECT CAST(l_extendedprice AS DOUBLE) AS x,
       |  l_shipdate < DATE '1998-01-01' AS base
       | FROM lineitem WHERE l_extendedprice IS NOT NULL),
       |bounds AS (SELECT min(x) AS lo, max(x) AS hi FROM v),
       |binned AS (
       | SELECT CASE WHEN hi = lo THEN 0
       |  ELSE least(9, CAST(floor((x - lo) * 10 / (hi - lo)) AS INT)) END AS bin, base
       | FROM v, bounds),
       |hist AS (
       | SELECT bin,
       |  sum(CASE WHEN base THEN 1 ELSE 0 END) AS nb,
       |  sum(CASE WHEN NOT base THEN 1 ELSE 0 END) AS no
       | FROM binned GROUP BY bin),
       |totals AS (SELECT sum(nb) AS tb, sum(no) AS "to" FROM hist)
       |SELECT
       | ${rSql("sum((greatest(nb / tb, 1e-6) - greatest(no / \"to\", 1e-6)) * ln(greatest(nb / tb, 1e-6) / greatest(no / \"to\", 1e-6)))", 6)} AS psi,
       | CAST(sum(nb) AS BIGINT) AS n_base,
       | CAST(sum(no) AS BIGINT) AS n_other
       |FROM hist, totals""".stripMargin

  /** CATEGORICAL PSI ([[graft.operators.Drift.categoricalPsi]]): the
    * drift check for enum-shaped columns — order priorities before vs
    * after a pivot date. The category frame is share-pooled (≤1/1000
    * share → '__other', a pure filter, no ranking pass) so the operator
    * is cardinality-safe; at 5 priorities nothing pools and the oracle
    * replays frequencies, clamp and reduction verbatim. */
  def catDriftPriority(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Drift.categoricalPsi(
        Tables.orders(spark, dir), "o_orderpriority",
        col("o_orderdate") < to_timestamp_ntz(lit("1998-04-01")))
      .select(r(col("psi"), 6).as("psi"), col("n_base"), col("n_other"),
        col("n_categories"))

  private val catDriftOracle: String =
    s"""WITH f AS (
       | SELECT o_orderpriority AS cat,
       |  CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1998-04-01' THEN 1 ELSE 0 END) AS BIGINT) AS nb,
       |  CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1998-04-01' THEN 0 ELSE 1 END) AS BIGINT) AS nc
       | FROM orders WHERE o_orderpriority IS NOT NULL GROUP BY 1),
       |t AS (SELECT sum(nb) AS tb, sum(nc) AS tc FROM f),
       |pooled AS (
       | SELECT CASE WHEN CAST(nb + nc AS DOUBLE) / (t.tb + t.tc) > 0.001
       |   THEN cat ELSE '__other' END AS catp,
       |  nb, nc FROM f, t),
       |g AS (SELECT catp, sum(nb) AS nb, sum(nc) AS nc FROM pooled GROUP BY catp)
       |SELECT
       | ${rSql("sum((greatest(nb / t.tb, 1e-6) - greatest(nc / t.tc, 1e-6)) * ln(greatest(nb / t.tb, 1e-6) / greatest(nc / t.tc, 1e-6)))", 6)} AS psi,
       | CAST(max(t.tb) AS BIGINT) AS n_base,
       | CAST(max(t.tc) AS BIGINT) AS n_other,
       | count(*) AS n_categories
       |FROM g, t""".stripMargin

  /** Exact two-sample Kolmogorov–Smirnov drift over the SAME slices as
    * [[psiLineitem]] — the binning-free companion: cumulative counts are
    * exact longs from the two-phase prefix sum, so DuckDB's windowed
    * cumulative replay matches bit-for-bit. */
  def ksDriftLineitem(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Drift.ksDrift(
        Tables.lineitem(spark, dir), "l_extendedprice",
        col("l_shipdate") < lit("1998-01-01").cast("date"))
      .select(r(col("ks"), 6).as("ks"), col("n_base"), col("n_other"))

  private val ksDriftOracle: String =
    s"""WITH f AS (
       | SELECT CAST(l_extendedprice AS DOUBLE) AS v,
       |  CASE WHEN l_shipdate < DATE '1998-01-01' THEN 1 ELSE 0 END AS b
       | FROM lineitem WHERE l_extendedprice IS NOT NULL),
       |g AS (
       | SELECT v, CAST(sum(b) AS BIGINT) AS nb, CAST(sum(1 - b) AS BIGINT) AS nc
       | FROM f GROUP BY v),
       |c AS (
       | SELECT v, sum(nb) OVER (ORDER BY v) AS cb, sum(nc) OVER (ORDER BY v) AS cc
       | FROM g),
       |t AS (SELECT CAST(sum(nb) AS BIGINT) AS tb, CAST(sum(nc) AS BIGINT) AS tc FROM g)
       |SELECT
       | ${rSql("max(abs(CAST(cb AS DOUBLE) / t.tb - CAST(cc AS DOUBLE) / t.tc))", 6)} AS ks,
       | CAST(max(t.tb) AS BIGINT) AS n_base,
       | CAST(max(t.tc) AS BIGINT) AS n_other
       |FROM c, t""".stripMargin

  /** Per-priority exact KS drift ([[graft.operators.Drift.ksDriftByGroup]]):
    * order totals before vs after the pivot, one KS statistic per order
    * priority — the "which segment drifted?" readout; DuckDB replays the
    * per-group windowed cumulative ladder bit-for-bit. */
  def ksDriftByPriority(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Drift.ksDriftByGroup(
        Tables.orders(spark, dir), "o_orderpriority", "o_totalprice",
        col("o_orderdate") < to_timestamp_ntz(lit("1998-04-01")))
      .select(col("o_orderpriority"), r(col("ks"), 6).as("ks"),
        col("n_base"), col("n_other"))
      .orderBy("o_orderpriority")

  private val ksDriftByPriorityOracle: String =
    s"""WITH f AS (
       | SELECT o_orderpriority AS g, CAST(o_totalprice AS DOUBLE) AS v,
       |  CASE WHEN o_orderdate < TIMESTAMP '1998-04-01' THEN 1 ELSE 0 END AS b
       | FROM orders WHERE o_totalprice IS NOT NULL AND o_orderpriority IS NOT NULL),
       |grp AS (
       | SELECT g, v, CAST(sum(b) AS BIGINT) AS nb, CAST(sum(1 - b) AS BIGINT) AS nc
       | FROM f GROUP BY g, v),
       |c AS (
       | SELECT g, v,
       |  sum(nb) OVER (PARTITION BY g ORDER BY v) AS cb,
       |  sum(nc) OVER (PARTITION BY g ORDER BY v) AS cc
       | FROM grp),
       |t AS (SELECT g, CAST(sum(nb) AS BIGINT) AS tb, CAST(sum(nc) AS BIGINT) AS tc
       |      FROM grp GROUP BY g)
       |SELECT c.g AS o_orderpriority,
       | ${rSql("max(abs(CAST(cb AS DOUBLE) / t.tb - CAST(cc AS DOUBLE) / t.tc))", 6)} AS ks,
       | CAST(max(t.tb) AS BIGINT) AS n_base,
       | CAST(max(t.tc) AS BIGINT) AS n_other
       |FROM c JOIN t ON c.g = t.g
       |GROUP BY c.g
       |ORDER BY o_orderpriority""".stripMargin

  /** Jensen–Shannon divergence over the SAME slices and binning as
    * [[psiLineitem]] (Drift.jsDivergence) — the bounded, symmetric
    * companion metric, one scan per side. */
  def jsdLineitem(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Drift.jsDivergence(
        Tables.lineitem(spark, dir), "l_extendedprice",
        col("l_shipdate") < lit("1998-01-01").cast("date"))
      .select(r(col("jsd"), 6).as("jsd"), col("n_base"), col("n_other"))

  private val jsdOracle: String = {
    val p = "(nb / tb)"
    val q = "(no / \"to\")"
    val m = s"(($p + $q) / 2)"
    s"""WITH v AS (
       | SELECT CAST(l_extendedprice AS DOUBLE) AS x,
       |  l_shipdate < DATE '1998-01-01' AS base
       | FROM lineitem WHERE l_extendedprice IS NOT NULL),
       |bounds AS (SELECT min(x) AS lo, max(x) AS hi FROM v),
       |binned AS (
       | SELECT CASE WHEN hi = lo THEN 0
       |  ELSE least(9, CAST(floor((x - lo) * 10 / (hi - lo)) AS INT)) END AS bin, base
       | FROM v, bounds),
       |hist AS (
       | SELECT bin,
       |  sum(CASE WHEN base THEN 1 ELSE 0 END) AS nb,
       |  sum(CASE WHEN NOT base THEN 1 ELSE 0 END) AS no
       | FROM binned GROUP BY bin),
       |totals AS (SELECT sum(nb) AS tb, sum(no) AS "to" FROM hist)
       |SELECT
       | ${rSql(s"sum(CASE WHEN nb > 0 THEN $p * ln($p / $m) / 2 ELSE 0 END + CASE WHEN no > 0 THEN $q * ln($q / $m) / 2 ELSE 0 END)", 6)} AS jsd,
       | CAST(sum(nb) AS BIGINT) AS n_base,
       | CAST(sum(no) AS BIGINT) AS n_other
       |FROM hist, totals""".stripMargin
  }

  /** Tukey-fence outlier findings on events.value (Validation.
    * iqrOutliers, k = 1.5): data-driven range validation — the fences
    * are exact type-7 quartile literals, so the predicate pushes into
    * the scan. */
  def outliersEvents(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Validation.iqrOutliers(
        Tables.events(spark, dir), "event_id", "value", 1.5)
      .select(col("event_id"), r(col("value"), 6).as("value"), col("side"),
        r(col("fence_lo"), 6).as("fence_lo"), r(col("fence_hi"), 6).as("fence_hi"))
      .orderBy("event_id", "value")

  private val outliersOracle: String =
    s"""WITH f AS (
       | SELECT quantile_cont(CAST(value AS DOUBLE), 0.25) AS q1,
       |  quantile_cont(CAST(value AS DOUBLE), 0.75) AS q3
       | FROM events),
       |b AS (SELECT q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi FROM f)
       |SELECT event_id, ${rSql("CAST(value AS DOUBLE)", 6)} AS value,
       | CASE WHEN value < lo THEN 'below' ELSE 'above' END AS side,
       | ${rSql("lo", 6)} AS fence_lo, ${rSql("hi", 6)} AS fence_hi
       |FROM events, b
       |WHERE value IS NOT NULL AND (value < lo OR value > hi)
       |ORDER BY event_id, value""".stripMargin

  /** Functional-dependency census over three lineitem candidate pairs
    * (Stats.functionalDependency) — all violated in this schema, with
    * the violation counts proving the check measures, not assumes. */
  def fdLineitem(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    Seq(("l_partkey", "l_suppkey"), ("l_orderkey", "l_returnflag"),
        ("l_suppkey", "l_partkey"))
      .map { case (a, b) => graft.operators.Stats.functionalDependency(li, a, b) }
      .reduce(_.unionByName(_))
      .orderBy("det", "dep")
  }

  private val fdOracle: String = {
    def one(a: String, b: String) =
      s"""SELECT '$a' AS det, '$b' AS dep, count(*) AS n_det,
         | CAST(sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
         | max(nb) AS max_branch,
         | sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) = 0 AS fd_holds
         |FROM (SELECT $a, count(DISTINCT $b) AS nb FROM lineitem
         |      WHERE $a IS NOT NULL GROUP BY $a)""".stripMargin
    s"""${one("l_partkey", "l_suppkey")}
       |UNION ALL
       |${one("l_orderkey", "l_returnflag")}
       |UNION ALL
       |${one("l_suppkey", "l_partkey")}
       |ORDER BY det, dep""".stripMargin
  }

  /** Candidate-key census across four tables (Stats.keyCandidate):
    * orders/documents/events single-column keys hold; lineitem's
    * textbook composite (l_orderkey, l_linenumber) does NOT in this
    * synthetic data — the discovery that forced total ordering on every
    * row-level oracle (BASELINE.md sf0.1 notes). */
  def keyCensus(spark: SparkSession, dir: String): DataFrame =
    Seq(
      graft.operators.Stats.keyCandidate(Tables.orders(spark, dir),
        Seq("o_orderkey"), "orders"),
      graft.operators.Stats.keyCandidate(Tables.lineitem(spark, dir),
        Seq("l_orderkey", "l_linenumber"), "lineitem"),
      graft.operators.Stats.keyCandidate(Tables.documents(spark, dir),
        Seq("doc_id"), "documents"),
      graft.operators.Stats.keyCandidate(Tables.events(spark, dir),
        Seq("event_id"), "events"))
      .reduce(_.unionByName(_))
      .orderBy("table_name")

  private val keyCensusOracle: String = {
    def one(table: String, cols: Seq[String]) = {
      val notNull = cols.map(c => s"$c IS NOT NULL").mkString(" AND ")
      val tuple = if (cols.size == 1) cols.head else cols.mkString("(", ", ", ")")
      s"""SELECT '$table' AS table_name, '${cols.mkString(",")}' AS key_cols,
         | count(*) AS n_rows, count(DISTINCT $tuple) AS n_distinct,
         | count(*) - count(DISTINCT $tuple) AS n_dup_rows,
         | count(*) = count(DISTINCT $tuple) AS is_key
         |FROM $table WHERE $notNull""".stripMargin
    }
    s"""${one("orders", Seq("o_orderkey"))}
       |UNION ALL
       |${one("lineitem", Seq("l_orderkey", "l_linenumber"))}
       |UNION ALL
       |${one("documents", Seq("doc_id"))}
       |UNION ALL
       |${one("events", Seq("event_id"))}
       |ORDER BY table_name""".stripMargin
  }

  /** Recency-weighted per-user engagement over events
    * (Stats.decayedSum, half-life 7 days): the exponential-decay
    * feature as one hash aggregation — micros-exact time arithmetic,
    * decay constant injected into the oracle verbatim. */
  def decayedEngagement(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.decayedSum(
        Tables.events(spark, dir), "user_id", "ts", "value", halfLifeDays = 7.0)
      .select(col("user_id"), col("n_events"),
        r(col("decayed_sum"), 6).as("decayed_sum"), col("last_seen_us"))
      .orderBy("user_id")

  private val decayedOracle: String = {
    val lam = graft.operators.Stats.decayLambdaUs(7.0)
    s"""WITH ref AS (SELECT max(epoch_us(ts)) AS ref_us FROM events)
       |SELECT user_id, count(*) AS n_events,
       | ${rSql(s"sum(value * exp((-$lam) * (ref_us - epoch_us(ts))))", 6)} AS decayed_sum,
       | max(epoch_us(ts)) AS last_seen_us
       |FROM events, ref
       |WHERE ts IS NOT NULL AND value IS NOT NULL
       |GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  /** First-order event-type transition matrix per user over events
    * (Sequences.transitionMatrix): adjacent pairs in (ts, event_id)
    * order — a total order, so both engines see identical successors. */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sequences.transitionMatrix(
        Tables.events(spark, dir), "user_id", "ts", "event_type", "event_id")
      .select(col("from_state"), col("to_state"), col("n"), r(col("p"), 6).as("p"))
      .orderBy("from_state", "to_state")

  private val transitionsOracle: String =
    s"""WITH steps AS (
       | SELECT event_type AS from_state,
       |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_state
       | FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL),
       |cells AS (
       | SELECT from_state, to_state, count(*) AS n
       | FROM steps WHERE to_state IS NOT NULL GROUP BY 1, 2)
       |SELECT from_state, to_state, n,
       | ${rSql("n / CAST(sum(n) OVER (PARTITION BY from_state) AS DOUBLE)", 6)} AS p
       |FROM cells ORDER BY from_state, to_state""".stripMargin

  /** Ordered view → click → purchase conversion funnel
    * (Sequences.conversionFunnel): first-touch instants per user, stage
    * i converts only strictly after stage i−1 — two aggregations total,
    * no joins, no windows. */
  def conversionFunnelEvents(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sequences.conversionFunnel(
        Tables.events(spark, dir), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .select(col("stage_idx"), col("stage"), col("n_converted"),
        r(col("rate"), 6).as("rate"))
      .orderBy("stage_idx")

  private val funnelOracle: String =
    s"""WITH ft AS (
       | SELECT user_id,
       |  min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t0,
       |  min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t1,
       |  min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t2
       | FROM events GROUP BY user_id),
       |fl AS (
       | SELECT t0 IS NOT NULL AS f0,
       |  t0 IS NOT NULL AND t1 IS NOT NULL AND t1 > t0 AS f1,
       |  t0 IS NOT NULL AND t1 IS NOT NULL AND t1 > t0
       |   AND t2 IS NOT NULL AND t2 > t1 AS f2
       | FROM ft),
       |c AS (
       | SELECT CAST(sum(CASE WHEN f0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
       |  CAST(sum(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
       |  CAST(sum(CASE WHEN f2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
       | FROM fl)
       |SELECT stage_idx, stage, n_converted,
       | ${rSql("n_converted / CAST(CASE WHEN c0 > 0 THEN c0 END AS DOUBLE)", 6)} AS rate
       |FROM (
       | SELECT 1 AS stage_idx, 'view' AS stage, c0 AS n_converted, c0 FROM c
       | UNION ALL SELECT 2, 'click', c1, c0 FROM c
       | UNION ALL SELECT 3, 'purchase', c2, c0 FROM c)
       |ORDER BY stage_idx""".stripMargin

  /** Weekly retention triangle over events
    * (Sequences.retentionCohorts, 7-day periods): cohort by first-
    * active week, activity counted per week offset, rate against the
    * cohort's own size. */
  def retentionEvents(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sequences.retentionCohorts(
        Tables.events(spark, dir), "user_id", "ts", periodDays = 7)
      .select(col("cohort"), col("offset"), col("n_active"),
        r(col("retention"), 6).as("retention"))
      .orderBy("cohort", "offset")

  private val retentionOracle: String = {
    val periodUs = 7L * 86400L * 1000000L
    s"""WITH a AS (SELECT min(epoch_us(ts)) AS t0 FROM events),
       |kp AS (
       | SELECT DISTINCT user_id AS k,
       |  CAST(floor((epoch_us(ts) - t0) / $periodUs) AS BIGINT) AS period
       | FROM events, a WHERE user_id IS NOT NULL AND ts IS NOT NULL),
       |wc AS (SELECT k, period, min(period) OVER (PARTITION BY k) AS cohort FROM kp),
       |c AS (
       | SELECT cohort, period - cohort AS "offset", count(*) AS n_active
       | FROM wc GROUP BY 1, 2)
       |SELECT cohort, "offset", n_active,
       | ${rSql("n_active / CAST(max(CASE WHEN \"offset\" = 0 THEN n_active END) OVER (PARTITION BY cohort) AS DOUBLE)", 6)} AS "offset_r"
       |FROM c ORDER BY cohort, "offset"""".stripMargin
      .replace("AS \"offset_r\"", "AS retention")
  }

  /** Top-lift co-purchased part pairs over lineitem baskets
    * (Stats.coOccurrence, pair count ≥ 2): the market-basket
    * association screen; pairs meet only inside an order's basket. */
  def copurchaseParts(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.coOccurrence(
        Tables.lineitem(spark, dir), "l_orderkey", "l_partkey", minCount = 2L)
      .select(col("item_a"), col("item_b"), col("n_baskets"),
        r(col("lift"), 6).as("lift"))
      .orderBy("item_a", "item_b")

  private val copurchaseOracle: String =
    s"""WITH it AS (
       | SELECT DISTINCT l_orderkey AS b, l_partkey AS i
       | FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
       |ic AS (SELECT i, count(*) AS n_i FROM it GROUP BY i),
       |tot AS (SELECT count(DISTINCT b) AS n FROM it),
       |p AS (
       | SELECT a.i AS item_a, c.i AS item_b, count(*) AS n_baskets
       | FROM it a JOIN it c ON a.b = c.b AND a.i < c.i
       | GROUP BY 1, 2 HAVING count(*) >= 2)
       |SELECT item_a, item_b, n_baskets,
       | ${rSql("(n_baskets / CAST(n AS DOUBLE)) / ((x.n_i / CAST(n AS DOUBLE)) * (y.n_i / CAST(n AS DOUBLE)))", 6)} AS lift
       |FROM p JOIN ic x ON p.item_a = x.i JOIN ic y ON p.item_b = y.i CROSS JOIN tot
       |ORDER BY item_a, item_b""".stripMargin

  /** Structural pattern-mask census over customer names, part brands
    * and order priorities ([[graft.operators.Stats.patternCensus]],
    * top-5 masks per column): digits→9, upper→A, lower→a. The
    * profiler's format screen — output is bounded by distinct FORMATS
    * (a handful of masks), so the census costs one stacked scan + one
    * hash agg at any corpus size. */
  def patternCensusTables(spark: SparkSession, dir: String): DataFrame = {
    // independent per-table censuses, one stacked frame each, unioned
    val cust = graft.operators.Stats.patternCensus(
      Tables.customer(spark, dir), Seq("c_name", "c_mktsegment"), 5)
    val part = graft.operators.Stats.patternCensus(
      Tables.part(spark, dir), Seq("p_brand", "p_type"), 5)
    cust.unionByName(part).orderBy("column", "rank")
  }

  private val patternCensusOracle: String = {
    def maskSql(c: String) =
      s"regexp_replace(regexp_replace(regexp_replace(CAST($c AS VARCHAR), '[0-9]', '9', 'g'), '[A-Z]', 'A', 'g'), '[a-z]', 'a', 'g')"
    def census(table: String, cols: Seq[String]) = cols.map { c =>
      s"""SELECT '$c' AS "column", ${maskSql(c)} AS mask FROM $table WHERE $c IS NOT NULL"""
    }.mkString(" UNION ALL ")
    s"""WITH stacked AS (${census("customer", Seq("c_name", "c_mktsegment"))}
       | UNION ALL ${census("part", Seq("p_brand", "p_type"))}),
       |freq AS (
       | SELECT "column", mask, count(*) AS cnt FROM stacked GROUP BY 1, 2),
       |ranked AS (
       | SELECT "column", mask, cnt,
       |  CAST(row_number() OVER (PARTITION BY "column" ORDER BY cnt DESC, mask) AS INTEGER) AS rank
       | FROM freq)
       |SELECT "column", mask, cnt, rank FROM ranked WHERE rank <= 5
       |ORDER BY "column", rank""".stripMargin
  }

  /** Longest consecutive-day activity streak per user over events
    * ([[graft.operators.Sequences.activityStreaks]]), top-20 by streak
    * length: the gaps-and-islands workout — distinct days, the
    * day−row_number island trick inside per-user windows, longest
    * island via the salted GroupTopK path, global top-20 as
    * TakeOrderedAndProject. */
  def userStreaks(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sequences.activityStreaks(
        Tables.events(spark, dir), "user_id", "ts")
      .select(col("k").as("user_id"), col("streak_len"),
        date_format(col("streak_start"), "yyyy-MM-dd").as("streak_start"))
      .orderBy(col("streak_len").desc, col("user_id"))
      .limit(20)

  private val streaksOracle: String =
    s"""WITH d AS (
       | SELECT DISTINCT user_id AS k, CAST(ts AS DATE) AS day
       | FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
       |g AS (
       | SELECT k, day,
       |  day - CAST(row_number() OVER (PARTITION BY k ORDER BY day) AS INTEGER) AS grp
       | FROM d),
       |s AS (
       | SELECT k, grp, count(*) AS streak_len, min(day) AS streak_start
       | FROM g GROUP BY 1, 2),
       |b AS (
       | SELECT k, streak_len, streak_start,
       |  row_number() OVER (PARTITION BY k ORDER BY streak_len DESC, streak_start DESC) AS rn
       | FROM s)
       |SELECT k AS user_id, streak_len,
       | strftime(streak_start, '%Y-%m-%d') AS streak_start
       |FROM b WHERE rn = 1
       |ORDER BY streak_len DESC, user_id
       |LIMIT 20""".stripMargin

  /** Hourly event-rate spikes ([[graft.operators.Sequences
    * .rateAnomalies]], trailing 24 h baseline, flag at rounded z ≥ 2):
    * the agg-over-agg windowed-anomaly shape — corpus-scale work is
    * one hash aggregation; the RANGE-frame windows run over the hourly
    * frame per type. The flag threshold compares the ROUNDED z on both
    * engines. */
  def hourlyAnomalies(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sequences.rateAnomalies(
        Tables.events(spark, dir), "ts", "event_type", trailingHours = 24)
      .withColumn("z", r(col("z"), 6))
      .filter(col("z") >= 2)
      .select(col("event_type"),
        date_format(col("hour"), "yyyy-MM-dd HH:00").as("hour"),
        col("cnt"), col("z"))
      .orderBy("event_type", "hour")

  private val anomaliesOracle: String =
    s"""WITH h AS (
       | SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS cnt
       | FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
       | GROUP BY 1, 2),
       |w AS (
       | SELECT event_type, hour, cnt,
       |  avg(cnt) OVER win AS m, stddev_samp(cnt) OVER win AS s
       | FROM h
       | WINDOW win AS (PARTITION BY event_type ORDER BY epoch_us(hour) // 1000000
       |                RANGE BETWEEN 86400 PRECEDING AND 1 PRECEDING))
       |SELECT event_type, strftime(hour, '%Y-%m-%d %H:00') AS hour, cnt,
       | ${rSql("(cnt - m) / s", 6)} AS z
       |FROM w
       |WHERE s > 0 AND ${rSql("(cnt - m) / s", 6)} >= 2
       |ORDER BY event_type, hour""".stripMargin

  /** User survival curve over events
    * ([[graft.operators.Sequences.survivalCurve]], 30-day horizon):
    * fraction of users whose active lifetime reaches each day d. */
  def survivalEvents(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sequences.survivalCurve(
        Tables.events(spark, dir), "user_id", "ts", horizonDays = 30)
      .select(col("d"), col("n_surviving"), r(col("survival"), 6).as("survival"))
      .orderBy("d")

  private val survivalOracle: String =
    s"""WITH lt AS (
       | SELECT user_id,
       |  date_diff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE))) AS lifetime
       | FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
       | GROUP BY user_id),
       |t AS (SELECT count(*) AS n FROM lt),
       |d AS (SELECT unnest(range(0, 31)) AS d),
       |s AS (
       | SELECT d.d, CAST(count(lt.user_id) AS BIGINT) AS n_surviving
       | FROM d LEFT JOIN lt ON lt.lifetime >= d.d
       | GROUP BY d.d)
       |SELECT CAST(s.d AS INT) AS d, s.n_surviving,
       | ${rSql("s.n_surviving / CAST(t.n AS DOUBLE)", 6)} AS survival
       |FROM s CROSS JOIN t
       |ORDER BY d""".stripMargin

  /** Top-20 association rules by confidence over lineitem baskets
    * ([[graft.operators.Stats.associationRules]], pair support ≥ 3):
    * both rule directions with support/confidence/lift; ordering and
    * the cut on the ROUNDED confidence with the rule as tie-break. */
  def assocRulesParts(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.associationRules(
        Tables.lineitem(spark, dir), "l_orderkey", "l_partkey", minCount = 3L)
      .select(col("antecedent"), col("consequent"), col("n_ab"),
        r(col("support"), 6).as("support"),
        r(col("confidence"), 6).as("confidence"),
        r(col("lift"), 6).as("lift"))
      .orderBy(col("confidence").desc, col("antecedent"), col("consequent"))
      .limit(20)

  private val assocRulesOracle: String =
    s"""WITH it AS (
       | SELECT DISTINCT l_orderkey AS b, l_partkey AS i
       | FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
       |ic AS (SELECT i, count(*) AS n_i FROM it GROUP BY i),
       |tot AS (SELECT count(DISTINCT b) AS n FROM it),
       |p AS (
       | SELECT a.i AS ia, c.i AS ib, count(*) AS n_ab
       | FROM it a JOIN it c ON a.b = c.b AND a.i < c.i
       | GROUP BY 1, 2 HAVING count(*) >= 3),
       |r AS (
       | SELECT ia AS antecedent, ib AS consequent, n_ab FROM p
       | UNION ALL SELECT ib, ia, n_ab FROM p)
       |SELECT antecedent, consequent, n_ab,
       | ${rSql("n_ab / CAST(n AS DOUBLE)", 6)} AS support,
       | ${rSql("n_ab / CAST(a.n_i AS DOUBLE)", 6)} AS confidence,
       | ${rSql("(n_ab * CAST(n AS DOUBLE)) / (a.n_i * c.n_i)", 6)} AS lift
       |FROM r
       |JOIN ic a ON antecedent = a.i
       |JOIN ic c ON consequent = c.i
       |CROSS JOIN tot
       |ORDER BY confidence DESC, antecedent, consequent
       |LIMIT 20""".stripMargin

  /** RELATIVE-support association rules
    * ([[graft.operators.Stats.associationRulesBySupport]], minSupport
    * 2e-5 of baskets): the production Apriori parameterization — the
    * fractional threshold resolves to a DIFFERENT absolute count at
    * each SF (1 at sf0.001/sf0.01, 3 at sf0.1), so this gate replays
    * the ceil(minSupport · |distinct baskets|) resolution itself, not
    * just the absolute-form plan it delegates to (VERDICT r13 #2; the
    * co-occurrence and triple forms route through the same
    * `supportCount` delegation, so one gate covers the family's
    * resolution). Top-20 by confidence with full tie-break, like
    * assoc_rules_parts. */
  def assocRulesSupport(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.associationRulesBySupport(
        Tables.lineitem(spark, dir), "l_orderkey", "l_partkey",
        minSupport = 2e-5)
      .select(col("antecedent"), col("consequent"), col("n_ab"),
        r(col("support"), 6).as("support"),
        r(col("confidence"), 6).as("confidence"),
        r(col("lift"), 6).as("lift"))
      .orderBy(col("confidence").desc, col("antecedent"), col("consequent"))
      .limit(20)

  private val assocRulesSupportOracle: String =
    s"""WITH it AS (
       | SELECT DISTINCT l_orderkey AS b, l_partkey AS i
       | FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
       |ic AS (SELECT i, count(*) AS n_i FROM it GROUP BY i),
       |tot AS (SELECT count(DISTINCT b) AS n FROM it),
       |mc AS (
       | SELECT GREATEST(1, CAST(ceil(0.00002 * n) AS BIGINT)) AS m FROM tot),
       |p AS (
       | SELECT a.i AS ia, c.i AS ib, count(*) AS n_ab
       | FROM it a JOIN it c ON a.b = c.b AND a.i < c.i
       | GROUP BY 1, 2 HAVING count(*) >= (SELECT m FROM mc)),
       |r AS (
       | SELECT ia AS antecedent, ib AS consequent, n_ab FROM p
       | UNION ALL SELECT ib, ia, n_ab FROM p)
       |SELECT antecedent, consequent, n_ab,
       | ${rSql("n_ab / CAST(n AS DOUBLE)", 6)} AS support,
       | ${rSql("n_ab / CAST(a.n_i AS DOUBLE)", 6)} AS confidence,
       | ${rSql("(n_ab * CAST(n AS DOUBLE)) / (a.n_i * c.n_i)", 6)} AS lift
       |FROM r
       |JOIN ic a ON antecedent = a.i
       |JOIN ic c ON consequent = c.i
       |CROSS JOIN tot
       |ORDER BY confidence DESC, antecedent, consequent
       |LIMIT 20""".stripMargin

  /** RELATIVE-support co-occurrence
    * ([[graft.operators.Stats.coOccurrenceBySupport]], minSupport 2e-5
    * of baskets): gates the pair form's own fraction→count resolution —
    * 1 at sf0.001/sf0.01 (all in-basket pairs), 3 at sf0.1 — so each
    * family member's delegation is replayed, not argued from
    * [[assocRulesSupport]]'s. Full pair output like copurchase_parts. */
  def copurchaseSupport(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.coOccurrenceBySupport(
        Tables.lineitem(spark, dir), "l_orderkey", "l_partkey",
        minSupport = 2e-5)
      .select(col("item_a"), col("item_b"), col("n_baskets"),
        r(col("lift"), 6).as("lift"))
      .orderBy("item_a", "item_b")

  private val copurchaseSupportOracle: String =
    s"""WITH it AS (
       | SELECT DISTINCT l_orderkey AS b, l_partkey AS i
       | FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
       |ic AS (SELECT i, count(*) AS n_i FROM it GROUP BY i),
       |tot AS (SELECT count(DISTINCT b) AS n FROM it),
       |mc AS (
       | SELECT GREATEST(1, CAST(ceil(0.00002 * n) AS BIGINT)) AS m FROM tot),
       |p AS (
       | SELECT a.i AS item_a, c.i AS item_b, count(*) AS n_baskets
       | FROM it a JOIN it c ON a.b = c.b AND a.i < c.i
       | GROUP BY 1, 2 HAVING count(*) >= (SELECT m FROM mc))
       |SELECT item_a, item_b, n_baskets,
       | ${rSql("(n_baskets / CAST(n AS DOUBLE)) / ((x.n_i / CAST(n AS DOUBLE)) * (y.n_i / CAST(n AS DOUBLE)))", 6)} AS lift
       |FROM p JOIN ic x ON p.item_a = x.i JOIN ic y ON p.item_b = y.i CROSS JOIN tot
       |ORDER BY item_a, item_b""".stripMargin

  /** RELATIVE-support frequent triples
    * ([[graft.operators.Stats.frequentTriplesBySupport]], minSupport
    * 1e-5 of baskets — resolving 1 at sf0.001/sf0.01, 2 at sf0.1):
    * the triple form's own fraction→count gate; the oracle replays
    * the resolution AND the unpruned three-way ground truth. */
  def frequentTriplesSupport(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.frequentTriplesBySupport(
        Tables.lineitem(spark, dir), "l_orderkey", "l_partkey",
        minSupport = 1e-5)
      .orderBy("item_a", "item_b", "item_c")

  private val frequentTriplesSupportOracle: String =
    """WITH it AS (
      | SELECT DISTINCT l_orderkey AS b, l_partkey AS i
      | FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
      |mc AS (
      | SELECT GREATEST(1, CAST(ceil(0.00001 * count(DISTINCT b)) AS BIGINT)) AS m
      | FROM it)
      |SELECT a.i AS item_a, x.i AS item_b, c.i AS item_c, count(*) AS n_baskets
      |FROM it a
      |JOIN it x ON a.b = x.b AND a.i < x.i
      |JOIN it c ON x.b = c.b AND x.i < c.i
      |GROUP BY 1, 2, 3 HAVING count(*) >= (SELECT m FROM mc)
      |ORDER BY item_a, item_b, item_c""".stripMargin

  /** Association rules over a PLANTED-SKEW basket substrate — the gate
    * that makes the adaptive level-1 prune FIRE under an oracle hash
    * (VERDICT r14 #2: every other gate corpus is frequency-uniform, so
    * the broadcast survivor filter (`Stats.frequentItemArrays`) was
    * exercised only by units and row-count-matched bench arms). The
    * item space is a head-collapse transform of l_partkey — keys whose
    * last digit is 0/1/2 collapse to three heavy items (~10% of line
    * rows each, thousands of baskets at every SF), the rest keep their
    * partkey (~30 baskets each at every SF, TPC-H's constant
    * lines-per-part) — an integer CASE both engines compute bit-exactly
    * (a float `pow` transform would risk cross-engine rounding). At
    * minCount=100 the tail (~70% of long-form row mass, far above the
    * 5% default threshold) is entirely infrequent and the survivor set
    * is the three heavy items, so the prune engages at sf0.001 through
    * sf0.1 (StatsSpec asserts the decision on this exact substrate);
    * the oracle replays the UNPRUNED ground truth — downward closure
    * says the outputs must hash-match. */
  def assocRulesSkew(spark: SparkSession, dir: String): DataFrame = {
    val baskets = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
        when(col("l_partkey") % 10 < 3, col("l_partkey") % 10)
          .otherwise(col("l_partkey")).as("item"))
    graft.operators.Stats.associationRules(
        baskets, "l_orderkey", "item", minCount = 100L)
      .select(col("antecedent"), col("consequent"), col("n_ab"),
        r(col("support"), 6).as("support"),
        r(col("confidence"), 6).as("confidence"),
        r(col("lift"), 6).as("lift"))
      .orderBy("antecedent", "consequent")
  }

  private val assocRulesSkewOracle: String =
    s"""WITH it AS (
       | SELECT DISTINCT l_orderkey AS b,
       |  CASE WHEN l_partkey % 10 < 3 THEN l_partkey % 10
       |       ELSE l_partkey END AS i
       | FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
       |ic AS (SELECT i, count(*) AS n_i FROM it GROUP BY i),
       |tot AS (SELECT count(DISTINCT b) AS n FROM it),
       |p AS (
       | SELECT a.i AS ia, c.i AS ib, count(*) AS n_ab
       | FROM it a JOIN it c ON a.b = c.b AND a.i < c.i
       | GROUP BY 1, 2 HAVING count(*) >= 100),
       |r AS (
       | SELECT ia AS antecedent, ib AS consequent, n_ab FROM p
       | UNION ALL SELECT ib, ia, n_ab FROM p)
       |SELECT antecedent, consequent, n_ab,
       | ${rSql("n_ab / CAST(n AS DOUBLE)", 6)} AS support,
       | ${rSql("n_ab / CAST(a.n_i AS DOUBLE)", 6)} AS confidence,
       | ${rSql("(n_ab * CAST(n AS DOUBLE)) / (a.n_i * c.n_i)", 6)} AS lift
       |FROM r
       |JOIN ic a ON antecedent = a.i
       |JOIN ic c ON consequent = c.i
       |CROSS JOIN tot
       |ORDER BY antecedent, consequent""".stripMargin

  /** Lorenz curve of per-customer order revenue
    * ([[graft.operators.Stats.lorenzCurve]], 10 deciles): cumulative
    * revenue share of the poorest population fraction — the
    * distributional companion of gini_revenue, computed through the
    * two-phase prefix sum over the distinct-value frame. The oracle
    * replays the ranked cumulative sum directly. */
  def lorenzRevenue(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .groupBy("o_custkey").agg(sum("o_totalprice").as("rev"))
    graft.operators.Stats.lorenzCurve(perCust, "rev", points = 10)
      .select(col("point"), r(col("pop_share"), 6).as("pop_share"),
        r(col("value_share"), 6).as("value_share"))
      .orderBy("point")
  }

  private val lorenzOracle: String =
    s"""WITH pc AS (
       | SELECT o_custkey, sum(o_totalprice) AS rev FROM orders GROUP BY 1),
       |c AS (
       | SELECT rev, row_number() OVER (ORDER BY rev, o_custkey) AS rn,
       |  sum(rev) OVER (ORDER BY rev, o_custkey
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       | FROM pc),
       |t AS (SELECT count(*) AS n, sum(rev) AS tot FROM pc),
       |d AS (SELECT unnest(range(1, 11)) AS point)
       |SELECT CAST(point AS INT) AS point,
       | ${rSql("point / 10.0", 6)} AS pop_share,
       | ${rSql("c.cum / t.tot", 6)} AS value_share
       |FROM d CROSS JOIN t
       |JOIN c ON c.rn = (t.n * point + 9) // 10
       |ORDER BY point""".stripMargin

  /** CUSUM change-point screen over daily event counts
    * ([[graft.operators.Sequences.cusumChangePoint]]): the cumulative
    * deviation path plus the |CUSUM|-peak flag — the "which day did
    * the rate shift?" readout. */
  def cusumEvents(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sequences.cusumChangePoint(Tables.events(spark, dir), "ts")
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("cnt"),
        r(col("cusum"), 6).as("cusum"), col("is_peak"))
      .orderBy("day")

  private val cusumOracle: String =
    s"""WITH d AS (
       | SELECT CAST(ts AS DATE) AS day, count(*) AS cnt
       | FROM events WHERE ts IS NOT NULL GROUP BY 1),
       |m AS (SELECT avg(cnt) AS mean FROM d),
       |c AS (
       | SELECT day, cnt,
       |  sum(cnt - mean) OVER (ORDER BY day
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
       | FROM d, m),
       |p AS (SELECT max(abs(cusum)) AS peak FROM c)
       |SELECT strftime(day, '%Y-%m-%d') AS day, cnt,
       | ${rSql("cusum", 6)} AS cusum, abs(cusum) = peak AS is_peak
       |FROM c, p ORDER BY day""".stripMargin

  /** Nullity correlation over a deterministic PLANTED missing-data
    * population ([[graft.operators.Stats.nullityCorrelation]]): the
    * raw tables carry no nulls, so the query nulls three event columns
    * by arithmetic rules with known structure — `props` missing is a
    * strict subset of `value` missing (strong positive), `user_gap`
    * independent (near zero) — and the matrix must recover it. Same
    * planted-population pattern as geo_validate_keys. */
  def nullityEvents(spark: SparkSession, dir: String): DataFrame = {
    val m = pmod(col("event_id"), lit(10))
    val planted = Tables.events(spark, dir).select(
      when(m < 3, lit(null).cast("double")).otherwise(col("value")).as("value"),
      when(m < 2, lit(null).cast("string")).otherwise(col("props")).as("props"),
      when(pmod(col("event_id"), lit(7)) === 0, lit(null).cast("long"))
        .otherwise(col("user_id")).as("user_gap"))
    graft.operators.Stats.nullityCorrelation(
        planted, Seq("value", "props", "user_gap"))
      .select(col("col_a"), col("col_b"), r(col("corr"), 6).as("corr"))
      .orderBy("col_a", "col_b")
  }

  private val nullityOracle: String = {
    val flags = Seq(
      "value" -> "CASE WHEN event_id % 10 < 3 THEN 1.0 ELSE 0.0 END",
      "props" -> "CASE WHEN event_id % 10 < 2 THEN 1.0 ELSE 0.0 END",
      "user_gap" -> "CASE WHEN event_id % 7 = 0 THEN 1.0 ELSE 0.0 END")
    val pairs = for {
      i <- flags.indices; j <- (i + 1) until flags.size
    } yield (flags(i), flags(j))
    pairs.map { case ((a, fa), (b, fb)) =>
      s"""SELECT '$a' AS col_a, '$b' AS col_b, ${rSql(s"corr($fa, $fb)", 6)} AS corr FROM events"""
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_a, col_b")
  }

  /** Daily new-user and CUMULATIVE-distinct-user counts — the classic
    * "running count distinct" rewrite: a running distinct is not
    * incrementally aggregable, but first-seen-day per user IS (one
    * hash agg), daily news are a count over that, and the cumulative
    * curve is a running sum over the |days| frame (bounded by the
    * calendar — phase-2 window contract). */
  def cumulativeUsers(spark: SparkSession, dir: String): DataFrame = {
    val firstDay = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("day"))
    val daily = firstDay.groupBy("day").agg(count(lit(1)).as("new_users"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("day")
      .rowsBetween(Long.MinValue, 0L)
    daily
      .withColumn("cumulative_users", sum("new_users").over(w))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("new_users"), col("cumulative_users"))
      .orderBy("day")
  }

  private val cumulativeUsersOracle: String =
    s"""WITH f AS (
       | SELECT user_id, min(CAST(ts AS DATE)) AS day
       | FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
       | GROUP BY user_id),
       |d AS (SELECT day, count(*) AS new_users FROM f GROUP BY day)
       |SELECT strftime(day, '%Y-%m-%d') AS day, new_users,
       | CAST(sum(new_users) OVER (ORDER BY day
       |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumulative_users
       |FROM d ORDER BY day""".stripMargin

  /** Daily session bounce rate over the 10-minute-gap session windows
    * (the session_windows substrate aggregated one level up): sessions
    * with exactly one event / all sessions, per session-start day. */
  def bounceRate(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.Streams.sessionAgg(
        Tables.events(spark, dir), "ts", "10 minutes", "user_id")
      .select(to_date(col("session_start")).as("day"), col("n_events"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounces"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_sessions"), col("n_bounces"),
        r(col("n_bounces") /
          when(col("n_sessions") > 0, col("n_sessions")), 6).as("bounce_rate"))
      .orderBy("day")

  private val bounceRateOracle: String =
    s"""WITH flagged AS (
       | SELECT user_id, ts,
       |  CASE WHEN lag(ts) OVER w IS NULL
       |        OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE
       |       THEN 1 ELSE 0 END AS new_session
       | FROM events
       | WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
       |numbered AS (
       | SELECT user_id, ts,
       |  sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       | FROM flagged),
       |sess AS (
       | SELECT user_id, sid, CAST(min(ts) AS DATE) AS day, count(*) AS n_events
       | FROM numbered GROUP BY user_id, sid)
       |SELECT strftime(day, '%Y-%m-%d') AS day,
       | count(*) AS n_sessions,
       | CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
       | ${rSql("sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE)", 6)} AS bounce_rate
       |FROM sess GROUP BY day ORDER BY day""".stripMargin

  /** Event debounce ([[graft.operators.Sequences.debounce]]): first
    * event per (user, type) per 5-minute bucket — retry-storm /
    * double-fire thinning. Bucket id is a pure function of the
    * timestamp (partition-invariant); event_id breaks in-bucket ties
    * totally. */
  def eventDebounce(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sequences.debounce(
        Tables.events(spark, dir).filter(
          col("user_id").isNotNull && col("event_type").isNotNull),
        Seq("user_id", "event_type"), "ts", "event_id", bucketSeconds = 300L)
      .select(col("event_id"), col("user_id"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"))
      .orderBy("event_id")

  private val debounceOracle: String =
    s"""SELECT event_id, user_id, event_type,
       | strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts
       |FROM (
       | SELECT event_id, user_id, event_type, ts,
       |  row_number() OVER (
       |    PARTITION BY user_id, event_type, epoch_us(ts) // 300000000
       |    ORDER BY ts, event_id) AS rn
       | FROM events
       | WHERE user_id IS NOT NULL AND event_type IS NOT NULL AND ts IS NOT NULL)
       |WHERE rn = 1
       |ORDER BY event_id""".stripMargin

  /** view→purchase conversion latency over events
    * ([[graft.operators.Sequences.funnelLatency]]): per-user first
    * touches, strictly-ordered deltas, count/mean/exact-median
    * seconds in one row. */
  def funnelLatencyEvents(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sequences.funnelLatency(
        Tables.events(spark, dir).filter(col("user_id").isNotNull),
        "user_id", "ts", "event_type", from = "view", to = "purchase")
      .select(col("n_converted"), r(col("mean_s"), 6).as("mean_s"),
        r(col("median_s"), 6).as("median_s"))

  private val funnelLatencyOracle: String =
    s"""WITH k AS (
       | SELECT user_id,
       |  min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS tf,
       |  min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS tt
       | FROM events WHERE user_id IS NOT NULL GROUP BY user_id)
       |SELECT count(*) AS n_converted,
       | ${rSql("avg(d)", 6)} AS mean_s,
       | ${rSql("quantile_cont(d, 0.5)", 6)} AS median_s
       |FROM (SELECT (tt - tf) / 1000000.0 AS d FROM k
       |      WHERE tf IS NOT NULL AND tt IS NOT NULL AND tt > tf)""".stripMargin

  /** Per-language robust dispersion of document length
    * ([[graft.operators.Stats.groupedMad]] on n_chars by lang): median
    * + median-absolute-deviation per group — the outlier-insensitive
    * spread the mean/std ladder can't give on heavy-tailed length
    * distributions. Interpolation parity between Spark `percentile`
    * and DuckDB `quantile_cont` is already hash-proven by the
    * grouped-quantiles query; this composes it twice. */
  def groupedMadDocs(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.groupedMad(
        Tables.documents(spark, dir), "lang", "n_chars")
      .select(col("lang"), col("n"), r(col("median"), 6).as("median"),
        r(col("mad"), 6).as("mad"))
      .orderBy("lang")

  private val groupedMadOracle: String =
    s"""WITH c AS (
       | SELECT lang, n_chars FROM documents
       | WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
       |m AS (SELECT lang, quantile_cont(n_chars, 0.5) AS med FROM c GROUP BY lang)
       |SELECT c.lang, count(*) AS n,
       | ${rSql("max(m.med)", 6)} AS median,
       | ${rSql("quantile_cont(abs(n_chars - m.med), 0.5)", 6)} AS mad
       |FROM c JOIN m USING (lang)
       |GROUP BY c.lang ORDER BY lang""".stripMargin

  /** Frequent co-purchased part TRIPLES over lineitem baskets
    * ([[graft.operators.Stats.frequentTriples]], support ≥ 2): the
    * Apriori candidate-pruning demonstration — triples extend frequent
    * pairs only, pruned by downward closure. The oracle computes the
    * UNPRUNED ground truth (all basket triples, thresholded); the
    * pruned plan must reproduce it exactly. */
  def frequentTriplesParts(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.frequentTriples(
        Tables.lineitem(spark, dir), "l_orderkey", "l_partkey", minCount = 2L)
      .orderBy("item_a", "item_b", "item_c")

  private val frequentTriplesOracle: String =
    """WITH it AS (
      | SELECT DISTINCT l_orderkey AS b, l_partkey AS i
      | FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL)
      |SELECT a.i AS item_a, x.i AS item_b, c.i AS item_c, count(*) AS n_baskets
      |FROM it a
      |JOIN it x ON a.b = x.b AND a.i < x.i
      |JOIN it c ON x.b = c.b AND x.i < c.i
      |GROUP BY 1, 2, 3 HAVING count(*) >= 2
      |ORDER BY item_a, item_b, item_c""".stripMargin

  /** Fixed-point PageRank centrality over the co-purchase part graph
    * ([[graft.operators.Graph.pageRank]]: 5 iterations, damping 85%,
    * ranks in BIGINT micro-units): the iterative-graph shape — each
    * round one co-partitioned equi-join + one grouped long sum, plans
    * truncated per round. Integer fixed-point makes the iteration
    * partition-invariant AND lets the oracle unroll the 5 rounds as
    * chained CTEs in exact integer arithmetic — the compare is on
    * BIGINTs, no float tolerance anywhere in an iterative numeric
    * computation. */
  def pagerankParts(spark: SparkSession, dir: String): DataFrame = {
    // the symmetric co-purchase edge frame is a standing artifact
    // (Memo, warmup-charged): graph construction is paid once per
    // (session, dir); the measured cost is the ITERATION, matching the
    // minhash-pair-graph economics
    val edges = graft.sources.Memo.tableFor(spark, dir, "copurchase-edges") {
      val pairs = graft.operators.Stats.coOccurrence(
          Tables.lineitem(spark, dir), "l_orderkey", "l_partkey", minCount = 2L)
        .select("item_a", "item_b")
      pairs.unionAll(
        pairs.select(col("item_b").as("item_a"), col("item_a").as("item_b")))
    }
    graft.operators.Graph.pageRank(edges, "item_a", "item_b", iters = 5)
      .select(col("node").as("part"), col("rank").as("rank_fp"))
      .orderBy("part")
  }

  /** WEIGHTED fixed-point PageRank over the same co-purchase graph
    * ([[graft.operators.Graph.pageRankWeighted]]): mass flows in
    * proportion to shared-basket counts — rank·w ÷ Σw per edge, exact
    * integer arithmetic, BIGINT oracle like the unweighted twin. */
  def pagerankWeightedParts(spark: SparkSession, dir: String): DataFrame = {
    val edges = graft.sources.Memo.tableFor(spark, dir, "copurchase-edges-w") {
      val pairs = graft.operators.Stats.coOccurrence(
          Tables.lineitem(spark, dir), "l_orderkey", "l_partkey", minCount = 2L)
        .select("item_a", "item_b", "n_baskets")
      pairs.unionAll(pairs.select(col("item_b").as("item_a"),
        col("item_a").as("item_b"), col("n_baskets")))
    }
    graft.operators.Graph.pageRankWeighted(
        edges, "item_a", "item_b", "n_baskets", iters = 5)
      .select(col("node").as("part"), col("rank").as("rank_fp"))
      .orderBy("part")
  }

  private val pagerankWeightedOracle: String = {
    def step(i: Int): String =
      s"""r$i AS (
         | SELECT n.node, CAST(150000 + (coalesce(s.csum, 0) * 85) // 100 AS BIGINT) AS rank
         | FROM nodes n LEFT JOIN (
         |   SELECT pe.dst AS node, sum((pr.rank * pe.w) // pe.sw) AS csum
         |   FROM pe JOIN r${i - 1} pr ON pe.src = pr.node
         |   GROUP BY 1) s ON n.node = s.node)"""
    s"""WITH it AS (
       | SELECT DISTINCT l_orderkey AS b, l_partkey AS i
       | FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
       |p AS (
       | SELECT a.i AS src, c.i AS dst, CAST(count(*) AS BIGINT) AS w
       | FROM it a JOIN it c ON a.b = c.b AND a.i <> c.i
       | GROUP BY 1, 2 HAVING count(*) >= 2),
       |d AS (SELECT src, CAST(sum(w) AS BIGINT) AS sw FROM p GROUP BY 1),
       |pe AS (SELECT p.src, p.dst, p.w, d.sw FROM p JOIN d ON p.src = d.src),
       |nodes AS (SELECT DISTINCT src AS node FROM p),
       |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes),
       |${(1 to 5).map(step).mkString(",\n")}
       |SELECT node AS part, CAST(rank AS BIGINT) AS rank_fp
       |FROM r5 ORDER BY part""".stripMargin
  }

  /** Exact triangle census + global clustering coefficient over the
    * co-purchase pair list ([[graft.operators.Graph.triangleCensus]]):
    * ordered-triple enumeration closed by a left-semi probe, wedges
    * from the degree frame in exact longs. Rides the memoized
    * symmetric edge artifact, filtered back to one direction. */
  def triangleParts(spark: SparkSession, dir: String): DataFrame = {
    val edges = graft.sources.Memo.tableFor(spark, dir, "copurchase-edges") {
      val pairs = graft.operators.Stats.coOccurrence(
          Tables.lineitem(spark, dir), "l_orderkey", "l_partkey", minCount = 2L)
        .select("item_a", "item_b")
      pairs.unionAll(
        pairs.select(col("item_b").as("item_a"), col("item_a").as("item_b")))
    }
    graft.operators.Graph.triangleCensus(
        edges.filter(col("item_a") < col("item_b")), "item_a", "item_b")
      .select(col("n_triangles"), col("n_wedges"),
        r(col("clustering_coeff"), 6).as("clustering_coeff"))
  }

  private val triangleOracle: String =
    s"""WITH it AS (
       | SELECT DISTINCT l_orderkey AS b, l_partkey AS i
       | FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
       |p AS (
       | SELECT a.i AS pa, c.i AS pb
       | FROM it a JOIN it c ON a.b = c.b AND a.i < c.i
       | GROUP BY 1, 2 HAVING count(*) >= 2),
       |t AS (
       | SELECT count(*) AS n_triangles
       | FROM p e1
       | JOIN p e2 ON e1.pa = e2.pa AND e1.pb < e2.pb
       | JOIN p e3 ON e3.pa = e1.pb AND e3.pb = e2.pb),
       |d AS (
       | SELECT node, count(*) AS deg
       | FROM (SELECT pa AS node FROM p UNION ALL SELECT pb FROM p)
       | GROUP BY 1),
       |w AS (SELECT CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges FROM d)
       |SELECT n_triangles, n_wedges,
       | ${rSql("3.0 * n_triangles / n_wedges", 6)} AS clustering_coeff
       |FROM t, w""".stripMargin

  /** Label-propagation communities over the co-purchase graph
    * ([[graft.operators.Graph.labelPropagation]], 3 rounds):
    * deterministic LPA — most-frequent neighbor label, ties to the
    * smallest — unrolled by the oracle as three grouped-count +
    * window-argmax CTEs. Exact longs and total-order tie-breaks end to
    * end. */
  def communitiesParts(spark: SparkSession, dir: String): DataFrame = {
    val edges = graft.sources.Memo.tableFor(spark, dir, "copurchase-edges") {
      val pairs = graft.operators.Stats.coOccurrence(
          Tables.lineitem(spark, dir), "l_orderkey", "l_partkey", minCount = 2L)
        .select("item_a", "item_b")
      pairs.unionAll(
        pairs.select(col("item_b").as("item_a"), col("item_a").as("item_b")))
    }
    graft.operators.Graph.labelPropagation(edges, "item_a", "item_b", iters = 3)
      .select(col("node").as("part"), col("label").as("community"))
      .orderBy("part")
  }

  private val communitiesOracle: String = {
    def step(i: Int): String =
      s"""l$i AS (
         | SELECT node, label FROM (
         |  SELECT src AS node, label,
         |   row_number() OVER (PARTITION BY src ORDER BY cnt DESC, label ASC) AS rn
         |  FROM (SELECT p.src, l.label, count(*) AS cnt
         |        FROM p JOIN l${i - 1} l ON p.dst = l.node
         |        GROUP BY 1, 2))
         | WHERE rn = 1)"""
    s"""WITH it AS (
       | SELECT DISTINCT l_orderkey AS b, l_partkey AS i
       | FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
       |p AS (
       | SELECT a.i AS src, c.i AS dst
       | FROM it a JOIN it c ON a.b = c.b AND a.i <> c.i
       | GROUP BY 1, 2 HAVING count(*) >= 2),
       |l0 AS (SELECT DISTINCT src AS node, src AS label FROM p),
       |${(1 to 3).map(step).mkString(",\n")}
       |SELECT node AS part, label AS community
       |FROM l3 ORDER BY part""".stripMargin
  }

  /** Iglewicz–Hoaglin modified-z outlier flags over a deterministic
    * PLANTED spike population ([[graft.operators.Stats.modifiedZ]]):
    * every 997th order's total price is scaled ×20, and the robust
    * score must flag exactly that population — the |mz| ≥ 3.5
    * published cut applied to the ROUNDED score on both engines. The
    * median/MAD baseline barely moves under the plant, which is the
    * point: a mean/std z would inflate std and hide the spikes. */
  def robustOutliers(spark: SparkSession, dir: String): DataFrame = {
    val planted = Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_orderpriority"),
      when(pmod(col("o_orderkey"), lit(997)) === 0, col("o_totalprice") * 20.0)
        .otherwise(col("o_totalprice")).as("price"))
    graft.operators.Stats.modifiedZ(planted, "o_orderpriority", "price")
      .withColumn("mz", r(col("mz"), 6))
      .filter(abs(col("mz")) >= 3.5)
      .select(col("o_orderkey"), col("o_orderpriority"),
        r(col("price"), 2).as("price"), col("mz"))
      .orderBy("o_orderkey")
  }

  private val robustOutliersOracle: String =
    s"""WITH pl AS (
       | SELECT o_orderkey, o_orderpriority,
       |  CASE WHEN o_orderkey % 997 = 0 THEN o_totalprice * 20.0
       |       ELSE o_totalprice END AS price
       | FROM orders),
       |m AS (SELECT o_orderpriority AS g, quantile_cont(price, 0.5) AS med
       |      FROM pl GROUP BY 1),
       |mad AS (SELECT pl.o_orderpriority AS g,
       |         quantile_cont(abs(price - m.med), 0.5) AS mad
       |        FROM pl JOIN m ON pl.o_orderpriority = m.g GROUP BY 1),
       |z AS (
       | SELECT o_orderkey, pl.o_orderpriority, price,
       |  ${rSql("0.6745 * (price - m.med) / NULLIF(mad.mad, 0)", 6)} AS mz
       | FROM pl JOIN m ON pl.o_orderpriority = m.g
       | JOIN mad ON pl.o_orderpriority = mad.g)
       |SELECT o_orderkey, o_orderpriority, ${rSql("price", 2)} AS price, mz
       |FROM z WHERE abs(mz) >= 3.5
       |ORDER BY o_orderkey""".stripMargin

  private val pagerankOracle: String = {
    def step(i: Int): String =
      s"""r$i AS (
         | SELECT n.node, CAST(150000 + (coalesce(s.csum, 0) * 85) // 100 AS BIGINT) AS rank
         | FROM nodes n LEFT JOIN (
         |   SELECT pe.dst AS node, sum(pr.rank // pe.outdeg) AS csum
         |   FROM pe JOIN r${i - 1} pr ON pe.src = pr.node
         |   GROUP BY 1) s ON n.node = s.node)"""
    s"""WITH it AS (
       | SELECT DISTINCT l_orderkey AS b, l_partkey AS i
       | FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
       |p AS (
       | SELECT a.i AS src, c.i AS dst
       | FROM it a JOIN it c ON a.b = c.b AND a.i <> c.i
       | GROUP BY 1, 2 HAVING count(*) >= 2),
       |deg AS (SELECT src, count(*) AS outdeg FROM p GROUP BY 1),
       |pe AS (SELECT p.src, p.dst, d.outdeg FROM p JOIN deg d ON p.src = d.src),
       |nodes AS (SELECT DISTINCT src AS node FROM p),
       |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes),
       |${(1 to 5).map(step).mkString(",\n")}
       |SELECT node AS part, CAST(rank AS BIGINT) AS rank_fp
       |FROM r5 ORDER BY part""".stripMargin
  }

  /** Top 3-step event paths per user (Sequences.topPaths, count ≥ 5,
    * top-20): the higher-order transition view; ordering and the cut
    * are on exact long counts with the path string as tie-break. */
  def eventPaths(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sequences.topPaths(
        Tables.events(spark, dir), "user_id", "ts", "event_type", "event_id",
        length = 3, minCount = 5L)
      .orderBy(col("n").desc, col("path"))
      .limit(20)

  private val pathsOracle: String =
    s"""WITH s AS (
       | SELECT event_type AS s0,
       |  lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS s1,
       |  lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS s2
       | FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL)
       |SELECT s0 || '>' || s1 || '>' || s2 AS path, count(*) AS n
       |FROM s WHERE s2 IS NOT NULL
       |GROUP BY 1 HAVING count(*) >= 5
       |ORDER BY n DESC, path LIMIT 20""".stripMargin

  /** Per-nation customer revenue concentration
    * (Stats.concentration): HHI of each customer's share of the
    * nation's order value — the dependency/skew screen. */
  def revenueConcentration(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val joined = o.join(c, o("o_custkey") === c("c_custkey"))
      .select(col("c_nationkey"), col("c_custkey"), col("o_totalprice"))
    graft.operators.Stats.concentration(joined, "c_nationkey", "c_custkey", "o_totalprice")
      // total rounds at 2 digits, not the usual 6: a nation's total is a
      // ~10^4-element double sum, and association noise at sf0.1 (~1e-5
      // absolute) would sit within a 1e-4 or finer rounding unit
      .select(col("c_nationkey"), col("n_members"),
        r(col("total"), 2).as("total"), r(col("hhi"), 6).as("hhi"))
      .orderBy("c_nationkey")
  }

  private val concentrationOracle: String =
    s"""WITH mv AS (
       | SELECT c_nationkey, c_custkey, sum(o_totalprice) AS x
       | FROM orders JOIN customer ON o_custkey = c_custkey
       | GROUP BY 1, 2),
       |sh AS (
       | SELECT c_nationkey, x,
       |  sum(x) OVER (PARTITION BY c_nationkey) AS tot
       | FROM mv)
       |SELECT c_nationkey, count(*) AS n_members,
       | ${rSql("max(tot)", 2)} AS total,
       | ${rSql("sum((x / tot) * (x / tot))", 6)} AS hhi
       |FROM sh GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** Per-nation Gini of customer order revenue (Stats.gini): the
    * inequality reading of the same (nation, customer, revenue) frame
    * the HHI screen aggregates — both engines assign ranks by the
    * identical (revenue, custkey) total order. */
  def giniRevenue(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val joined = o.join(c, o("o_custkey") === c("c_custkey"))
      .select(col("c_nationkey"), col("c_custkey"), col("o_totalprice"))
    graft.operators.Stats.gini(joined, "c_nationkey", "c_custkey", "o_totalprice")
      .select(col("c_nationkey"), col("n_members"), r(col("gini"), 6).as("gini"))
      .orderBy("c_nationkey")
  }

  private val giniOracle: String =
    s"""WITH mv AS (
       | SELECT c_nationkey, c_custkey, sum(o_totalprice) AS x
       | FROM orders JOIN customer ON o_custkey = c_custkey
       | GROUP BY 1, 2),
       |rk AS (
       | SELECT c_nationkey, x,
       |  row_number() OVER (PARTITION BY c_nationkey ORDER BY x, c_custkey) AS r
       | FROM mv)
       |SELECT c_nationkey, count(*) AS n_members,
       | ${rSql("2 * sum(r * x) / (count(*) * sum(x)) - (count(*) + 1) / count(*)", 6)} AS gini
       |FROM rk GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** Per-column stat drift (count, null fraction, mean, std) between the
    * same two ship-date slices, long-form rows. */
  def statDriftLineitem(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val pivot = lit("1998-01-01").cast("date")
    graft.operators.Drift.statDrift(
        li.filter(col("l_shipdate") < pivot),
        li.filter(col("l_shipdate") >= pivot),
        Seq("l_quantity", "l_extendedprice", "l_discount"))
      .select(col("column"), col("metric"),
        r(col("base"), 4).as("base"), r(col("other"), 4).as("other"),
        r(col("delta"), 4).as("delta"))
      .orderBy("column", "metric")
  }

  private val statDriftOracle: String = {
    def side(name: String, cmp: String): String =
      s"""SELECT "column", metric, val FROM (
         | SELECT c."column",
         |  CAST(count(*) AS DOUBLE) AS "count",
         |  avg(CASE WHEN c.v IS NULL THEN 1.0 ELSE 0.0 END) AS null_fraction,
         |  avg(c.v) AS mean, stddev_samp(c.v) AS std
         | FROM (
         |  SELECT 'l_quantity' AS "column", CAST(l_quantity AS DOUBLE) AS v FROM lineitem WHERE l_shipdate $cmp DATE '1998-01-01'
         |  UNION ALL
         |  SELECT 'l_extendedprice', CAST(l_extendedprice AS DOUBLE) FROM lineitem WHERE l_shipdate $cmp DATE '1998-01-01'
         |  UNION ALL
         |  SELECT 'l_discount', CAST(l_discount AS DOUBLE) FROM lineitem WHERE l_shipdate $cmp DATE '1998-01-01') c
         | GROUP BY c."column")
         |UNPIVOT (val FOR metric IN ("count", null_fraction, mean, std))"""
        .stripMargin
    s"""WITH b AS (${side("base", "<")}),
       |o AS (${side("other", ">=")})
       |SELECT b."column", b.metric, ${rSql("b.val", 4)} AS base,
       | ${rSql("o.val", 4)} AS other, ${rSql("o.val - b.val", 4)} AS delta
       |FROM b JOIN o ON b."column" = o."column" AND b.metric = o.metric
       |ORDER BY 1, 2""".stripMargin
  }

  /** Categorical association (chi2 / Cramér's V / Theil's U both ways)
    * for the two natural categorical pairs in the star schema — the
    * pandas-profiling association-matrix cell (Stats.association); one
    * contingency scan per pair, all statistics from the bounded cell
    * frame. */
  def assocCategorical(spark: SparkSession, dir: String): DataFrame = {
    val li = graft.operators.Stats.association(
      Tables.lineitem(spark, dir), "l_returnflag", "l_linestatus")
    val or = graft.operators.Stats.association(
      Tables.orders(spark, dir), "o_orderstatus", "o_orderpriority")
    li.unionByName(or)
      .select(col("col_a"), col("col_b"), col("n"), col("r_levels"),
        col("c_levels"), r(col("chi2"), 6).as("chi2"),
        r(col("cramers_v"), 6).as("cramers_v"),
        r(col("theil_u_ab"), 6).as("theil_u_ab"),
        r(col("theil_u_ba"), 6).as("theil_u_ba"))
      .orderBy("col_a")
  }

  private val assocOracle: String = {
    def one(table: String, a: String, b: String): String =
      s"""SELECT '$a' AS col_a, '$b' AS col_b,
         | CAST(max(n) AS BIGINT) AS n,
         | count(DISTINCT _a) AS r_levels, count(DISTINCT _b) AS c_levels,
         | ${rSql("sum(o*o/(n_a*n_b/n)) - max(n)", 6)} AS chi2,
         | ${rSql("CASE WHEN least(count(DISTINCT _a), count(DISTINCT _b)) > 1 THEN sqrt((sum(o*o/(n_a*n_b/n)) - max(n)) / (max(n) * (least(count(DISTINCT _a), count(DISTINCT _b)) - 1))) END", 6)} AS cramers_v,
         | ${rSql("CASE WHEN -sum(o/n*ln(n_a/n)) > 0 THEN (-sum(o/n*ln(n_a/n)) + sum(o/n*ln(o/n_b))) / (-sum(o/n*ln(n_a/n))) END", 6)} AS theil_u_ab,
         | ${rSql("CASE WHEN -sum(o/n*ln(n_b/n)) > 0 THEN (-sum(o/n*ln(n_b/n)) + sum(o/n*ln(o/n_a))) / (-sum(o/n*ln(n_b/n))) END", 6)} AS theil_u_ba
         |FROM (
         | SELECT _a, _b, o,
         |  sum(o) OVER (PARTITION BY _a) AS n_a,
         |  sum(o) OVER (PARTITION BY _b) AS n_b,
         |  sum(o) OVER () AS n
         | FROM (SELECT CAST($a AS VARCHAR) AS _a, CAST($b AS VARCHAR) AS _b,
         |        CAST(count(*) AS DOUBLE) AS o
         |       FROM $table WHERE $a IS NOT NULL AND $b IS NOT NULL
         |       GROUP BY 1, 2))""".stripMargin
    s"""${one("lineitem", "l_returnflag", "l_linestatus")}
       |UNION ALL
       |${one("orders", "o_orderstatus", "o_orderpriority")}
       |ORDER BY col_a""".stripMargin
  }

  /** Benford first-significant-digit screen on the price column
    * (Stats.benfordDigits): 9-row census with observed vs expected
    * frequencies — a validation-rule primitive for fabricated-data /
    * unit-mix detection. */
  def benfordLineitem(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.benfordDigits(Tables.lineitem(spark, dir), "l_extendedprice")
      .select(col("digit"), col("cnt"), r(col("obs_p"), 6).as("obs_p"),
        r(col("exp_p"), 6).as("exp_p"), r(col("dev"), 6).as("dev"))
      .orderBy("digit")

  private val benfordOracle: String =
    s"""SELECT digit, cnt, ${rSql("obs_p", 6)} AS obs_p, ${rSql("exp_p", 6)} AS exp_p,
       | ${rSql("obs_p - exp_p", 6)} AS dev
       |FROM (
       | SELECT digit, cnt,
       |  cnt / CAST(sum(cnt) OVER () AS DOUBLE) AS obs_p,
       |  ln(1.0 + 1.0/digit) / ln(10.0) AS exp_p
       | FROM (
       |  SELECT CAST(regexp_extract(CAST(CAST(l_extendedprice AS DOUBLE) AS VARCHAR), '[1-9]') AS INT) AS digit,
       |   count(*) AS cnt
       |  FROM lineitem
       |  WHERE l_extendedprice IS NOT NULL AND l_extendedprice <> 0
       |   AND isfinite(CAST(l_extendedprice AS DOUBLE))
       |  GROUP BY 1))
       |ORDER BY digit""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("psi_lineitem", psiLineitem, Some(psiOracle)),
    QueryDef("jsd_lineitem", jsdLineitem, Some(jsdOracle)),
    QueryDef("cat_drift_priority", catDriftPriority, Some(catDriftOracle)),
    QueryDef("ks_drift_lineitem", ksDriftLineitem, Some(ksDriftOracle)),
    QueryDef("ks_drift_by_priority", ksDriftByPriority, Some(ksDriftByPriorityOracle)),
    QueryDef("outliers_events", outliersEvents, Some(outliersOracle)),
    QueryDef("fd_lineitem", fdLineitem, Some(fdOracle)),
    QueryDef("key_census", keyCensus, Some(keyCensusOracle)),
    QueryDef("decayed_engagement", decayedEngagement, Some(decayedOracle)),
    QueryDef("event_transitions", eventTransitions, Some(transitionsOracle)),
    QueryDef("conversion_funnel", conversionFunnelEvents, Some(funnelOracle)),
    QueryDef("retention_weekly", retentionEvents, Some(retentionOracle)),
    QueryDef("copurchase_parts", copurchaseParts, Some(copurchaseOracle)),
    QueryDef("pagerank_parts", pagerankParts, Some(pagerankOracle)),
    QueryDef("pagerank_weighted_parts", pagerankWeightedParts, Some(pagerankWeightedOracle)),
    QueryDef("triangle_census_parts", triangleParts, Some(triangleOracle)),
    QueryDef("communities_parts", communitiesParts, Some(communitiesOracle)),
    QueryDef("robust_outliers", robustOutliers, Some(robustOutliersOracle)),
    QueryDef("pattern_census", patternCensusTables, Some(patternCensusOracle)),
    QueryDef("frequent_triples", frequentTriplesParts, Some(frequentTriplesOracle)),
    QueryDef("grouped_mad_docs", groupedMadDocs, Some(groupedMadOracle)),
    QueryDef("hourly_anomalies", hourlyAnomalies, Some(anomaliesOracle)),
    QueryDef("funnel_latency", funnelLatencyEvents, Some(funnelLatencyOracle)),
    QueryDef("event_debounce", eventDebounce, Some(debounceOracle)),
    QueryDef("cumulative_users", cumulativeUsers, Some(cumulativeUsersOracle)),
    QueryDef("bounce_rate", bounceRate, Some(bounceRateOracle)),
    QueryDef("nullity_events", nullityEvents, Some(nullityOracle)),
    QueryDef("cusum_events", cusumEvents, Some(cusumOracle)),
    QueryDef("lorenz_revenue", lorenzRevenue, Some(lorenzOracle)),
    QueryDef("survival_curve", survivalEvents, Some(survivalOracle)),
    QueryDef("assoc_rules_parts", assocRulesParts, Some(assocRulesOracle)),
    QueryDef("assoc_rules_support", assocRulesSupport, Some(assocRulesSupportOracle)),
    QueryDef("copurchase_support", copurchaseSupport, Some(copurchaseSupportOracle)),
    QueryDef("frequent_triples_support", frequentTriplesSupport, Some(frequentTriplesSupportOracle)),
    QueryDef("assoc_rules_skew", assocRulesSkew, Some(assocRulesSkewOracle)),
    QueryDef("user_streaks", userStreaks, Some(streaksOracle)),
    QueryDef("event_paths", eventPaths, Some(pathsOracle)),
    QueryDef("revenue_concentration", revenueConcentration, Some(concentrationOracle)),
    QueryDef("gini_revenue", giniRevenue, Some(giniOracle)),
    QueryDef("assoc_categorical", assocCategorical, Some(assocOracle)),
    QueryDef("benford_lineitem", benfordLineitem, Some(benfordOracle)),
    QueryDef("stat_drift_lineitem", statDriftLineitem, Some(statDriftOracle)),
    QueryDef("corr_matrix_lineitem", corrMatrixLineitem, Some(corrMatrixOracle)),
    QueryDef("spearman_lineitem", spearmanLineitem, Some(spearmanOracle)),
    QueryDef("histogram_lineitem", histogramLineitem, Some(histogramOracle)),
    QueryDef("equidepth_lineitem", equidepthLineitem, Some(equidepthOracle)),
    QueryDef("entropy_orders", entropyOrders, Some(entropyOracle)),
    QueryDef("top_values_orders", topValuesOrders, Some(topValuesOracle)),
    QueryDef("grouped_quantiles_docs", groupedQuantilesDocs, Some(groupedQuantilesOracle)),
    QueryDef("zscore_lineitem", zscoreLineitem, Some(zscoreOracle)),
    QueryDef("describe_numeric_lineitem", describeNumericLineitem, Some(describeNumericOracle)),
    QueryDef("describe_approx_lineitem", describeApproxLineitem, Some(describeApproxLineitemOracle)),
    QueryDef("describe_approx_moments", describeApproxMoments, Some(describeApproxMomentsOracle)),
    QueryDef("describe_long_lineitem", describeLongLineitem, Some(describeLongOracle)),
    QueryDef("describe_string_orders", describeStringOrders, Some(describeStringOracle)),
    QueryDef("describe_date_lineitem", describeDateLineitem, Some(describeDateOracle)),
    QueryDef("describe_bool_lineitem", describeBoolLineitem, Some(describeBoolOracle)),
    QueryDef("introduce_lineitem", introduceLineitem, Some(introduceOracle)),
    QueryDef("validate_accepted_orders", validateAcceptedOrders, Some(validateAcceptedOracle)),
    QueryDef("validate_range_lineitem", validateRangeLineitem, Some(validateRangeOracle)),
    QueryDef("validate_multi_orders", validateMultiOrders, Some(validateMultiOracle)),
    QueryDef("validate_verbose_orders", validateVerboseOrders, Some(validateVerboseOracle)))
}
