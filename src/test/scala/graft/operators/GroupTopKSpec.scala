package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class GroupTopKSpec extends SparkSpec {

  test("salted two-phase top-k equals the plain ranked window, including boundary ties") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    // 3 low-cardinality groups, many score ties (score in 0..9) so the
    // rank-k boundary is exercised; id is the unique tie-break
    val df = (1L to 500L).map(i => (i, s"g${rnd.nextInt(3)}", rnd.nextInt(10)))
      .toDF("id", "key", "score")
    val w = Window.partitionBy("key").orderBy(col("score").desc, col("id").asc)
    val windowed = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 7)
      .select("key", "rn", "id", "score").orderBy("key", "rn")
      .collect().toSeq
    for (salts <- Seq(1, 4, 64)) { // 64 > rows-per-(key,salt) degenerate case
      val scaled = GroupTopK.topKSalted(df, Seq("key"),
        Seq(col("score").desc, col("id").asc), k = 7, salts = salts)
        .select("key", "rn", "id", "score").orderBy("key", "rn")
        .collect().toSeq
      assert(scaled === windowed, s"salts=$salts")
    }
    // the native default (WindowGroupLimit-planned) matches too
    val native = GroupTopK.topK(df, Seq("key"),
      Seq(col("score").desc, col("id").asc), k = 7)
      .select("key", "rn", "id", "score").orderBy("key", "rn")
      .collect().toSeq
    assert(native === windowed)
  }

  test("map-typed columns are excluded from the salt (hash would reject them)") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a", 3, Map("x" -> 1)), (2L, "a", 1, Map("y" -> 2)),
      (3L, "b", 2, Map.empty[String, Int])).toDF("id", "key", "score", "m")
    val out = GroupTopK.topKSalted(df, Seq("key"),
      Seq(col("score").desc, col("id").asc), k = 1, salts = 4)
      .select("key", "id").orderBy("key").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq === Seq(("a", 1L), ("b", 3L)))
  }

  test("multi-key groups and k larger than some groups") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "a", 1, 10.0), (2L, "a", 1, 20.0), (3L, "a", 2, 30.0),
      (4L, "b", 1, 40.0)).toDF("id", "k1", "k2", "v")
    val out = GroupTopK.topKSalted(df, Seq("k1", "k2"),
      Seq(col("v").desc, col("id").asc), k = 5, salts = 8)
      .select("k1", "k2", "rn", "id").orderBy("k1", "k2", "rn")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      ("a", 1, 1, 2L), ("a", 1, 2, 1L), ("a", 2, 1, 3L), ("b", 1, 1, 4L)))
  }
}
