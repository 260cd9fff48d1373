package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {

  test("morton2 interleaves bits: x at even, y at odd positions") {
    val s = spark
    import s.implicits._
    // x=3 (011), y=5 (101), bits=3:
    //   x bits -> positions 0,2: 1+4; y bits -> positions 1,5: 2+32 => 39
    val out = Seq((3L, 5L)).toDF("x", "y")
      .select(ZOrder.morton2(col("x"), col("y"), 3)).head.getLong(0)
    assert(out === 39L)
    // exhaustive 4-bit inverse check: the mapping is a bijection on the grid
    val grid = (for { x <- 0 until 16; y <- 0 until 16 } yield (x.toLong, y.toLong)).toDF("x", "y")
    val keys = grid.select(ZOrder.morton2(col("x"), col("y"), 4)).collect().map(_.getLong(0))
    assert(keys.distinct.length === 256)
    assert(keys.min === 0L && keys.max === 255L)
  }

  test("morton2Sql emits the identical arithmetic (spot check in Spark SQL)") {
    // the SQL text uses >>, & and literal multipliers valid in Spark too —
    // evaluate it via expr() against the Column version on a few values
    val s = spark
    import s.implicits._
    val df = Seq((0L, 0L), (7L, 1L), (1023L, 511L), (12L, 34L)).toDF("x", "y")
    val both = df.select(
      ZOrder.morton2(col("x"), col("y"), 10).as("a"),
      expr(ZOrder.morton2Sql("x", "y", 10)).as("b")).collect()
    both.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("clampCode saturates negatives to 0 and overflow to 2^bits - 1") {
    val s = spark
    import s.implicits._
    val out = Seq(-5L, 0L, 7L, 64L).toDF("v")
      .select(ZOrder.clampCode(col("v"), 6)).collect().map(_.getLong(0))
    assert(out.toSeq === Seq(0L, 0L, 7L, 63L))
  }
}
