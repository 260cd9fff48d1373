package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch main for ad-hoc plan inspection. Not part of the
  * engine; edit freely (see .claude/skills/verify/SKILL.md). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/tmp/graft_sf1"
    val emb = graft.sources.Tables.embeddings(spark, dir)
    emb.count() // warm

    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }
    val qz = graft.operators.Vectors.quantizeInt8(emb, "vec_id", "embedding")
    time("quantize count") { qz.count() }
    val qf = qz.select(col("vec_id"), transform(col("qvec"), _.cast("float")).as("qvec"))
    time("quantize+cast count") { qf.count() }
    time("full quantized_topk") {
      graft.SparkEntry.queries("quantized_topk")(spark, dir).count()
    }
    val qckpt = qf.localCheckpoint()
    time("topk on checkpointed quant") {
      graft.operators.Similarity.cosineTopK(qckpt, "vec_id", "qvec",
        qckpt.filter(col("vec_id") < 5), "vec_id", "qvec", k = 5).count()
    }
    spark.stop()
  }
}
