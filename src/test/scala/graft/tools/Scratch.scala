package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def time(label: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-40s ${ts.min}%.3f s")
    }

    val q = graft.SparkEntry.queries
    time("simhash_md5_pairs full") { q("simhash_md5_pairs")(spark, dir).count() }
    time("simhash_neardup_docs full") { q("simhash_neardup_docs")(spark, dir).count() }
    time("bloom_decon_keep full") { q("bloom_decon_keep")(spark, dir).count() }
    time("decontaminate_docs full") { q("decontaminate_docs")(spark, dir).count() }

    // parity: fused agg vs the old expression form, both hash variants
    val docs = graft.sources.Tables.documents(spark, dir)
    val corpus = docs.select(col("doc_id"), col("text"))
    val md5hash = (t: org.apache.spark.sql.Column) =>
      conv(substring(md5(t.cast("binary")), 1, 15), 16, 10).cast(LongType)
    def oldSigs(tokenHash: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
        bits: Int) = {
      val ex = corpus.select(col("doc_id").as("id"),
        explode(graft.operators.Dedup.tokens(col("text"))).as("t"))
        .select(col("id"), tokenHash(col("t")).as("h"))
      val votes = (0 until bits).map(b =>
        sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as(s"v$b"))
      val aggd = ex.groupBy("id").agg(votes.head, votes.tail: _*)
      def bit(b: Int) = when(col(s"v$b") > 0, 1L).otherwise(0L)
      val lo = bits / 2
      def fold(msb: Int, lsb: Int) =
        (msb to lsb by -1).map(bit).reduce((acc, x) => acc * 2 + x)
      aggd.select(col("id"), shiftleft(fold(bits - 1, lo), lo).bitwiseOR(fold(lo - 1, 0)).as("sig"))
    }
    val newMd5 = graft.operators.Dedup.simhashSignaturesWith(corpus, "doc_id", "text", md5hash, 60)
    val oldMd5 = oldSigs(md5hash, 60)
    println("md5 sig mismatches: " + newMd5.join(oldMd5.withColumnRenamed("sig", "sig2"), "id")
      .filter(col("sig") =!= col("sig2")).count())
    val xxh = (t: org.apache.spark.sql.Column) => xxhash64(lit(42), t)
    val newXx = graft.operators.Dedup.simhashSignatures(corpus, "doc_id", "text")
    val oldXx = oldSigs(xxh, 64)
    println("xx sig mismatches: " + newXx.join(oldXx.withColumnRenamed("sig", "sig2"), "id")
      .filter(col("sig") =!= col("sig2")).count())
    val cgStr = newMd5.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    println(cgStr.linesIterator.take(2).mkString("\n"))
    spark.stop()
  }
}
