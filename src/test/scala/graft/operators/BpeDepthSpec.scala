package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Production-depth BPE evidence (VERDICT r16 #1): the driver-local fit
  * must be BIT-IDENTICAL to the distributed per-round fit, and the fused
  * greedy encode (graft.plans.BpeCountExpr) must be exactly the replace
  * chain on fit-produced tables — at the oracle depth AND at depths the
  * chain cannot reach (K=1024, where a 1024-deep nested replace tree is
  * past Janino's comfort and 100× the per-word work). */
class BpeDepthSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def documents = graft.sources.Tables.documents(spark, dir)

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  /** Driver-side replay of the replace-CHAIN semantics on one word:
    * symbolize (code points, line terminators dropped) then one
    * left-to-right non-overlapping literal replace per rank — an
    * independent third implementation both engine forms are checked
    * against. */
  private def chainTokensRef(word: String,
      merges: Seq[(String, String)]): Seq[String] = {
    val D = "\u0001"
    val syms = word.codePoints().toArray
      .filterNot(TextAnalysis.isDroppedCp)
      .map(cp => new String(Character.toChars(cp)))
    var s = D + syms.mkString(D + D) + D
    for ((l, r) <- merges)
      s = s.replace(D + l + D + D + r + D, D + l + r + D)
    // the oracle's token extraction: trim the outer delimiters, split
    // on the doubled inner ones
    s.stripPrefix(D).stripSuffix(D)
      .split(java.util.regex.Pattern.quote(D + D), -1).toSeq
  }

  private def chainCountRef(word: String, merges: Seq[(String, String)]): Int =
    chainTokensRef(word, merges).size

  test("driver-local fit is bit-identical to the distributed fit at K=10 and K=64") {
    for (k <- Seq(10, 64)) {
      val dist = TextAnalysis.bpeFitMerges(documents, "text", k)
      val auto = TextAnalysis.bpeFitMergesAuto(documents, "text", k)
      assert(auto === dist, s"local/distributed fit diverged at K=$k")
    }
  }

  test("driver-local fit tie-break uses UTF-8 binary order, not UTF-16") {
    // U+FFFF sorts ABOVE U+10000 in UTF-16 code units but BELOW it in
    // UTF-8 bytes / code points — the engine (UTF8String) uses the
    // latter. Equal counts force the tie onto the pair order.
    val high = new String(Character.toChars(0x10000))
    val d = docs((1L, s"a$high a\uffff"))
    val dist = TextAnalysis.bpeFitMerges(d, "text", 1)
    val local = TextAnalysis.bpeFitMergesAuto(d, "text", 1)
    assert(dist === local)
    assert(local.head._3 === "\uffff", // the UTF-8-smaller rhs wins the tie
      s"tie-break drifted from UTF-8 order: ${local.head}")
  }

  test("fused encode equals the chain encode at the oracle depth (K=10)") {
    val merges = TextAnalysis.bpeFitMergesAuto(documents, "text", 10)
      .map { case (_, l, r, _) => (l, r) }
    val fused = TextAnalysis.bpeEncodeCounts(documents, "doc_id", "text", merges)
      .orderBy("doc_id").collect().map(_.toSeq)
    val chain = TextAnalysis.bpeEncodeCountsChain(documents, "doc_id", "text", merges)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(fused.toSeq === chain.toSeq)
  }

  /** Deterministic Zipfian vocabulary, driver-side: the testdata corpus
    * is synthesized from ~31 distinct words (its fit exhausts at 89
    * merges — BASELINE r17), so production depth needs a planted vocab.
    * splitmix64 words over a-z, Zipf(1.1)-ish frequencies. */
  private def syntheticVocab(n: Int): Seq[(String, Long)] = {
    def mix(x0: Long): Long = {
      var x = x0 + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x ^ (x >>> 31)
    }
    (1 to n).map { r =>
      val len = 4 + (mix(r.toLong) & 0x7L).toInt // 4..11 chars
      val sb = new StringBuilder
      var h = mix(r.toLong * 31 + 7)
      for (_ <- 0 until len) {
        sb.append(('a' + java.lang.Long.remainderUnsigned(h, 26L).toInt).toChar)
        h = mix(h)
      }
      (sb.toString, math.max(1L, (n / math.pow(r.toDouble, 1.1)).toLong))
    }.distinct.groupBy(_._1).map { case (w, g) => (w, g.head._2) }.toSeq
      .sortBy(_._1)
  }

  test("fused encode at K=1024 matches the driver-side chain replay on every distinct word") {
    // the depth the nested-replace tree cannot reach: fit 1024 merges
    // (driver-local path) over a planted Zipfian vocabulary, then check
    // the fused per-word counts against an independent Scala replay of
    // the chain semantics
    val vocab = syntheticVocab(4000)
    val merges = TextAnalysis.bpeFitMergesLocal(vocab, 1024)
      .map { case (_, l, r, _) => (l, r) }
    assert(merges.size === 1024, s"fit exhausted early: ${merges.size}")
    val s = spark
    import s.implicits._
    val words = vocab.map(_._1).toDF("w")
    val fused = words
      .select(col("w"),
        graft.plans.BpeCountExpr.bpeCounts(col("w"), merges)("n_tokens").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fused.size === vocab.size)
    fused.foreach { case (w, n) =>
      assert(n === chainCountRef(w, merges).toLong, s"word '$w'")
    }
    // the TOKEN SEQUENCE form agrees with the chain replay too
    val fusedToks = words
      .select(col("w"),
        graft.plans.BpeTokensExpr.bpeTokens(col("w"), merges).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    fusedToks.foreach { case (w, t) =>
      assert(t === chainTokensRef(w, merges), s"tokens of '$w'")
    }
    // and the real-corpus fused aggregate stays green at ITS max depth
    val corpusMerges = TextAnalysis.bpeFitMergesAuto(documents, "text", 1024)
      .map { case (_, l, r, _) => (l, r) }
    val enc = TextAnalysis.bpeEncodeCounts(documents, "doc_id", "text", corpusMerges)
    assert(enc.agg(sum("n_tokens")).head().getLong(0) > 0L)
  }

  test("fused encode matches the chain under interpreted (non-codegen) eval") {
    val merges = TextAnalysis.bpeFitMergesAuto(documents, "text", 10)
      .map { case (_, l, r, _) => (l, r) }
    val saved = Seq("spark.sql.codegen.wholeStage",
      "spark.sql.codegen.factoryMode").map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val fused = TextAnalysis.bpeEncodeCounts(documents, "doc_id", "text", merges)
        .orderBy("doc_id").collect().map(_.toSeq)
      val chain = TextAnalysis.bpeEncodeCountsChain(documents, "doc_id", "text", merges)
        .orderBy("doc_id").collect().map(_.toSeq)
      assert(fused.toSeq === chain.toSeq)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("local fit handles the overlap + greedy-rewrite hand case like the distributed fit") {
    // the TextAnalysisSpec hand case, replayed through the local path
    val m = TextAnalysis.bpeFitMergesLocal(Seq(("aaa", 2L), ("ab", 1L)), 10)
    assert(m === Seq((1, "a", "a", 4L), (2, "aa", "a", 2L), (3, "a", "b", 1L)))
  }

  test("local fit stops early when every word is fused and caps at the requested depth") {
    val m = TextAnalysis.bpeFitMergesLocal(Seq(("ab", 2L), ("cd", 1L)), 100)
    assert(m.map(x => (x._2, x._3)) === Seq(("a", "b"), ("c", "d")))
    val capped = TextAnalysis.bpeFitMergesLocal(Seq(("abcdef", 1L)), 2)
    assert(capped.size === 2)
  }
}
