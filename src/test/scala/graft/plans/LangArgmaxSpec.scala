package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

/** LangArgmaxExpr: exact equivalence with the composed
  * array_intersect + struct-argmax form it replaced (randomized corpus,
  * shared grams across profiles, ties), null propagation, and
  * codegen/interpreted parity. */
class LangArgmaxSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-round-11 composed form, verbatim — the equivalence oracle. */
  private def composed(df: DataFrame, idCol: String, textCol: String,
      profiles: Map[String, Seq[String]]): DataFrame = {
    val grams = Dedup.charNgrams(col(textCol), 3)
    val langs = profiles.toSeq.sortBy(_._1)
    val scored = langs.zipWithIndex.map { case ((lang, profile), i) =>
      struct(size(array_intersect(grams, typedLit(profile))).as("score"),
        lit(langs.size - i).as("tie"), lit(lang).as("lang"))
    }
    df.select(col(idCol),
      array_max(array(scored: _*)).getField("lang").as("predicted_lang"))
  }

  private def native(df: DataFrame, idCol: String, textCol: String,
      profiles: Map[String, Seq[String]]): DataFrame = {
    val grams = Dedup.charNgrams(col(textCol), 3)
    df.select(col(idCol),
      LangArgmaxExpr.langArgmax(grams, profiles.toSeq.sortBy(_._1))
        .as("predicted_lang"))
  }

  // deterministic pseudo-random corpus: token soup over a small alphabet
  // so trigrams collide across documents and profiles
  private def corpus: DataFrame = {
    val words = Seq("abc", "bcd", "cde", "def", "abd", "xyz", "xya", "zzz", "ab", "a")
    val docsSeq = (1L to 200L).map { i =>
      val n = (i % 7 + 1).toInt
      val text = (0 until n)
        .map(j => words(((i * 31 + j * 17) % words.size).toInt)).mkString(" ")
      (i, text)
    }
    docsSeq.toDF("doc_id", "text")
  }

  private val profiles = Map(
    "de" -> Seq("abc", "bcd", "zzz"),
    "en" -> Seq("abc", "xyz", "de "),   // "abc" shared with de; gram with space
    "es" -> Seq("cde", "ef ", "xya"),
    "fr" -> Seq("zz ", "zzz", "bcd"))

  test("equivalence with the composed array_intersect form on a colliding corpus") {
    val a = composed(corpus, "doc_id", "text", profiles)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    val b = native(corpus, "doc_id", "text", profiles)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(a.toSeq === b.toSeq)
    // the corpus must actually exercise more than one language
    assert(b.map(_._2).distinct.length > 1)
  }

  test("ties keep the lexicographically first language; zero-hit docs too") {
    val same = Map("de" -> Seq("qqq"), "en" -> Seq("qqq"), "fr" -> Seq("qqq"))
    val out = native(Seq((1L, "qqqq"), (2L, "nohit")).toDF("doc_id", "text"),
      "doc_id", "text", same).orderBy("doc_id").collect().map(_.getString(1))
    assert(out.toSeq === Seq("de", "de"))
  }

  test("null text scores zero everywhere and keeps first-language parity") {
    // charNgrams(null) is the array [null] (greatest(length-2, 1) swallows
    // the null), NOT a null array — the composed form scored it 0 for
    // every language and emitted the first language; parity check both.
    val df = Seq((1L, Option("abcd")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val ps = Map("en" -> Seq("abc"), "fr" -> Seq("zzz"))
    val a = composed(df, "doc_id", "text", ps).orderBy("doc_id").collect()
    val b = native(df, "doc_id", "text", ps).orderBy("doc_id").collect()
    assert(b(0).getString(1) === "en")
    assert(a(1).getString(1) === b(1).getString(1)) // both "en", not null
  }

  test("interpreted eval matches the codegen'd path") {
    val expr = LangArgmaxExpr(
      Bridge("x"), profiles.toSeq.sortBy(_._1))
    // drive nullSafeEval directly on a handful of gram arrays
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def arr(gs: String*) =
      new GenericArrayData(gs.map(UTF8String.fromString).toArray[Any])
    assert(expr.score(arr("abc", "bcd")).toString === "de")
    assert(expr.score(arr("xyz", "xya", "cde")).toString === "es")
    assert(expr.score(arr()).toString === "de") // zero hits -> first lang
  }

  private object Bridge {
    def apply(name: String) =
      org.apache.spark.sql.graft.Bridge.expression(col(name))
  }
}
