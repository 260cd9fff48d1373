package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale document pipelines
  * (SURVEY.md §2.C rows 9–10): exact, MinHash+LSH near-dup, SimHash, and
  * n-gram Jaccard. All shapes are shuffle-by-key — never all-pairs — so
  * they scale: exact dedup is one hash aggregation; MinHash candidates
  * meet only inside an LSH band bucket (banded equi-join); the quadratic
  * exact-Jaccard verify runs per candidate bucket, not per corpus.
  */
object Dedup {

  /** Exact dedup: keep, per duplicate-key group, the row with the lowest
    * tie-break value. Deterministic alternative to dropDuplicates (which
    * keeps an arbitrary first row). One shuffle on the keys. */
  def exact(df: DataFrame, keys: Seq[String], tieBreak: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tieBreak).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Duplicate report: key groups occurring more than once, with count and
    * the surviving (minimum) tie-break id. */
  def duplicateReport(df: DataFrame, keys: Seq[String], tieBreak: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_dups"), min(tieBreak).as("keep_id"))
      .filter(col("n_dups") > 1)

  /** Whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** Distinct k-word shingles of a text column. */
  def wordShingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    array_distinct(
      transform(sequence(lit(0), greatest(size(toks) - k, lit(0))),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
  }

  /** Distinct character n-grams. */
  def charNgrams(text: Column, n: Int): Column =
    array_distinct(
      transform(sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
        i => substring(text, i, lit(n))))

  /** Exact Jaccard similarity of two pre-distinct arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** MinHash signature: numHashes permutation-minimums over the shingle
    * set, using seeded xxhash64 as the hash family. Codegen'd nested
    * higher-order functions — one expression, no UDF. */
  def minhashSignature(shingles: Column, numHashes: Int, seed: Int = 42): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      s => array_min(transform(shingles, sh => xxhash64(s + lit(seed), sh))))

  /** LSH banding: (bandIndex, bandHash) keys for a signature split into
    * `bands` bands of `rows` rows. Two sets whose Jaccard is s collide in
    * at least one band with probability 1 - (1 - s^rows)^bands. */
  def bandKeys(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"), xxhash64(slice(sig, b * rows + 1, lit(rows))).as("bhash")))

  /** Near-duplicate pairs by MinHash/LSH with exact-Jaccard verification:
    * shingle → sign → band → bucket-join → verify. Returns (a, b, jaccard)
    * for pairs with verified Jaccard >= threshold; candidate generation
    * never compares rows outside a shared band bucket. */
  def nearDupPairsMinhash(
      df: DataFrame, idCol: String, textCol: String,
      shingleWords: Int = 3, numHashes: Int = 128,
      bands: Int = 32, rowsPerBand: Int = 4,
      threshold: Double = 0.7, seed: Int = 42): DataFrame = {
    require(bands * rowsPerBand == numHashes, "bands * rowsPerBand must equal numHashes")
    val shingled = df.select(
      col(idCol).as("id"),
      wordShingles(col(textCol), shingleWords).as("sh"))
    val banded = shingled
      .select(col("id"), col("sh"),
        explode(bandKeys(minhashSignature(col("sh"), numHashes, seed), bands, rowsPerBand))
          .as("bk"))
    val left = banded.select(col("bk"), col("id").as("a"), col("sh").as("sha"))
    val right = banded.select(col("bk"), col("id").as("b"), col("sh").as("shb"))
    left.join(right, Seq("bk"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), jaccard(col("sha"), col("shb")).as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash over the token multiset: bit b is set when the sum of
    * (+1 / -1) votes from token-hash bit b is positive. Assembled as two
    * 32-bit halves combined with shift/or — a plain *2 fold of 64 bits
    * would overflow the sign bit and trip ANSI arithmetic checks. */
  def simhash(text: Column, seed: Int = 42): Column = {
    val toks = tokens(text)
    def bit(b: Int): Column =
      when(aggregate(toks, lit(0L), (acc, t) =>
        acc + when(shiftright(xxhash64(lit(seed), t), b).bitwiseAND(lit(1L)) === 1L, 1L)
          .otherwise(-1L)) > 0, lit(1L)).otherwise(lit(0L))
    def half(msb: Int): Column =
      aggregate(array((msb to (msb - 31) by -1).map(bit): _*),
        lit(0L), (acc, x) => acc * 2 + x)
    shiftleft(half(63), 32).bitwiseOR(half(31))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: block on 16-bit chunks (a pair within
    * Hamming distance 3 shares at least one of 4 chunks — pigeonhole), then
    * verify exact Hamming distance. */
  def nearDupPairsSimhash(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, seed: Int = 42): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), simhash(col(textCol), seed).as("sig"))
    val chunked = sigs.select(col("id"), col("sig"),
      explode(array((0 to 3).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("sig"), c * 16).bitwiseAND(lit(0xffffL)).as("ckey"))
      }: _*)).as("ck"))
    val l = chunked.select(col("ck"), col("id").as("a"), col("sig").as("siga"))
    val r = chunked.select(col("ck"), col("id").as("b"), col("sig").as("sigb"))
    l.join(r, Seq("ck"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), hamming64(col("siga"), col("sigb")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
