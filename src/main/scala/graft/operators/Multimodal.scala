package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.SemanticType

/** Multimodal column support (SURVEY.md §2.C row 12): image/audio/video
  * payloads as opaque BinaryType columns with a typed metadata struct,
  * plus the Spark-side plumbing for decode / feature-extraction.
  *
  * The decode step itself is STUBBED (this environment ships no image or
  * audio codec libraries): [[stubFeatures]] derives a deterministic
  * pseudo-feature vector from the payload bytes via seeded xxhash64 — the
  * schema, batching, partitioning and column plumbing around it are real
  * and tested, and a production deployment swaps only the feature
  * expression (or a mapPartitions batch decoder) for a real codec.
  */
object Multimodal {

  /** Metadata struct carried next to every payload column. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("n_bytes", LongType),
    StructField("digest", StringType)))

  /** Attach a payload (binary) + metadata struct derived from a source
    * column; marks the payload with the BINARY modality metadata so the
    * describe() ladder classifies it. */
  def withPayload(df: DataFrame, srcCol: String, mime: String,
      payloadCol: String = "payload"): DataFrame = {
    val payload = col(srcCol).cast(BinaryType)
    df.withColumn(payloadCol, payload)
      .withColumn(s"${payloadCol}_meta", struct(
        lit(mime).as("mime"),
        octet_length(payload).cast(LongType).as("n_bytes"),
        md5(payload).as("digest")))
  }

  /** STUB decode/feature-extract: `dim` deterministic pseudo-features in
    * [-1, 1) from seeded hashes of the payload. Replace with a real
    * decoder (e.g. a mapPartitions batch over a codec) in production; the
    * signature — binary in, fixed-width float array out — is the real
    * contract.
    *
    * The hash is built from md5 + ascii only, so any engine reproduces it
    * bit-for-bit (the DuckDB oracle checks this query end to end): feature
    * i = ((a*65536 + b*256 + c) % 2e6) / 1e6 - 1 where a,b,c are the code
    * points of the first three hex chars of md5(md5(payload) || (i+seed)).
    * Each value is an exact multiple of 1e-6, so the float round-trip is
    * stable under 6-digit rounding on both sides. */
  def stubFeatures(payload: Column, dim: Int, seed: Int = 42): Column = {
    val digest = md5(payload)
    transform(sequence(lit(0), lit(dim - 1)), i => {
      val h = md5(concat(digest, (i + lit(seed)).cast(StringType)))
      val v = ascii(substring(h, 1, 1)) * 65536 +
        ascii(substring(h, 2, 1)) * 256 +
        ascii(substring(h, 3, 1))
      (pmod(v, lit(2000000)).cast(DoubleType) / 1000000.0 - 1.0).cast(FloatType)
    })
  }

  /** Resize stub: deterministic re-sampling of the payload to exactly
    * `outBytes` bytes — evenly spaced byte picks, zero-padded (a real
    * pipeline resizes decoded images; without a codec the byte-level
    * contract — binary in, FIXED-width binary out — is the plumbing that
    * matters: downstream batching can rely on the width). */
  def stubResize(payload: Column, outBytes: Int): Column = {
    require(outBytes > 0)
    val len = octet_length(payload)
    val picks = transform(sequence(lit(0), lit(outBytes - 1)), i =>
      substring(payload, (i * len / outBytes + 1).cast(IntegerType), lit(1)))
    // binary-safe join + zero-pad (concat_ws would round-trip through
    // UTF-8 and corrupt arbitrary bytes), then cut to the fixed width
    val joined = aggregate(picks, lit(Array.emptyByteArray), (acc, x) => concat(acc, x))
    substring(concat(joined, lit(Array.fill[Byte](outBytes)(0))), 1, outBytes)
  }

  /** Frame-sample stub: pick `k` deterministic byte offsets (the real
    * pipeline would sample video frames); returns the bytes at those
    * offsets as ints. */
  def sampleBytes(payload: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), i =>
      get(split(hex(payload), ""), pmod(i * 7919, greatest(octet_length(payload), lit(1)))))

  /** Feature extraction over a payload column: adds an
    * ArrayType(FloatType) features column (classified VECTOR by the
    * describe ladder). Pure expression — no shuffle, survives any
    * partitioning. */
  def extractFeatures(df: DataFrame, payloadCol: String, dim: Int,
      featuresCol: String = "features"): DataFrame =
    df.withColumn(featuresCol, stubFeatures(col(payloadCol), dim))

  /** A per-partition batch codec: `init` runs ONCE per partition and
    * returns the decode function — the handle a real decoder (image
    * codec, audio resampler, ONNX session) amortizes across its batch,
    * exactly the role a pandas-batched decoder plays under mapInPandas.
    * Must be serializable to ship to executors. */
  final case class Codec(dim: Int, init: () => Array[Byte] => Array[Float])
    extends Serializable

  /** The stub codec: JVM-side twin of [[stubFeatures]], bit-identical
    * feature values (unit-asserted), so the mapPartitions plumbing is
    * testable without any codec on the classpath. */
  def stubCodec(dim: Int, seed: Int = 42): Codec = Codec(dim, () => {
    // the "expensive handle": one digest instance per partition
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
    (payload: Array[Byte]) => {
      val digest = hex(md.digest(payload))
      Array.tabulate(dim) { i =>
        val h = hex(md.digest((digest + (i + seed)).getBytes("UTF-8")))
        val v = (h(0).toInt * 65536 + h(1).toInt * 256 + h(2).toInt) % 2000000
        (v / 1000000.0 - 1.0).toFloat
      }
    }
  })

  /** Batch decode over mapPartitions — the Scala analog of a pandas
    * mapInPandas decoder: codec init once per partition, then the
    * decode function streams through the partition's rows. Narrow (no
    * shuffle), preserves the incoming partitioning, appends an
    * ArrayType(FloatType) column with an explicit Row encoder. */
  def decodeBatched(df: DataFrame, payloadCol: String, codec: Codec,
      featuresCol: String = "features"): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val outSchema = df.schema.add(featuresCol, ArrayType(FloatType))
    df.mapPartitions { it =>
      val decode = codec.init() // once per partition, like a batch handle
      it.map(r => Row.fromSeq(r.toSeq :+ decode(r.getAs[Array[Byte]](payloadCol))))
    }(Encoders.row(outSchema))
  }
}
