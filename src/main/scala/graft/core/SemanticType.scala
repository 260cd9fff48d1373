package graft.core

import org.apache.spark.sql.types._

/** Semantic column types, mirroring the reference's 7-type ladder
  * (reference: petk/constants.py:3-9, petk/tools.py:82-102) plus the
  * mandated multimodal extensions TEXT / VECTOR / BINARY.
  *
  * Unlike the reference (which probes the data), we classify statically from
  * the Spark [[StructField]]; only EMPTY needs a data probe (count == 0),
  * which the describe kernel folds into its single aggregation pass.
  */
sealed abstract class SemanticType(val name: String) {
  override def toString: String = name
}

object SemanticType {
  case object Boolean     extends SemanticType("BOOLEAN")
  case object Date        extends SemanticType("DATE")
  case object Empty       extends SemanticType("EMPTY")
  case object Geometry    extends SemanticType("GEOMETRY")
  case object Numeric     extends SemanticType("NUMERIC")
  case object Str         extends SemanticType("STRING")
  case object Unsupported extends SemanticType("UNSUPPORTED")
  // Extension ladder for LLM-pipeline data (SURVEY.md §2.C):
  case object Text        extends SemanticType("TEXT")
  case object Vector      extends SemanticType("VECTOR")
  case object Binary      extends SemanticType("BINARY")

  /** Metadata key marking a string column as free-text (TEXT modality). */
  val ModalityKey = "graft.modality"
  /** Metadata key marking a string/binary column as WKT/WKB geometry. */
  val GeometryKey = "graft.geometry"
  /** Metadata key carrying a geometry column's CRS (e.g. "epsg:4326") —
    * the Spark-schema equivalent of the reference's `df.crs` GeoDataFrame
    * attribute (petk/exploration.py:57). */
  val CrsKey = "graft.crs"

  /** Stamp `column` as a geometry column, optionally recording its CRS in
    * the column metadata (read back by [[crsOf]] / Geo.introduceGeo). */
  def asGeometry(df: org.apache.spark.sql.DataFrame, column: String,
      crs: Option[String] = None): org.apache.spark.sql.DataFrame = {
    val b = new MetadataBuilder()
      .withMetadata(df.schema(column).metadata)
      .putBoolean(GeometryKey, true)
    crs.foreach(b.putString(CrsKey, _))
    df.withMetadata(column, b.build())
  }

  /** The CRS recorded in `column`'s metadata, if any. */
  def crsOf(df: org.apache.spark.sql.DataFrame, column: String): Option[String] = {
    val meta = df.schema(column).metadata
    if (meta.contains(CrsKey)) Some(meta.getString(CrsKey)) else None
  }

  /** Static classification from the schema field. The EMPTY refinement
    * (all-null column ⇒ EMPTY regardless of physical type, reference
    * petk/tools.py:87-91) is applied later from the profiled null count via
    * [[refineEmpty]]. */
  def ofField(f: StructField): SemanticType = {
    val meta = f.metadata
    def flag(k: String) = meta.contains(k) && meta.getBoolean(k)
    f.dataType match {
      case BooleanType => Boolean
      case DateType | TimestampType | TimestampNTZType => Date
      case _: NumericType => Numeric
      case StringType if flag(GeometryKey) => Geometry
      case StringType if flag(ModalityKey) => Text
      case StringType => Str
      case ArrayType(_: NumericType, _) => Vector
      case BinaryType if flag(GeometryKey) => Geometry
      case BinaryType => Binary
      case _ => Unsupported
    }
  }

  /** reference petk/tools.py:87-91 — an entirely-null (but non-empty) column
    * is EMPTY before any dtype check. */
  def refineEmpty(static: SemanticType, nonNullCount: Long, size: Long): SemanticType =
    if (size > 0 && nonNullCount == 0L) Empty else static
}
