package graft.core

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SemanticTypeSpec extends AnyFunSuite {
  import SemanticType._

  private def f(dt: DataType, meta: Metadata = Metadata.empty) =
    StructField("c", dt, metadata = meta)

  test("base ladder mirrors the reference's dtype checks (tools.py:92-99)") {
    assert(ofField(f(BooleanType)) === Boolean)
    assert(ofField(f(TimestampType)) === Date)
    assert(ofField(f(TimestampNTZType)) === Date)
    assert(ofField(f(DateType)) === Date)
    assert(ofField(f(LongType)) === Numeric)
    assert(ofField(f(DoubleType)) === Numeric)
    assert(ofField(f(DecimalType(10, 2))) === Numeric)
    assert(ofField(f(StringType)) === Str)
    assert(ofField(f(MapType(StringType, LongType))) === Unsupported)
    assert(ofField(f(StructType(Seq(StructField("x", LongType))))) === Unsupported)
  }

  test("extension modalities: VECTOR, BINARY, TEXT, GEOMETRY metadata") {
    assert(ofField(f(ArrayType(FloatType))) === Vector)
    assert(ofField(f(ArrayType(DoubleType))) === Vector)
    assert(ofField(f(ArrayType(StringType))) === Unsupported)
    assert(ofField(f(BinaryType)) === Binary)
    val textMeta = new MetadataBuilder().putBoolean(ModalityKey, true).build()
    assert(ofField(f(StringType, textMeta)) === Text)
    val geomMeta = new MetadataBuilder().putBoolean(GeometryKey, true).build()
    assert(ofField(f(StringType, geomMeta)) === Geometry)
    assert(ofField(f(BinaryType, geomMeta)) === Geometry)
  }

  test("EMPTY refinement preempts the static type only for all-null, non-empty data") {
    assert(refineEmpty(Numeric, 0L, 10L) === Empty)
    assert(refineEmpty(Numeric, 1L, 10L) === Numeric)
    assert(refineEmpty(Numeric, 0L, 0L) === Numeric) // zero rows: not EMPTY
  }
}
