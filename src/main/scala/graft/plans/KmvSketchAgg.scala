package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-value sketch (Beyer et al., "On
  * Synopses for Distinct-Value Estimation Under Multiset Operations",
  * SIGMOD 2007 — the same family as Apache DataSketches' theta sketch).
  *
  * Why it exists next to HLL: `hll_sketch_agg` unions but CANNOT
  * intersect — there is no |A∩B| from two HLLs. A KMV sketch is the k
  * smallest distinct hash values of a set; the k smallest of A∪B are all
  * contained in sketch(A) ∪ sketch(B), so union, intersection share ρ
  * (the fraction of the union sketch present in both input sketches) and
  * Jaccard all fall out of two sketches without touching the data again.
  * That answers "how much does corpus A's n-gram set overlap corpus B's"
  * — decontamination triage at 100 TB — as a pair of tiny aggregations
  * plus array arithmetic on two ≤k-element arrays, instead of a
  * distinct-join of two corpus-sized gram sets. Estimators:
  * D ≈ (k−1)/u_(k) (u = normalized k-th minimum), J ≈ ρ,
  * |A∩B| ≈ ρ·D_union; relative error ~1/sqrt(k).
  *
  * DETERMINISM: unlike KLL, the sketch is a pure function of the input
  * SET — the k smallest hashes do not depend on row order, partitioning
  * or merge order. With an engine-reproducible hash (the md5-derived
  * 60-bit long the oracle suite already replays digit-for-digit) every
  * estimate is exactly reproducible by an independent engine, so the
  * kmv_overlap oracle checks the ESTIMATES value-for-value, not just
  * error bounds.
  *
  * Input contract: a LONG hash column, uniform and NON-NEGATIVE (e.g.
  * conv of 15 md5 hex chars = 60 bits, or `xxhash64(...) >>> 4` for the
  * cheap production path); the estimator normalizes by 2^bits. Output:
  * the ascending array<bigint> of the ≤k smallest distinct hashes. */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  override def prettyName: String = "kmv_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a BIGINT child, got ${child.dataType.sql}")
    else if (k < 2)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires k >= 2, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit =
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) {
      if (buf.add(h)) { buf.pollLast(); () }
    }

  override def update(buf: java.util.TreeSet[java.lang.Long], input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long], b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    b.forEach(h => insert(a, h))
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 } // ascending
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.forEach(h => out.writeLong(h))
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new java.util.TreeSet[java.lang.Long]()
    val sz = in.readInt()
    var i = 0
    while (i < sz) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvSketchAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketchAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KmvSketchAgg = copy(child = c)
}

object KmvSketchAgg {
  /** The ascending ≤k-element array of smallest distinct hash values. */
  def kmvSketch(c: Column, k: Int): Column =
    Bridge.column(KmvSketchAgg(Bridge.expression(c), k).toAggregateExpression())
}
