package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Fused SimHash vote aggregation: per group, accumulates the `bits`
  * (+1 / −1) vote sums from a long token-hash column in ONE aggregate
  * buffer and emits the assembled signature directly.
  *
  * Why it exists: the expression form — `bits` parallel
  * `sum(when(shiftright(h, b) & 1 === 1, 1).otherwise(-1))` columns
  * folded into a signature — generates code wide enough that the whole
  * aggregation stage falls out of whole-stage codegen (0 WSCG subtrees
  * in the executed plan; the same Janino-budget failure mode as the
  * k-means per-element expansion [[SqL2Expr]] replaced). The interpreted
  * fallback evaluates ~60 CASE trees per token; this node is a single
  * `while` loop over a long[] buffer inside ObjectHashAggregateExec,
  * with map-side partial aggregation — the shuffle carries one
  * `8 * bits`-byte buffer per (partition, id), exactly like the sum
  * columns did.
  *
  * Semantics parity with the expression form (and the DuckDB oracle's
  * `CASE WHEN ... THEN 1 ELSE -1`): a NULL hash votes −1 on every bit
  * (`when(null === 1, 1).otherwise(-1)` takes the otherwise branch);
  * bit b of the result is set iff its vote sum is strictly positive.
  * Merge is elementwise addition — commutative and associative, so
  * partial-aggregation order cannot change the result. */
case class SimhashVotesAgg(
    child: Expression,
    bits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType && bits >= 2 && bits <= 64)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT child and bits in [2, 64], got " +
        s"${child.dataType.sql}, bits=$bits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash_votes"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bits)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) {
      var b = 0
      while (b < bits) { buf(b) -= 1L; b += 1 }
    } else {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < bits) {
        buf(b) += (((h >>> b) & 1L) << 1) - 1L // +1 when bit set, else −1
        b += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bits) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (buf(b) > 0L) sig |= 1L << b
      b += 1
    }
    sig
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * bits)
    var i = 0
    while (i < bits) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bits)
    var i = 0
    while (i < bits) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimhashVotesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimhashVotesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimhashVotesAgg =
    copy(child = newChild)
}

object SimhashVotesAgg {
  /** Column API entry point: the signature long for a grouped hash column. */
  def simhashSig(h: Column, bits: Int): Column =
    Bridge.column(SimhashVotesAgg(Bridge.expression(h), bits).toAggregateExpression())
}
