package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch over a STRING column (Misra &
  * Gries 1982; merge rule from Agarwal et al., "Mergeable Summaries",
  * PODS 2012 — the sketch behind DataSketches' frequent-items).
  *
  * Why it exists: "top terms over 100 TB" via a plain
  * `groupBy(term).count` shuffles the ENTIRE term universe — billions of
  * distinct keys — to answer a question about a few hundred heavy ones.
  * This aggregate keeps at most `capacity` counters per partial buffer;
  * the shuffle carries one ≤`capacity`-entry sketch per partition
  * instead of the term space. Guarantee (capacity m, total processed
  * weight n): every item with true count > n/(m+1) is IN the sketch, and
  * each reported count understates the true count by at most n/(m+1)
  * (merging adds the operands' error bounds, still ≤ n/(m+1) for the
  * combined n — Agarwal et al. Thm. 1).
  *
  * The intended pattern is two-pass exact heavy hitters: the sketch's
  * item set is a guaranteed SUPERSET of everything above the frequency
  * threshold, so pass 2 broadcast-joins the (tiny) candidate set back
  * against the corpus for exact counts — the final answer is exact and
  * order-independent even though sketch contents are arrival-order
  * dependent ([[graft.operators.TextAnalysis.exactHeavyHitters]]).
  *
  * Output rows are (item, est) sorted by (est desc, item asc); `est` is
  * the residual counter — a LOWER bound on the true count. */
case class FreqItemsAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  override def prettyName: String = "freq_items"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a STRING child, got ${child.dataType.sql}")
    else if (capacity < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires capacity >= 1, got $capacity")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // UTF8String may alias a reused input buffer — materialize the key
      FreqItemsAgg.mgUpdate(buf, v.asInstanceOf[UTF8String].toString, capacity)
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (s, c) => a.update(s, a.getOrElse(s, 0L) + c) }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest count from all, drop <= 0 —
      // leaves <= capacity survivors, error bounds add (mergeable-summaries rule)
      val counts = a.valuesIterator.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - capacity - 1)
      a.mapValuesInPlace((_, c) => c - sub)
      a.filterInPlace((_, c) => c > 0L)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows = buf.toArray.sortBy { case (s, c) => (-c, s) }.map { case (s, c) =>
      InternalRow(UTF8String.fromString(s), c)
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] =
    FreqItemsAgg.serializeCounts(buf)

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] =
    FreqItemsAgg.deserializeCounts(bytes)

  override def withNewMutableAggBufferOffset(o: Int): FreqItemsAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): FreqItemsAgg = copy(child = c)
}

object FreqItemsAgg {
  /** array<struct<item,est>> of ≤ capacity candidate heavy hitters — a
    * guaranteed superset of items with true count > n/(capacity+1). */
  def freqItems(c: Column, capacity: Int): Column =
    Bridge.column(FreqItemsAgg(Bridge.expression(c), capacity).toAggregateExpression())

  /** One Misra–Gries step on a standing counter map (shared by the
    * aggregate's update and the streaming trending monitor). */
  def mgUpdate(buf: mutable.HashMap[String, Long], item: String, capacity: Int): Unit =
    buf.get(item) match {
      case Some(c) => buf.update(item, c + 1L)
      case None =>
        if (buf.size < capacity) buf.update(item, 1L)
        else {
          // decrement-all: amortized O(1) — each sweep retires >= size
          // count units and total units added is n
          buf.mapValuesInPlace((_, c) => c - 1L)
          buf.filterInPlace((_, c) => c > 0L)
        }
    }

  def serializeCounts(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, c) =>
      val bytes = s.getBytes("UTF-8")
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  def deserializeCounts(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = mutable.HashMap.empty[String, Long]
    val sz = in.readInt()
    var i = 0
    while (i < sz) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }
}
