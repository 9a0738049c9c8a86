package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded Misra-Gries frequency summary: at most `k` (item, count)
  * slots. Undercount error ≤ N/(k+1) (N = total items seen), and — the
  * property the exact heavy-hitters pass builds on — every item with
  * true frequency > N/(k+1) is GUARANTEED a slot. Merging preserves the
  * bound (Agarwal et al., "Mergeable Summaries", PODS'12): sum the maps,
  * then subtract the (k+1)-th largest count from all and drop ≤ 0.
  */
final class MgBuffer(val k: Int) {
  val counts = new mutable.HashMap[String, Long]
  var seen: Long = 0L

  def add(item: String): Unit = {
    seen += 1
    counts.get(item) match {
      case Some(c) => counts.update(item, c + 1)
      case None if counts.size < k => counts.update(item, 1L)
      case None =>
        // classic MG decrement-all: the unmatched arrival and one unit of
        // every stored item annihilate
        val dead = mutable.ArrayBuffer.empty[String]
        counts.mapValuesInPlace((_, c) => c - 1)
        counts.foreach { case (i, c) => if (c <= 0) dead += i }
        dead.foreach(counts.remove)
    }
  }

  def mergeFrom(other: MgBuffer): Unit = {
    seen += other.seen
    other.counts.foreach { case (i, c) =>
      counts.update(i, counts.getOrElse(i, 0L) + c)
    }
    if (counts.size > k) {
      val cut = counts.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      counts.mapValuesInPlace((_, c) => c - cut)
      counts.foreach { case (i, c) => if (c <= 0) dead += i }
      dead.foreach(counts.remove)
    }
  }
}

/** `mg_sketch(item, k)` — Misra-Gries heavy-hitter candidates as a typed
  * aggregate: partial aggregation keeps ≤ k slots per map task, the
  * shuffle moves one k-bounded summary per partition, and the merged
  * result is `(items map<string,bigint>, seen bigint)`. The summary
  * CONTENT is partition-order-sensitive (any mergeable sketch is); its
  * superset guarantee — every item with freq > seen/(k+1) present — is
  * not, which is what [[graft.text.HeavyHitters]] verifies exactly.
  */
case class MgSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] {

  override def prettyName: String = "mg_sketch"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(s"k must be positive, got $k")
    case other => TypeCheckResult.TypeCheckFailure(
      s"mg_sketch requires a string child, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("items", MapType(StringType, LongType, valueContainsNull = false)),
    StructField("seen", LongType)))

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: MgBuffer, other: MgBuffer): MgBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: MgBuffer): Any = {
    // deterministic layout: items sorted ascending
    val sorted = buf.counts.toArray.sortBy(_._1)
    InternalRow(
      new ArrayBasedMapData(
        new GenericArrayData(sorted.map(x => UTF8String.fromString(x._1)): Array[Any]),
        new GenericArrayData(sorted.map(x => java.lang.Long.valueOf(x._2)): Array[Any])),
      buf.seen)
  }

  override def serialize(buf: MgBuffer): Array[Byte] = {
    val entries = buf.counts.toArray
    val bytes = entries.map(e => e._1.getBytes(StandardCharsets.UTF_8))
    var total = 8 + 4
    bytes.foreach(b => total += 4 + b.length + 8)
    val bb = ByteBuffer.allocate(total)
    bb.putLong(buf.seen)
    bb.putInt(entries.length)
    var i = 0
    while (i < entries.length) {
      bb.putInt(bytes(i).length); bb.put(bytes(i)); bb.putLong(entries(i)._2)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new MgBuffer(k)
    buf.seen = bb.getLong
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.counts.update(new String(arr, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MgSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MgSketch =
    copy(child = newChildren.head)
}
