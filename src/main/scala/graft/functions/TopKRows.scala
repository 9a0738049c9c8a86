package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, InterpretedOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k heap buffer over struct rows, ordered lexicographically by
  * the struct's fields (put the sort key(s) first). Keeps the k SMALLEST.
  */
final class TopKBuffer(val k: Int, ord: Ordering[InternalRow]) {
  // max-heap: head = worst of the kept rows, evicted first
  val heap = new java.util.PriorityQueue[InternalRow](math.max(1, k), ord.reverse)

  def add(r: InternalRow): Unit =
    if (heap.size < k) heap.add(r)
    else if (ord.lt(r, heap.peek())) { heap.poll(); heap.add(r) }

  def mergeFrom(other: TopKBuffer): Unit = {
    val it = other.heap.iterator()
    while (it.hasNext) add(it.next())
  }

  def sorted(o: Ordering[InternalRow]): Array[InternalRow] = {
    val arr = heap.toArray(new Array[InternalRow](heap.size))
    java.util.Arrays.sort(arr, o)
    arr
  }
}

/** The reference's per-query result heap (faiss `CMin/CMax` heaps,
  * reference index/impl/gamma_index_flat.cc:154-233,
  * gamma_index_ivfpq.cc:570-593) as a Catalyst typed aggregate:
  * `groupBy(qid).agg(topk_rows(struct(sortKeys..., payload...), k))`.
  *
  * Scale property: partial aggregation keeps at most k rows per group on
  * the MAP side, so the shuffle moves k-bounded serialized heaps instead
  * of every scored candidate — the distributed equivalent of gamma's
  * per-thread heap + merge, and strictly less traffic than a
  * window/row_number plan, which shuffles all N x Q candidate rows.
  */
case class TopKRows(
    child: Expression,
    k: Int,
    numSortFields: Int = 0, // 0 = all fields; else compare leading prefix only
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def prettyName: String = "topk_rows"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false

  private lazy val structType = child.dataType.asInstanceOf[StructType]
  private lazy val ordering: Ordering[InternalRow] = {
    val n = if (numSortFields > 0) numSortFields else structType.length
    InterpretedOrdering.forSchema(structType.fields.take(n).map(_.dataType).toIndexedSeq)
  }
  @transient private lazy val proj = UnsafeProjection.create(structType)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StructType if k > 0 => TypeCheckResult.TypeCheckSuccess
    case _: StructType => TypeCheckResult.TypeCheckFailure(s"k must be positive, got $k")
    case other => TypeCheckResult.TypeCheckFailure(
      s"topk_rows requires a struct child, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(structType, containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k, ordering)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(proj(v.asInstanceOf[InternalRow]).copy())
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sorted(ordering).asInstanceOf[Array[Any]])

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val rows = buf.sorted(ordering)
    var total = 4
    val bytes = rows.map { r => r.asInstanceOf[UnsafeRow].getBytes }
    bytes.foreach(b => total += 4 + b.length)
    val bb = ByteBuffer.allocate(total)
    bb.putInt(rows.length)
    bytes.foreach { b => bb.putInt(b.length); bb.put(b) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k, ordering)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      val row = new UnsafeRow(structType.length)
      row.pointTo(arr, len)
      buf.add(row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKRows =
    copy(child = newChildren.head)
}
