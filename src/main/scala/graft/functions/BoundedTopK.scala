package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded top-k aggregate: the k SMALLEST child values per group, as an
  * ascending array — the memory-safe replacement for the
  * `slice(array_sort(collect_list(x)), 1, k)` idiom.
  *
  * Why it exists: `collect_list`'s aggregation state holds EVERY row of
  * the group until the slice runs, so a hot group (one query scoring a
  * whole corpus partition, one language holding half the docs) drives
  * executor memory ∝ group size. This aggregate's state is a k-bounded
  * heap — memory ∝ k, period — and because it participates in standard
  * partial aggregation, the map side combines locally and the shuffle
  * carries ≤ k items per (group, map task). One exchange, bounded
  * state, no window: strictly the plan you want for group-wise top-k at
  * 100 TB. (Like Spark's own collect_list it evaluates in
  * ObjectHashAggregateExec rather than whole-stage codegen — the
  * boundedness is worth far more than codegen here.)
  *
  * Ordering is the child type's natural SQL ordering (struct fields
  * compare in declaration order), identical to `array_sort` — callers
  * encode their sort in the item struct exactly as before. Nulls are
  * skipped (collect_list semantics).
  */
case class BoundedTopK(child: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]]
    with UnaryLike[Expression] {
  require(k > 0, "k must be positive")

  // natural ascending ordering of the child type; the priority queue is
  // a MAX-heap under it, so `head` is the current worst of the kept k
  @transient private lazy val ord: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)
  @transient private lazy val rowOrd: Ordering[InternalRow] =
    ord.on[InternalRow](identity)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      // update/serialize handle InternalRow values — reject atomic
      // children at ANALYSIS time instead of a task-side ClassCastException
      // (wrap a single column in struct(...) to rank by it)
      case _: StructType => TypeUtils.checkForOrderingExpr(child.dataType, prettyName)
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a struct child (got ${other.simpleString}); " +
          "wrap the sort key in struct(...)")
    }

  override def prettyName: String = "bounded_top_k"
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    new mutable.PriorityQueue[InternalRow]()(rowOrd)

  private def offer(buf: mutable.PriorityQueue[InternalRow], v: InternalRow,
                    owned: Boolean): Unit = {
    if (buf.size < k) {
      buf.enqueue(if (owned) v else v.copy())
    } else if (ord.compare(v, buf.head) < 0) {
      buf.dequeue()
      buf.enqueue(if (owned) v else v.copy())
    }
  }

  override def update(buf: mutable.PriorityQueue[InternalRow],
                      input: InternalRow): mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    // copy before keeping: eval hands back a reused row buffer
    if (v != null) offer(buf, v.asInstanceOf[InternalRow], owned = false)
    buf
  }

  override def merge(buf: mutable.PriorityQueue[InternalRow],
                     other: mutable.PriorityQueue[InternalRow]): mutable.PriorityQueue[InternalRow] = {
    other.foreach(offer(buf, _, owned = true)) // deserialized rows are ours
    buf
  }

  override def eval(buf: mutable.PriorityQueue[InternalRow]): Any =
    new GenericArrayData(buf.clone().dequeueAll.reverse.toArray[Any])

  @transient private lazy val structType = child.dataType.asInstanceOf[StructType]
  @transient private lazy val proj = UnsafeProjection.create(structType)

  override def serialize(buf: mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { r =>
      val u = proj(r)
      out.writeInt(u.getSizeInBytes)
      u.writeToStream(out, null)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[InternalRow] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val row = new UnsafeRow(structType.length)
      row.pointTo(b, len)
      buf.enqueue(row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedTopK =
    copy(child = newChild)
}

object BoundedTopK {
  /** Column form: `smallestK(struct(...), k)` aggregates to the k
    * smallest item structs in ascending order. */
  def smallestK(item: Column, k: Int): Column =
    ColumnBridge.column(
      BoundedTopK(ColumnBridge.expression(item), k).toAggregateExpression())
}
