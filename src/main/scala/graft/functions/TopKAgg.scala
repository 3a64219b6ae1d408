package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Per-group top-k aggregate over doubles — the scale replacement for
  * the `row_number() OVER (PARTITION BY g ORDER BY x DESC) <= k`
  * pattern: a window must shuffle AND sort every group's full row
  * set, while this aggregate keeps a k-element min-heap per group and
  * PARTIAL-AGGREGATES (map-side combine), so only k doubles per group
  * per partition ever shuffle. Returns the up-to-k largest values,
  * sorted descending. Nulls are skipped; an empty group yields an
  * empty array. */
case class TopKAgg(child: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[java.lang.Double]] {

  require(k >= 1, "top-k needs k >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): java.util.PriorityQueue[java.lang.Double] =
    new java.util.PriorityQueue[java.lang.Double](k + 1)

  private def push(buf: java.util.PriorityQueue[java.lang.Double], v: Double): Unit =
    if (buf.size < k) buf.add(v)
    else if (v > buf.peek()) { buf.poll(); buf.add(v) }

  override def update(buf: java.util.PriorityQueue[java.lang.Double],
      input: InternalRow): java.util.PriorityQueue[java.lang.Double] = {
    val v = child.eval(input)
    if (v != null) push(buf, v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: java.util.PriorityQueue[java.lang.Double],
      other: java.util.PriorityQueue[java.lang.Double]): java.util.PriorityQueue[java.lang.Double] = {
    val it = other.iterator()
    while (it.hasNext) push(buf, it.next())
    buf
  }

  override def eval(buf: java.util.PriorityQueue[java.lang.Double]): Any = {
    val out = new Array[Double](buf.size)
    var i = out.length - 1
    while (i >= 0) { out(i) = buf.poll(); i -= 1 } // heap pops ascending
    new GenericArrayData(out.map(x => x: Any))
  }

  override def serialize(buf: java.util.PriorityQueue[java.lang.Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeDouble(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[java.lang.Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(in.readDouble()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(child = newChildren.head)
}

object TopKAgg {
  /** Column API: `df.groupBy(g).agg(TopKAgg.topk(col, 5))`. */
  def topk(c: Column, k: Int): Column =
    ColumnBridge.column(
      TopKAgg(ColumnBridge.expression(c), k).toAggregateExpression())

  /** Column API for the keyed variant: array of {v, id} structs, best
    * first. `payload` must be (castable to) LONG. */
  def topkKeyed(sort: Column, payload: Column, k: Int): Column =
    ColumnBridge.column(TopKKeyedAgg(ColumnBridge.expression(sort),
      ColumnBridge.expression(payload), k).toAggregateExpression())
}

/** Keyed per-group top-k: keeps the k largest (sort-value, payload)
  * pairs per group — the payload rides along, so q62-style queries
  * return WHICH rows won (order ids with their totals) without a
  * window over the full row set. Same partial-aggregation shape as
  * [[TopKAgg]]: only k (double, long) pairs per group per partition
  * shuffle. Ordering is total and deterministic: larger value wins,
  * ties break toward the SMALLER payload — mirror a SQL window with
  * `ORDER BY v DESC, id ASC`. Output: array of {v, id} structs,
  * best first. Null sort values and null payloads are skipped. */
case class TopKKeyedAgg(sort: Expression, payload: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[(Double, Long)]] {

  require(k >= 1, "top-k needs k >= 1")

  override def children: Seq[Expression] = Seq(sort, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("v", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_topk_keyed"

  private def worstFirst = TopKKeyedAgg.WorstFirst

  override def createAggregationBuffer(): java.util.PriorityQueue[(Double, Long)] =
    new java.util.PriorityQueue[(Double, Long)](k + 1, worstFirst)

  private def push(buf: java.util.PriorityQueue[(Double, Long)],
      p: (Double, Long)): Unit =
    if (buf.size < k) buf.add(p)
    else if (worstFirst.compare(p, buf.peek()) > 0) { buf.poll(); buf.add(p) }

  override def update(buf: java.util.PriorityQueue[(Double, Long)],
      input: InternalRow): java.util.PriorityQueue[(Double, Long)] = {
    val v = sort.eval(input)
    val id = payload.eval(input)
    if (v != null && id != null)
      push(buf, (v.asInstanceOf[Double], id.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: java.util.PriorityQueue[(Double, Long)],
      other: java.util.PriorityQueue[(Double, Long)]): java.util.PriorityQueue[(Double, Long)] = {
    val it = other.iterator()
    while (it.hasNext) push(buf, it.next())
    buf
  }

  override def eval(buf: java.util.PriorityQueue[(Double, Long)]): Any = {
    val out = new Array[Any](buf.size)
    var i = out.length - 1
    while (i >= 0) { // heap pops worst-first; fill back-to-front
      val p = buf.poll()
      out(i) = InternalRow(p._1, p._2)
      i -= 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val p = it.next()
      out.writeDouble(p._1); out.writeLong(p._2)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKKeyedAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKKeyedAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKKeyedAgg =
    copy(sort = newChildren(0), payload = newChildren(1))
}

object TopKKeyedAgg {
  /** Worst-first order so the heap head is always the eviction
    * candidate: smaller value is worse; on equal values the LARGER
    * payload is worse (so the smaller payload survives a tie).
    * A top-level serializable object — the aggregate ships to
    * executors. */
  object WorstFirst extends java.util.Comparator[(Double, Long)]
      with Serializable {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    }
  }
}
