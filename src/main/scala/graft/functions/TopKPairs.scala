package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import scala.collection.mutable

/** Bounded-heap top-k aggregate: keeps the k best (sim, id) pairs per
  * group, "best" = highest sim, ties broken by smallest id — the exact
  * order the knn queries rank by.
  *
  * WHY an aggregate and not a window: `row_number().over(partitionBy
  * (qid).orderBy(...)) <= k` must shuffle EVERY scored row to its group's
  * reducer and sort the whole group, O(n log n) per group with n-row
  * exchanges. A TypedImperativeAggregate gets map-side PARTIAL
  * aggregation: each map task reduces its slice to <= k pairs per group
  * before the exchange, so the shuffle carries at most k·maps rows per
  * group and the reducer merges tiny heaps — the difference between
  * shuffling 100 TB of scores and shuffling kilobytes at corpus scale.
  *
  * Output: array<struct<vec_id: long, sim: double>> sorted best-first;
  * callers posexplode and use (position + 1) as the rank. Deterministic
  * regardless of partitioning (the (sim desc, id asc) total order has no
  * ties), so results are oracle-checkable.
  */
case class TopKPairs(simExpr: Expression, idExpr: Expression, kExpr: Expression,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  private lazy val k: Int = kExpr match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"graft_topk: k must be an integer literal, got $other")
  }

  // PriorityQueue dequeues the ordering's MAX; make the WORST pair the
  // max (lowest sim, then highest id) so trimming evicts it first.
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.fromLessThan[(Double, Long)] { case ((s1, i1), (s2, i2)) =>
      if (s1 != s2) s1 > s2 else i1 < i2
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = simExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      buf.enqueue((s.asInstanceOf[Double], i.asInstanceOf[Long]))
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
                     other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { p =>
      buf.enqueue(p)
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val best = buf.toArray.sortWith { case ((s1, i1), (s2, i2)) =>
      if (s1 != s2) s1 > s2 else i1 < i2
    }
    new GenericArrayData(best.map { case (s, i) => InternalRow(i, s) }.toArray[Any])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.enqueue((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(simExpr, idExpr, kExpr)
  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(simExpr = newChildren(0), idExpr = newChildren(1), kExpr = newChildren(2))
}
