package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.types._

/** Bounded top-k-by-priority summary as a native Catalyst
  * [[TypedImperativeAggregate]] — the state shape of PRIORITY SAMPLING
  * (Duffield–Lund–Thorup, JACM 2007): hold the k largest (priority, id)
  * pairs seen, where priority = weight / uniform-hash. Alongside HLL
  * (q240/q244), count-min (q78/q248) and KMV (q241/q254) this is the
  * fourth classic mergeable summary in the repo's batch↔stream matrix:
  * update is O(log k) against a bounded ordered set, merge is
  * union-then-trim, and the buffer is ≤ k·16 bytes regardless of input
  * volume — so Spark's ordinary partial aggregation ships k-pair partial
  * samples per group instead of the weighted item stream, and the
  * streaming state store carries the same bounded buffer per key (q263).
  *
  * Determinism: the held set is a pure function of the input SET under the
  * total order (priority DESC, id ASC) — insertion order, duplication and
  * merge shape cannot change a set's k largest — so any execution geometry
  * (and any batch slicing) yields the identical sample.
  *
  * SQL surface: `priority_topk(pri BIGINT, id BIGINT, k INT-literal)` →
  * ARRAY<STRUCT<pri: BIGINT, id: BIGINT>> sorted best-first. Registered
  * alongside the vec_ and kmv_ families in [[VectorFunctions.register]]
  * and [[GraftExtensions]].
  */
case class PriorityTopK(
    first: Expression,
    second: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[(Long, Long)]]
  with TernaryLike[Expression] {

  require(k >= 1, s"priority_topk needs k >= 1, got $k")

  // third child is the k literal, kept so the expression tree prints it
  override def third: Expression = Literal(k)

  // analysis-time typing (ADVICE r14): a non-BIGINT priority or id column
  // would otherwise pass analysis and ClassCastException at execution from
  // update()'s asInstanceOf[Long]
  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == LongType && second.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"priority_topk requires BIGINT (pri, id) columns, got " +
        s"${first.dataType} / ${second.dataType}")

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pri", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  /** Orders entries worst-first: lower priority is worse; on priority ties
    * the LARGER id is worse (the sample's total order is pri DESC, id ASC,
    * so the head of this set is the first entry to evict). */
  private implicit val worstFirst: Ordering[(Long, Long)] =
    Ordering.fromLessThan { case ((p1, i1), (p2, i2)) =>
      p1 < p2 || (p1 == p2 && i1 > i2)
    }

  override def createAggregationBuffer(): mutable.TreeSet[(Long, Long)] =
    mutable.TreeSet.empty[(Long, Long)]

  private def add(buf: mutable.TreeSet[(Long, Long)], e: (Long, Long)): Unit =
    if (buf.size < k) buf += e
    else if (worstFirst.gt(e, buf.head)) { buf += e; if (buf.size > k) buf -= buf.head }

  override def update(
      buf: mutable.TreeSet[(Long, Long)],
      input: InternalRow): mutable.TreeSet[(Long, Long)] = {
    val p = first.eval(input)
    val id = second.eval(input)
    if (p != null && id != null)
      add(buf, (p.asInstanceOf[Long], id.asInstanceOf[Long]))
    buf
  }

  override def merge(
      b1: mutable.TreeSet[(Long, Long)],
      b2: mutable.TreeSet[(Long, Long)]): mutable.TreeSet[(Long, Long)] = {
    b2.foreach(add(b1, _))
    b1
  }

  override def eval(buf: mutable.TreeSet[(Long, Long)]): Any =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      buf.toSeq.reverse.map { case (p, id) => InternalRow(p, id) }.toArray)

  override def serialize(buf: mutable.TreeSet[(Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + buf.size * 16)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (p, id) => out.writeLong(p); out.writeLong(id) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[(Long, Long)] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.TreeSet.empty[(Long, Long)]
    var i = 0
    while (i < n) { buf += ((in.readLong(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): PriorityTopK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): PriorityTopK =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PriorityTopK =
    copy(first = f, second = s)
}

object PriorityTopK {
  /** Registry builder: third argument must be a literal int k. */
  def build(es: Seq[Expression]): Expression = es match {
    case Seq(p, id, Literal(k: Int, IntegerType)) => PriorityTopK(p, id, k)
    case _ => throw new IllegalArgumentException(
      "priority_topk(pri BIGINT, id BIGINT, k INT-literal)")
  }
}
