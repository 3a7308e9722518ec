package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch as a native Catalyst
  * [[TypedImperativeAggregate]] — the custom-AGGREGATE counterpart to the
  * codegen'd scalar expressions in [[VectorFunctions]].
  *
  * The buffer is the set of the k smallest DISTINCT hash values seen; update
  * is O(log k) against a bounded ordered set, merge is the union-then-trim
  * that makes the sketch mergeable, and eval emits (n_held, θ) where θ is
  * the k-th minimum (null while fewer than k distinct values exist — the
  * caller's signal that n_held IS the exact count). Because the buffer is
  * bounded at k longs, Spark's ordinary partial-aggregation machinery gives
  * the 100 TB shape for free: map-side partial sketches of ≤ k·8 bytes per
  * group shuffle instead of the distinct value stream, and register-style
  * re-merge across shards/days is the same `merge`. Determinism: the result
  * is a pure function OF THE SET of input values (insertion order and
  * duplication cannot change a set's k smallest), so any execution geometry
  * yields the identical sketch.
  *
  * SQL surface: `kmv_minset(v, k)` with v BIGINT and k a literal —
  * registered alongside the vec_* family in [[VectorFunctions.register]]
  * and [[GraftExtensions]]; the analyzer wraps the bare AggregateFunction
  * in a Complete AggregateExpression at resolution.
  */
case class KmvMinSet(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"kmv_minset needs k >= 2, got $k")

  // analysis-time typing (ADVICE r14, same gap as PriorityTopK): a
  // non-BIGINT value column must fail analysis, not ClassCastException
  // inside update()
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_minset requires a BIGINT value column, got ${child.dataType}")

  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n_held", LongType, nullable = false),
    StructField("theta", LongType, nullable = true)))

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  private def add(buf: mutable.TreeSet[Long], v: Long): Unit =
    if (buf.size < k) buf += v
    else if (v < buf.last) { buf += v; if (buf.size > k) buf -= buf.last }

  override def update(
      buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      b1: mutable.TreeSet[Long],
      b2: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    b2.foreach(add(b1, _))
    b1
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    InternalRow(buf.size.toLong,
      if (buf.size == k) buf.last else null)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + buf.size * 8)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { buf += in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvMinSet =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvMinSet =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): KmvMinSet =
    copy(child = newChild)
}

object KmvMinSet {
  /** Registry builder: second argument must be a literal int k. */
  def build(es: Seq[Expression]): Expression = es match {
    case Seq(v, Literal(k: Int, IntegerType)) => KmvMinSet(v, k)
    case _ => throw new IllegalArgumentException(
      "kmv_minset(value BIGINT, k INT-literal)")
  }
}

/** The same bounded k-min buffer, but eval emits the full SORTED ARRAY of
  * held values instead of (n_held, θ) — the form sketch SET ALGEBRA needs:
  * the k smallest of `array_union(A.mins, B.mins)` are provably the k
  * smallest of the full A ∪ B, so union/intersection/Jaccard estimators are
  * row-local array HOFs over two ≤ k-long arrays (q242). Shares every
  * buffer/merge/serialize code path with [[KmvMinSet]]. */
case class KmvMinArray(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"kmv_minarray needs k >= 2, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_minarray requires a BIGINT value column, got ${child.dataType}")

  private val inner = KmvMinSet(child, k)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    inner.createAggregationBuffer()
  override def update(
      buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] =
    inner.update(buf, input)
  override def merge(
      b1: mutable.TreeSet[Long],
      b2: mutable.TreeSet[Long]): mutable.TreeSet[Long] = inner.merge(b1, b2)
  override def eval(buf: mutable.TreeSet[Long]): Any =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(buf.toArray)
  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] =
    inner.serialize(buf)
  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] =
    inner.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): KmvMinArray =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvMinArray =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): KmvMinArray =
    copy(child = newChild)
}

object KmvMinArray {
  def build(es: Seq[Expression]): Expression = es match {
    case Seq(v, Literal(k: Int, IntegerType)) => KmvMinArray(v, k)
    case _ => throw new IllegalArgumentException(
      "kmv_minarray(value BIGINT, k INT-literal)")
  }
}
