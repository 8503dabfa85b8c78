package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: a size-k min-heap ordered by goodness
  * (score desc, id asc — the head is the WORST retained element, evicted
  * first). Insertion is O(log k); memory is O(k) regardless of input size.
  */
final class TopKBuffer(val k: Int) {
  import TopKBuffer.cmp
  val heap = new java.util.PriorityQueue[(Double, Long)](math.max(k, 1), cmp)

  def insert(score: Double, id: Long): Unit = {
    if (heap.size < k) heap.offer((score, id))
    else if (cmp.compare((score, id), heap.peek) > 0) {
      heap.poll(); heap.offer((score, id))
    }
  }
}

object TopKBuffer {
  /** Ascending goodness: a < b when a has lower score, or equal score and
    * larger id (deterministic total order — no raw-double rank ties). */
  val cmp: java.util.Comparator[(Double, Long)] =
    new java.util.Comparator[(Double, Long)] {
      override def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(a._1, b._1)
        if (c != 0) c else java.lang.Long.compare(b._2, a._2)
      }
    }
}

/** Aggregate `topk_by_score(score, id, k)` → array<struct<score,id>> of the
  * k highest-scoring (score desc, id asc) inputs per group.
  *
  * This is the scale substitute for `row_number() OVER (PARTITION BY g
  * ORDER BY score DESC) <= k`: the window shuffles EVERY candidate row to
  * one reducer per group (the skew ceiling when a group spans the whole
  * table, as in ANN scoring where g = query_id). A TypedImperativeAggregate
  * keeps a k-bounded heap per group per map task, so the shuffle carries at
  * most k rows per (group × partition) — map-side truncation, the same
  * partial-aggregation contract as `min`/`max`.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, s"topk_by_score requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  // AbstractDataType (the ExpectsInputTypes contract) is private[sql], so
  // the type gate lives here instead: exact (double, bigint) inputs.
  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double, bigint) arguments, got " +
        s"(${score.dataType.catalogString}, ${id.dataType.catalogString})")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    new StructType().add("score", DoubleType).add("id", LongType),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    val it = other.heap.iterator()
    while (it.hasNext) { val e = it.next(); buf.insert(e._1, e._2) }
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val arr = new Array[(Double, Long)](buf.heap.size)
    var i = arr.length - 1
    while (i >= 0) { arr(i) = buf.heap.poll(); i -= 1 } // drain worst-first
    new GenericArrayData(arr.map(e => InternalRow(e._1, e._2)))
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.heap.size)
    val it = buf.heap.iterator()
    while (it.hasNext) {
      val e = it.next(); out.writeDouble(e._1); out.writeLong(e._2)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(in.readInt())
    var n = in.readInt()
    while (n > 0) { buf.insert(in.readDouble(), in.readLong()); n -= 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))

  override def prettyName: String = "topk_by_score"
}

object TopKByScore {
  /** Registry builder: third argument must be a foldable integer. */
  def fromExprs(exprs: Seq[Expression]): TopKByScore = {
    require(exprs.length == 3,
      s"topk_by_score(score, id, k) takes 3 arguments, got ${exprs.length}")
    val k = exprs(2) match {
      case e if e.foldable =>
        e.eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"topk_by_score k must be an integer literal, got $other")
        }
      case _ => throw new IllegalArgumentException(
        "topk_by_score k must be a literal")
    }
    TopKByScore(exprs.head, exprs(1), k)
  }
}
