package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary with capacity k: at most k
  * (item → lower-bound count) counters, amortized O(1) per update.
  *
  * Deterministic guarantee (not probabilistic, unlike count-min): after
  * summarizing any stream of N items — in ANY processing order, with ANY
  * partitioning into sub-streams merged pairwise — every item whose true
  * count exceeds N/(k+1) is retained with a positive counter (the
  * mergeable-summaries theorem, Agarwal et al., PODS'12: the combined
  * undercount across update-side decrements and merge-side prunes is at
  * most N/(k+1)). The retained set is therefore a guaranteed SUPERSET of
  * the heavy hitters at any threshold θ ≥ 1/(k+1) — the exact-recount
  * pass that follows makes the final answer exact and order-independent
  * even though the intermediate sketch contents are partition-dependent.
  */
final class MGBuffer(val k: Int) {
  // Boxed values so absence is a null — ONE hash probe on the hottest
  // path (add runs once per token occurrence), and presence is decided
  // by the probe itself, never by the counters-are-positive invariant.
  val counts = new java.util.HashMap[String, java.lang.Long](k * 2)

  def add(item: String, w: Long): Unit = {
    val cur = counts.get(item)
    if (cur != null) counts.put(item, cur + w)
    else if (counts.size < k) counts.put(item, w)
    else {
      // Decrement-all by the incoming weight (capped at the smallest
      // counter so no counter goes negative in the weighted case), then
      // retry any remainder. For w=1 this is the classic MG step.
      var min = Long.MaxValue
      val it0 = counts.values().iterator()
      while (it0.hasNext) { val v = it0.next(); if (v < min) min = v }
      val dec = math.min(w, min)
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - dec
        if (nv <= 0L) it.remove() else e.setValue(nv)
      }
      val rem = w - dec
      if (rem > 0L) add(item, rem)
    }
  }

  /** Merge-side prune: combine counters, and if over capacity subtract the
    * (k+1)-th largest count from all and drop the non-positive. */
  def mergeFrom(other: MGBuffer): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      counts.put(e.getKey, (if (cur == null) 0L else cur.longValue) + e.getValue)
    }
    if (counts.size > k) {
      val vals = new Array[Long](counts.size)
      val vi = counts.values().iterator()
      var i = 0
      while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - k - 1) // (k+1)-th largest
      val ei = counts.entrySet().iterator()
      while (ei.hasNext) {
        val e = ei.next()
        val nv = e.getValue - cut
        if (nv <= 0L) ei.remove() else e.setValue(nv)
      }
    }
  }
}

/** Aggregate `freq_sketch(item, k)` → array<struct<item string, lb
  * bigint>>: the ≤k Misra–Gries candidates with their retained
  * lower-bound counters, sorted by item. Use as the FIRST pass of exact
  * heavy-hitter detection: the second pass recounts only the candidates
  * (broadcast equi-join) and applies the exact threshold. The counters
  * exist so summaries can be FOLDED incrementally outside the aggregate
  * (streaming day-2: union counter rows, subtract the (k+1)-th largest,
  * keep positive — [[graft.streaming.StreamGate]]'s rolling sketch);
  * exact counts come from the recount pass, never from `lb`.
  *
  * This is the scale substitute for `GROUP BY item` over a row-scale
  * vocabulary: the full group-by shuffles EVERY distinct key (an n-gram
  * vocabulary grows with the corpus — billions of keys at 100 TB); the
  * sketch pass carries at most k counters per map task into a 1-row
  * reduce, and the recount pass shuffles only candidate keys.
  */
case class FreqSketch(
    item: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGBuffer] {

  require(k > 0, s"freq_sketch requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(item)
  override def checkInputDataTypes(): TypeCheckResult =
    if (item.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${item.dataType.catalogString}")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    new StructType().add("item", StringType).add("lb", LongType),
    containsNull = false)

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(k)

  override def update(buf: MGBuffer, input: InternalRow): MGBuffer = {
    val v = item.eval(input)
    // .toString copies out of Spark's reused row buffer — a retained
    // UTF8String would alias mutated memory.
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: MGBuffer, other: MGBuffer): MGBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: MGBuffer): Any = {
    val keys = buf.counts.keySet().toArray(new Array[String](buf.counts.size))
    java.util.Arrays.sort(keys, java.util.Comparator.naturalOrder[String]())
    new GenericArrayData(keys.map(k =>
      InternalRow(UTF8String.fromString(k), buf.counts.get(k)): Any))
  }

  override def serialize(buf: MGBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      // length-prefixed raw UTF-8, not writeUTF: a retained item longer
      // than 64 KiB (one giant space-free crawl token inside a trigram)
      // would make writeUTF throw at shuffle time.
      val kb = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MGBuffer(in.readInt())
    var n = in.readInt()
    while (n > 0) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf.counts.put(
        new String(kb, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      n -= 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqSketch =
    copy(item = newChildren(0))

  override def prettyName: String = "freq_sketch"
}

object FreqSketch {
  /** Registry builder: second argument must be a foldable integer. */
  def fromExprs(exprs: Seq[Expression]): FreqSketch = {
    require(exprs.length == 2,
      s"freq_sketch(item, k) takes 2 arguments, got ${exprs.length}")
    val k = exprs(1) match {
      case e if e.foldable =>
        e.eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"freq_sketch k must be an integer literal, got $other")
        }
      case _ => throw new IllegalArgumentException(
        "freq_sketch k must be a literal")
    }
    FreqSketch(exprs.head, k)
  }
}
