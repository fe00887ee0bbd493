package graft.sketch

import java.nio.ByteBuffer
import java.util.Comparator

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k (score, id) pairs with the highest
  * score (ties broken by lowest id) in a size-k heap, mergeable across
  * partitions. This is the scale-safe exact-top-k shape: Spark's partial
  * aggregation keeps at most k entries per group per input partition, so the
  * shuffle moves k·|groups|·|partitions| 16-byte pairs instead of the full
  * scored cross product (the `row_number() OVER (PARTITION BY query)` plan
  * shuffles every scored row to one reducer per query — at 10^12 corpus rows
  * that single window exchange is the whole job).
  *
  * `eval` returns array<struct<id:long, score:double>> sorted by
  * (score desc, id asc) — position+1 is the rank.
  */
case class TopKPairsAgg(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKPairsAgg.Buffer] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "topk_pairs"

  override def createAggregationBuffer(): TopKPairsAgg.Buffer =
    new TopKPairsAgg.Buffer(k)

  override def update(buf: TopKPairsAgg.Buffer, input: InternalRow): TopKPairsAgg.Buffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKPairsAgg.Buffer, other: TopKPairsAgg.Buffer): TopKPairsAgg.Buffer = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: TopKPairsAgg.Buffer): Any = {
    val entries = buf.sortedBestFirst()
    new GenericArrayData(entries.map { e =>
      InternalRow(e.id, e.score)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: TopKPairsAgg.Buffer): Array[Byte] = buf.toBytes

  override def deserialize(bytes: Array[Byte]): TopKPairsAgg.Buffer =
    TopKPairsAgg.Buffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairsAgg =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKPairsAgg {

  final case class Entry(score: Double, id: Long)

  /** Worst entry first: lowest score, then highest id (so `peek` is the
    * entry a better candidate should evict). */
  private val worstFirst: Comparator[Entry] = new Comparator[Entry] {
    override def compare(a: Entry, b: Entry): Int = {
      val c = java.lang.Double.compare(a.score, b.score)
      if (c != 0) c else java.lang.Long.compare(b.id, a.id)
    }
  }

  final class Buffer(val k: Int) {
    private val pq = new java.util.PriorityQueue[Entry](k + 1, worstFirst)

    def add(score: Double, id: Long): Unit = {
      if (pq.size < k) pq.offer(Entry(score, id))
      else {
        val w = pq.peek()
        if (score > w.score || (score == w.score && id < w.id)) {
          pq.poll(); pq.offer(Entry(score, id))
        }
      }
    }

    def mergeFrom(other: Buffer): Unit = {
      val it = other.pq.iterator()
      while (it.hasNext) { val e = it.next(); add(e.score, e.id) }
    }

    def sortedBestFirst(): Array[Entry] = {
      val arr = pq.toArray(new Array[Entry](pq.size))
      java.util.Arrays.sort(arr, worstFirst.reversed())
      arr
    }

    def toBytes: Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + pq.size * 16)
      bb.putInt(pq.size)
      val it = pq.iterator()
      while (it.hasNext) { val e = it.next(); bb.putDouble(e.score); bb.putLong(e.id) }
      bb.array()
    }
  }

  object Buffer {
    def fromBytes(k: Int, bytes: Array[Byte]): Buffer = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = new Buffer(k)
      var i = 0
      while (i < n) { buf.add(bb.getDouble, bb.getLong); i += 1 }
      buf
    }
  }

  /** Make `topk_pairs(score, id, k)` callable from expr()/SQL. Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_pairs",
      exprs => TopKPairsAgg(exprs(0), exprs(1),
        exprs(2).eval(null).asInstanceOf[Number].intValue()),
      "built-in")
}
