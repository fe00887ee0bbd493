package graft.sketch

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Bounded id-collection aggregate: gathers at most `cap` long ids per group
  * while counting ALL group members. Output: struct<ids: array<long>
  * (sorted), n: long (true group size)>.
  *
  * This is the memory-safe spine of LSH bucket-pair generation: a plain
  * `collect_list` materializes the ENTIRE bucket in one aggregation buffer
  * before any size filter can run — a 10^8-member hot bucket is an
  * executor OOM. Here the buffer never exceeds `cap` ids (the counter keeps
  * counting, so oversized buckets are still measurable and reportable),
  * partial aggregation caps map-side too, and a bucket with n ≤ cap-1 keeps
  * its exact sorted id list. */
case class BoundedIdsAgg(
    child: Expression,
    cap: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BoundedIdsAgg.Buffer] {

  require(cap > 0)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("ids", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("n", LongType, nullable = false)))
  override def prettyName: String = "bounded_ids"

  override def createAggregationBuffer(): BoundedIdsAgg.Buffer =
    new BoundedIdsAgg.Buffer(cap)

  override def update(buf: BoundedIdsAgg.Buffer, input: InternalRow): BoundedIdsAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BoundedIdsAgg.Buffer, other: BoundedIdsAgg.Buffer): BoundedIdsAgg.Buffer = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: BoundedIdsAgg.Buffer): Any = {
    val ids = buf.idsSorted()
    InternalRow(ArrayData.toArrayData(ids), buf.count)
  }

  override def serialize(buf: BoundedIdsAgg.Buffer): Array[Byte] = buf.toBytes

  override def deserialize(bytes: Array[Byte]): BoundedIdsAgg.Buffer =
    BoundedIdsAgg.Buffer.fromBytes(cap, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedIdsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedIdsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedIdsAgg =
    copy(child = newChildren.head)
}

object BoundedIdsAgg {

  final class Buffer(val cap: Int) {
    private var ids = new Array[Long](math.min(cap, 16))
    private var size = 0
    var count: Long = 0L

    def add(id: Long): Unit = {
      count += 1
      if (size < cap) {
        if (size == ids.length)
          ids = java.util.Arrays.copyOf(ids, math.min(cap, ids.length * 2))
        ids(size) = id
        size += 1
      }
    }

    def mergeFrom(other: Buffer): Unit = {
      count += other.count
      var i = 0
      while (i < other.size && size < cap) {
        if (size == ids.length)
          ids = java.util.Arrays.copyOf(ids, math.min(cap, math.max(ids.length * 2, size + other.size)))
        ids(size) = other.ids(i)
        size += 1
        i += 1
      }
    }

    def idsSorted(): Array[Long] = {
      val out = java.util.Arrays.copyOf(ids, size)
      java.util.Arrays.sort(out)
      out
    }

    def toBytes: Array[Byte] = {
      val bb = ByteBuffer.allocate(12 + size * 8)
      bb.putLong(count)
      bb.putInt(size)
      var i = 0
      while (i < size) { bb.putLong(ids(i)); i += 1 }
      bb.array()
    }
  }

  object Buffer {
    def fromBytes(cap: Int, bytes: Array[Byte]): Buffer = {
      val bb = ByteBuffer.wrap(bytes)
      val buf = new Buffer(cap)
      val count = bb.getLong
      val n = bb.getInt
      var i = 0
      while (i < n) { buf.add(bb.getLong); i += 1 }
      buf.count = count // add() above over-counted; restore the true total
      buf
    }
  }

  /** Make `bounded_ids(id, cap)` callable from expr()/SQL. Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bounded_ids",
      exprs => BoundedIdsAgg(exprs.head,
        exprs(1).eval(null).asInstanceOf[Number].intValue()),
      "built-in")
}
