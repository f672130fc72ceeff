package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/** SimHash as a custom `TypedImperativeAggregate`: accumulates per-bit ±1
  * votes from 64-bit token hashes into a 64-int buffer and emits the 64-bit
  * signature.
  *
  * Scale rationale: the composable formulation (explode 64 bit-votes per
  * token, two groupBys — `Dedup.simhashViaBits`) shuffles 64× the rows; this
  * aggregate is ONE partial-aggregated shuffle with a 256-byte buffer —
  * exactly the mutable-buffer pattern the reference uses for its in-place
  * encryption loops (`typed_buffer.h` write buffers).
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] with UnaryLike[Expression] {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash_agg"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < 64) {
        buf(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Int]): Any = {
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (buf(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(256).order(ByteOrder.LITTLE_ENDIAN)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    Array.fill(64)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(offset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SimHashAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): SimHashAgg =
    copy(child = newChild)
}

object SimHashAgg {
  /** simhash_agg(tokenHash) — aggregate a LongType token-hash column. */
  def simhash_agg(c: Column): Column =
    ColumnShim.column(SimHashAgg(ColumnShim.expression(c)).toAggregateExpression())
}
