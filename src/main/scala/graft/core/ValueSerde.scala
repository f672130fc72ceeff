package graft.core

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.unsafe.types.UTF8String

/** Little-endian value ⇄ bytes serialization — the analog of the reference's
  * LE scalar codecs (`/root/reference/src/common/bytes_utils.h:35-206`, T13 in
  * SURVEY.md §2.2) and typed-buffer codecs (`typed_buffer_codecs.h`).
  *
  * Operates on *Catalyst internal* values (UTF8String for strings, Int for
  * dates, Long micros for timestamps) so expressions can call it from both the
  * interpreted and codegen paths without row conversion.
  *
  * Fixed-width types report `Some(width)` from [[ValueSerde.fixedWidth]] —
  * the per-value wire format distinguishes fixed vs variable exactly like the
  * reference (`encryptor_utils.h:29-45`).
  */
object ValueSerde {

  /** Fixed byte width per type, None for variable-size types. */
  def fixedWidth(dt: DataType): Option[Int] = dt match {
    case BooleanType               => Some(1)
    case ByteType                  => Some(1)
    case ShortType                 => Some(2)
    case IntegerType | DateType    => Some(4)
    case FloatType                 => Some(4)
    case LongType | TimestampType | TimestampNTZType => Some(8)
    case DoubleType                => Some(8)
    case StringType | BinaryType   => None
    case _: DecimalType            => None
    case other =>
      throw new GraftInvalidInputException(s"unsupported type for protection: $other")
  }

  def supports(dt: DataType): Boolean =
    try { fixedWidth(dt); true } catch { case _: GraftInvalidInputException => false }

  private def le(n: Int): ByteBuffer =
    ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)

  /** Catalyst internal value → bytes. Null must be handled by the caller
    * (reference encrypts only *present* values; nulls ride the levels —
    * SURVEY.md §1.3).
    */
  def serialize(dt: DataType, v: Any): Array[Byte] = dt match {
    case BooleanType => Array[Byte](if (v.asInstanceOf[Boolean]) 1 else 0)
    case ByteType    => Array(v.asInstanceOf[Byte])
    case ShortType   => le(2).putShort(v.asInstanceOf[Short]).array()
    case IntegerType | DateType => le(4).putInt(v.asInstanceOf[Int]).array()
    case FloatType   => le(4).putFloat(v.asInstanceOf[Float]).array()
    case LongType | TimestampType | TimestampNTZType =>
      le(8).putLong(v.asInstanceOf[Long]).array()
    case DoubleType  => le(8).putDouble(v.asInstanceOf[Double]).array()
    case StringType  => v.asInstanceOf[UTF8String].getBytes.clone()
    case BinaryType  => v.asInstanceOf[Array[Byte]]
    case dt: DecimalType =>
      // unscaled big-endian two's-complement bytes (BigInteger canonical form);
      // scale is part of the declared type, so it round-trips via the schema.
      v.asInstanceOf[org.apache.spark.sql.types.Decimal]
        .toJavaBigDecimal.unscaledValue().toByteArray
    case other =>
      throw new GraftInvalidInputException(s"unsupported type for protection: $other")
  }

  /** Bytes → Catalyst internal value; strict length validation for fixed types. */
  def deserialize(dt: DataType, b: Array[Byte]): Any = {
    fixedWidth(dt).foreach { w =>
      if (b.length != w)
        throw new GraftInvalidInputException(
          s"decrypted payload for $dt has ${b.length} bytes, expected $w")
    }
    dt match {
      case BooleanType => b(0) != 0
      case ByteType    => b(0)
      case ShortType   => ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getShort
      case IntegerType | DateType =>
        ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt
      case FloatType   => ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getFloat
      case LongType | TimestampType | TimestampNTZType =>
        ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getLong
      case DoubleType  => ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getDouble
      case StringType  => UTF8String.fromBytes(b)
      case BinaryType  => b
      case dt: DecimalType =>
        org.apache.spark.sql.types.Decimal(
          new java.math.BigDecimal(new java.math.BigInteger(b), dt.scale),
          dt.precision, dt.scale)
      case other =>
        throw new GraftInvalidInputException(s"unsupported type for protection: $other")
    }
  }
}
