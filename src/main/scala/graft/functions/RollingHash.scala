package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprinting via a polynomial rolling hash (base-257 over the
  * UTF-8 bytes, wrapping 64-bit) — a native codegen'd `Expression`, the
  * scalable alternative to md5-hex fingerprints (no hex string churn, 8-byte
  * output, whole-stage codegen keeps it in the generated loop).
  */
case class RollingHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_hash64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rolling_hash64 expects STRING or BINARY, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any = v match {
    case s: UTF8String => HashKernels.rolling64(s.getBytes)
    case b: Array[Byte] => HashKernels.rolling64(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernels = HashKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    child.dataType match {
      case StringType =>
        nullSafeCodeGen(ctx, ev, c =>
          s"${ev.value} = $kernels.rolling64($c.getBytes());")
      case _ =>
        nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernels.rolling64($c);")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
}

object HashKernels {
  final val Base = 257L
  def rolling64(bytes: Array[Byte]): Long = {
    var h = 1125899906842597L // large prime offset
    var i = 0
    while (i < bytes.length) {
      h = h * Base + (bytes(i) & 0xffL)
      i += 1
    }
    h
  }
}

object RollingHash64 {
  def rolling_hash64(c: Column): Column =
    ColumnShim.column(RollingHash64(ColumnShim.expression(c)))
}
