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

  /** 63-bit token hash built ENTIRELY from oracle-replayable pieces: the
    * base-257 wrapping rolling hash (t06's HUGEINT mod-2⁶⁴ replay) split
    * into 32-bit halves, each finalized with the split-multiply murmur3
    * fmix32 (s02's BIGINT replay — every intermediate < 2⁴⁸). The high
    * half is masked to 31 bits so the result is a non-negative BIGINT and
    * DuckDB's `//`-and-`%` bit extraction is exact. This is what graduates
    * SimHash (d04) to a full cross-engine hash oracle: xxhash64 has no SQL
    * replay, this chain does, bit for bit.
    */
  def fmixToken63(bytes: Array[Byte]): Long = {
    val r = rolling64(bytes)
    val lo = r & 0xffffffffL
    val hi = r >>> 32
    val hLo = VectorKernels.fmix32(lo)
    val hHi = VectorKernels.fmix32(hi ^ lo)
    hLo | ((hHi & 0x7fffffffL) << 32)
  }
}

/** [[HashKernels.fmixToken63]] as a native codegen'd `Expression` — the
  * token-hash step of the oracle-able SimHash chain (d04). Stays inside
  * whole-stage codegen like [[RollingHash64]].
  */
case class FmixTokenHash63(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "fmix_token_hash63"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"fmix_token_hash63 expects STRING or BINARY, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any = v match {
    case s: UTF8String => HashKernels.fmixToken63(s.getBytes)
    case b: Array[Byte] => HashKernels.fmixToken63(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernels = HashKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    child.dataType match {
      case StringType =>
        nullSafeCodeGen(ctx, ev, c =>
          s"${ev.value} = $kernels.fmixToken63($c.getBytes());")
      case _ =>
        nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernels.fmixToken63($c);")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): FmixTokenHash63 =
    copy(child = newChild)
}

object FmixTokenHash63 {
  def fmix_token_hash63(c: Column): Column =
    ColumnShim.column(FmixTokenHash63(ColumnShim.expression(c)))
}

object RollingHash64 {
  def rolling_hash64(c: Column): Column =
    ColumnShim.column(RollingHash64(ColumnShim.expression(c)))
}
