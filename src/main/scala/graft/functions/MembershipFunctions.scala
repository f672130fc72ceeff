package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/** Exact long-hash-set membership for benchmark decontamination.
  *
  * Why not Spark's own bloom pair (`BloomFilterAggregate` /
  * `BloomFilterMightContain`, the runtime-row-filter machinery)? Its
  * double-hashing scheme has a MEASURED false-positive floor: sized for a
  * 1e-9 target (43 bits/item) it still returns ~6.4e-6 (320 FPs in 5e7
  * random probes), so on a ~4e4-probe demo corpus it over-dropped one clean
  * document per run — and no bit budget fixes a floor. At 64 bits/gram a
  * SORTED xxhash64 ARRAY is the same size as that bloom and exact:
  * membership misfires only on a 64-bit hash collision (~1e-11 even at
  * 10⁶ benchmark × 10¹⁰ corpus grams), so the membership formulation stays
  * result-identical to the exact gram join — which is what the d10 oracle
  * asserts. Probe cost is a log₂(n) binary search per gram, inside
  * whole-stage codegen.
  */
object MembershipFunctions {

  /** Serialize a distinct sorted long set to LITTLE_ENDIAN bytes. */
  def encodeLongSet(hashes: Array[Long]): Array[Byte] = {
    val sorted = hashes.clone()
    java.util.Arrays.sort(sorted)
    val bb = ByteBuffer.allocate(sorted.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    sorted.foreach(bb.putLong)
    bb.array()
  }

  private[functions] def decodeLongSet(bytes: Array[Byte]): Array[Long] = {
    require(bytes.length % 8 == 0, s"long-set bytes not a multiple of 8: ${bytes.length}")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  /** Predicate column: BIGINT `h` is in the serialized sorted set. */
  def long_set_contains(set: Array[Byte], h: Column): Column =
    ColumnShim.column(LongSetContains(ColumnShim.expression(h), set))
}

/** long_set_contains(h) against a plan-constant sorted long set. */
case class LongSetContains(child: Expression, setBytes: Array[Byte])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "long_set_contains"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"long_set_contains expects BIGINT, got ${other.catalogString}")
  }

  /** Decoded once per expression instance (per task in codegen, via the
    * reference object) — probes only pay the binary search.
    */
  @transient private lazy val set: Array[Long] =
    MembershipFunctions.decodeLongSet(setBytes)

  override def nullSafeEval(h: Any): Any =
    java.util.Arrays.binarySearch(set, h.asInstanceOf[Long]) >= 0

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.addReferenceObj("longSet", set, "long[]")
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = java.util.Arrays.binarySearch($arr, $h) >= 0;")
  }

  override protected def withNewChildInternal(newChild: Expression): LongSetContains =
    copy(child = newChild)
}
