package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core._

/** Catalyst expressions for the protection operators (SURVEY.md §2.3 P1-P3).
  *
  * All four participate in whole-stage codegen: `doGenCode` emits a direct
  * call on a [[graft.core.CellCryptor]] instance injected via
  * `addReferenceObj`, so the per-row loop stays inside generated code — the
  * Spark analog of the reference's tight per-element encrypt loop
  * (`basic_xor_encryptor.cpp:103-165`).
  *
  * Null semantics: `nullIntolerant` — null in, null out. The reference
  * encrypts only *present* values (nulls ride the definition levels,
  * SURVEY.md §1.3); in Spark, null handling is native.
  */
case class EncryptValue(
    child: Expression,
    keyId: String,
    codecName: String,
    columnName: String,
    perValue: Boolean) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override lazy val deterministic: Boolean =
    CryptoCodec.isDeterministic(codecName) && child.deterministic
  override def prettyName: String = "graft_encrypt"

  @transient private lazy val cryptor =
    CellCryptor(child.dataType, ProtectionContext(keyId, columnName), codecName,
      // BOOLEAN falls back to per-block like the reference's bit-packed path
      // (encryption_sequencer_test: BooleanTypeUsesPerBlockEncryption).
      perValue && child.dataType != BooleanType)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (ValueSerde.supports(child.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_encrypt does not support ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any = cryptor.encryptCell(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cryptor", cryptor, classOf[CellCryptor].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encryptCell($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): EncryptValue =
    copy(child = newChild)
}

case class DecryptValue(
    child: Expression,
    keyId: String,
    codecName: String,
    columnName: String,
    targetType: DataType,
    perValue: Boolean) extends UnaryExpression {

  override def dataType: DataType = targetType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_decrypt"

  @transient private lazy val cryptor =
    CellCryptor(targetType, ProtectionContext(keyId, columnName), codecName,
      perValue && targetType != BooleanType)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_decrypt expects BINARY ciphertext, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    cryptor.decryptCell(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cryptor", cryptor, classOf[CellCryptor].getName)
    val boxed = CodeGenerator.boxedType(dataType)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ($boxed) $ref.decryptCell($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): DecryptValue =
    copy(child = newChild)
}

/** Raw block encryption — reference `EncryptBlock` parity (frameless,
  * `basic_xor_encryptor.cpp:56-63`).
  */
case class EncryptBlock(
    child: Expression,
    keyId: String,
    codecName: String,
    columnName: String) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override lazy val deterministic: Boolean =
    CryptoCodec.isDeterministic(codecName) && child.deterministic
  override def prettyName: String = "graft_encrypt_block"

  @transient private lazy val cryptor =
    CellCryptor(BinaryType, ProtectionContext(keyId, columnName), codecName, perValue = false)

  override def nullSafeEval(v: Any): Any =
    cryptor.encryptBlock(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cryptor", cryptor, classOf[CellCryptor].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encryptBlock($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): EncryptBlock =
    copy(child = newChild)
}

case class DecryptBlock(
    child: Expression,
    keyId: String,
    codecName: String,
    columnName: String) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_decrypt_block"

  @transient private lazy val cryptor =
    CellCryptor(BinaryType, ProtectionContext(keyId, columnName), codecName, perValue = false)

  override def nullSafeEval(v: Any): Any =
    cryptor.decryptBlock(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cryptor", cryptor, classOf[CellCryptor].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.decryptBlock($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): DecryptBlock =
    copy(child = newChild)
}

/** Column-level API + SQL registration. */
object protect {
  private def col2e(c: Column): Expression = ColumnShim.expression(c)
  private def e2col(e: Expression): Column = ColumnShim.column(e)

  def encrypt_value(c: Column, keyId: String, codec: String = CryptoCodec.Xor,
      columnName: String = "", perValue: Boolean = true): Column =
    e2col(EncryptValue(col2e(c), keyId, codec, columnName, perValue))

  def decrypt_value(c: Column, keyId: String, targetType: DataType,
      codec: String = CryptoCodec.Xor, columnName: String = "",
      perValue: Boolean = true): Column =
    e2col(DecryptValue(col2e(c), keyId, codec, columnName, targetType, perValue))

  def encrypt_block(c: Column, keyId: String, codec: String = CryptoCodec.Xor,
      columnName: String = ""): Column =
    e2col(EncryptBlock(col2e(c), keyId, codec, columnName))

  def decrypt_block(c: Column, keyId: String, codec: String = CryptoCodec.Xor,
      columnName: String = ""): Column =
    e2col(DecryptBlock(col2e(c), keyId, codec, columnName))

  private def litStr(e: Expression, what: String): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case other => throw new GraftInvalidInputException(
      s"$what must be a string literal, got $other")
  }

  /** Register `graft_encrypt(col, keyId[, codec[, colName]])` etc. for SQL. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_encrypt", { args =>
      val codec = if (args.size > 2) litStr(args(2), "codec") else CryptoCodec.Xor
      val cn = if (args.size > 3) litStr(args(3), "columnName") else ""
      EncryptValue(args.head, litStr(args(1), "keyId"), codec, cn, perValue = true)
    }, "scala_udf")
    reg.createOrReplaceTempFunction("graft_decrypt_string", { args =>
      val codec = if (args.size > 2) litStr(args(2), "codec") else CryptoCodec.Xor
      val cn = if (args.size > 3) litStr(args(3), "columnName") else ""
      DecryptValue(args.head, litStr(args(1), "keyId"), codec, cn, StringType,
        perValue = true)
    }, "scala_udf")
    reg.createOrReplaceTempFunction("graft_encrypt_block", { args =>
      val codec = if (args.size > 2) litStr(args(2), "codec") else CryptoCodec.Xor
      val cn = if (args.size > 3) litStr(args(3), "columnName") else ""
      EncryptBlock(args.head, litStr(args(1), "keyId"), codec, cn)
    }, "scala_udf")
    reg.createOrReplaceTempFunction("graft_decrypt_block", { args =>
      val codec = if (args.size > 2) litStr(args(2), "codec") else CryptoCodec.Xor
      val cn = if (args.size > 3) litStr(args(3), "columnName") else ""
      DecryptBlock(args.head, litStr(args(1), "keyId"), codec, cn)
    }, "scala_udf")
  }
}
