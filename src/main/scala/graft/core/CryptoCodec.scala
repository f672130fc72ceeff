package graft.core

import java.security.MessageDigest
import javax.crypto.Cipher
import javax.crypto.Mac
import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}

/** Per-column encryption context — the analog of the reference's encryptor
  * constructor context (`/root/reference/src/processing/encryptors/dbps_encryptor.h:54-64`):
  * key_id, column_name, user_id, application_context.
  */
final case class ProtectionContext(
    keyId: String,
    columnName: String,
    userId: String = "",
    appContext: String = "") {
  /** Stable seed material mixing the full context. */
  def seedString: String = Seq(keyId, columnName, userId, appContext).mkString(":")
}

/** The engine's pluggable cipher — analog of the reference `DBPSEncryptor`
  * interface (`dbps_encryptor.h:42-118`). Block-level only; per-value framing
  * lives in [[WireFormat]] so every codec gets it for free.
  */
trait CryptoCodec extends Serializable {
  def name: String
  /** Deterministic codecs keep equality: c(x)==c(y) iff x==y. Catalyst may
    * then fold/reuse these expressions and ciphertext equality joins work.
    */
  def deterministic: Boolean
  def encrypt(data: Array[Byte]): Array[Byte]
  def decrypt(data: Array[Byte]): Array[Byte]
}

/** XOR-parity codec reproducing the reference `BasicXorEncryptor` keystream
  * (`basic_xor_encryptor.cpp:32-72`): dst[i] = src[i] ^ (h & 0xFF);
  * h = (h<<1)|(h>>>31); keystream restarts per call. Symmetric.
  * NOT secure — exists for wire-format parity + canonical-ciphertext tests,
  * exactly like the reference's "basic" encryptor is a stand-in.
  */
final case class XorCodec(ctx: ProtectionContext) extends CryptoCodec {
  private val seed: Long = StableHash.fnv1a64(ctx.seedString)
  override def name: String = CryptoCodec.Xor
  override def deterministic: Boolean = true
  override def encrypt(data: Array[Byte]): Array[Byte] = StableHash.xorKeystream(seed, data)
  override def decrypt(data: Array[Byte]): Array[Byte] = StableHash.xorKeystream(seed, data)
}

/** Real cipher: AES-256-GCM via `javax.crypto`.
  *
  * Layout: [12-byte IV][GCM ciphertext + 16-byte tag].
  *
  * Two IV modes:
  *  - deterministic=true  → SIV-style IV = first 12 bytes of
  *    HMAC-SHA256(ivKey, plaintext). Same plaintext ⇒ same ciphertext, so
  *    ciphertext-equality joins/groupBys still work (leaks equality — the
  *    policy opts in, per SURVEY.md §7.4).
  *  - deterministic=false → fresh random IV per call; semantically secure,
  *    expressions carrying it must be marked non-deterministic for Catalyst.
  *
  * Keys are derived from the protection context via SHA-256 — a stand-in KMS,
  * mirroring how the reference derives everything from `key_id`
  * (`basic_xor_encryptor.h`; no KMS exists in the reference either).
  */
final case class AesGcmCodec(ctx: ProtectionContext, override val deterministic: Boolean)
    extends CryptoCodec {
  import AesGcmCodec._

  @transient private lazy val keyBytes: Array[Byte] =
    sha256(("graft-aes-key:" + ctx.seedString).getBytes("UTF-8"))
  @transient private lazy val ivKeyBytes: Array[Byte] =
    sha256(("graft-aes-iv:" + ctx.seedString).getBytes("UTF-8"))
  @transient private lazy val random = new java.security.SecureRandom()

  override def name: String =
    if (deterministic) CryptoCodec.AesDet else CryptoCodec.AesRnd

  private def deriveIv(plaintext: Array[Byte]): Array[Byte] =
    if (deterministic) {
      val mac = Mac.getInstance("HmacSHA256")
      mac.init(new SecretKeySpec(ivKeyBytes, "HmacSHA256"))
      java.util.Arrays.copyOf(mac.doFinal(plaintext), IvLen)
    } else {
      val iv = new Array[Byte](IvLen)
      random.nextBytes(iv)
      iv
    }

  override def encrypt(data: Array[Byte]): Array[Byte] = {
    val iv = deriveIv(data)
    val cipher = Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(keyBytes, "AES"),
      new GCMParameterSpec(TagBits, iv))
    val ct = cipher.doFinal(data)
    val out = new Array[Byte](IvLen + ct.length)
    System.arraycopy(iv, 0, out, 0, IvLen)
    System.arraycopy(ct, 0, out, IvLen, ct.length)
    out
  }

  override def decrypt(data: Array[Byte]): Array[Byte] = {
    if (data.length < IvLen + TagBits / 8)
      throw new GraftInvalidInputException(
        s"AES-GCM payload too short: ${data.length} bytes")
    val cipher = Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(Cipher.DECRYPT_MODE, new SecretKeySpec(keyBytes, "AES"),
      new GCMParameterSpec(TagBits, java.util.Arrays.copyOfRange(data, 0, IvLen)))
    try cipher.doFinal(data, IvLen, data.length - IvLen)
    catch {
      case e: javax.crypto.AEADBadTagException =>
        throw new GraftInvalidInputException("AES-GCM authentication failed: " + e.getMessage)
    }
  }
}

object AesGcmCodec {
  final val IvLen = 12
  final val TagBits = 128
  private def sha256(b: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(b)
}

/** Clean failure type for malformed/tampered inputs — analog of the
  * reference's `InvalidInputException` discipline
  * (`/root/reference/src/common/exceptions.h:47-50`).
  */
class GraftInvalidInputException(msg: String) extends IllegalArgumentException(msg)

object CryptoCodec {
  final val Xor = "xor"
  final val AesDet = "aes_det"
  final val AesRnd = "aes_rnd"

  def apply(name: String, ctx: ProtectionContext): CryptoCodec = name match {
    case Xor    => XorCodec(ctx)
    case AesDet => AesGcmCodec(ctx, deterministic = true)
    case AesRnd => AesGcmCodec(ctx, deterministic = false)
    case other  => throw new GraftInvalidInputException(s"unknown codec '$other'")
  }

  def isDeterministic(name: String): Boolean = name != AesRnd
}
