package graft.core

/** Stable 64-bit hashing + the reference keystream schedule.
  *
  * The reference seeds its XOR keystream with `std::hash<std::string>(key_id)`
  * (`/root/reference/src/processing/encryptors/basic_xor_encryptor.h`), which is
  * implementation-defined; per SURVEY.md §7.4 we define our own stable hash
  * (FNV-1a 64) so ciphertexts are reproducible across JVMs/platforms, and pin
  * canonical ciphertexts against THIS implementation, not the C++ one.
  */
object StableHash {
  private final val Fnv64Offset = 0xcbf29ce484222325L
  private final val Fnv64Prime = 0x100000001b3L

  /** FNV-1a 64 over raw bytes. */
  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = Fnv64Offset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= Fnv64Prime
      i += 1
    }
    h
  }

  def fnv1a64(s: String): Long = fnv1a64(s.getBytes("UTF-8"))

  /** One keystream step — faithful to the reference's quirky rotation
    * `key_hash = (key_hash << 1) | (key_hash >> 31)` applied to a 64-bit
    * `size_t` (`basic_xor_encryptor.cpp:44` — note `>> 31`, not `>> 63`).
    */
  @inline def keystreamNext(h: Long): Long = (h << 1) | (h >>> 31)

  /** XOR `data` with the rotating keystream seeded at `seed`; the keystream
    * restarts at `seed` for every call, exactly like `XorEncryptInto`
    * re-reading `key_id_hash_` per invocation (`basic_xor_encryptor.cpp:32-46`)
    * — this is what makes per-element encryption deterministic and
    * equality-preserving.
    */
  def xorKeystream(seed: Long, data: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](data.length)
    xorKeystreamCopy(seed, data, 0, out, 0, data.length)
    out
  }

  /** General fused kernel — one loop owns the keystream schedule; the
    * offset-carrying encrypt/decrypt variants below are thin wrappers, so a
    * schedule fix can never desynchronize them. Analog of the reference's
    * `XorEncryptInto` writable-span optimization (`basic_xor_encryptor.cpp:30-46`).
    */
  def xorKeystreamCopy(seed: Long, src: Array[Byte], srcOff: Int,
      dst: Array[Byte], dstOff: Int, len: Int): Unit = {
    var h = seed
    var i = 0
    while (i < len) {
      dst(dstOff + i) = (src(srcOff + i) ^ (h & 0xffL)).toByte
      h = keystreamNext(h)
      i += 1
    }
  }

  /** Write-side fusion: XOR `data` into `out` starting at `outOff`. */
  def xorKeystreamInto(seed: Long, data: Array[Byte], out: Array[Byte], outOff: Int): Unit =
    xorKeystreamCopy(seed, data, 0, out, outOff, data.length)

  /** Read-side fusion: XOR from `data(dataOff..)` into `out` (whole array). */
  def xorKeystreamFrom(seed: Long, data: Array[Byte], dataOff: Int, out: Array[Byte]): Unit =
    xorKeystreamCopy(seed, data, dataOff, out, 0, out.length)
}
