package graft.crypto

import java.nio.charset.StandardCharsets
import java.security.{MessageDigest, SecureRandom}
import java.util.Base64
import javax.crypto.Cipher
import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}

/** Driver-side AES-GCM primitive used for key wrapping and manifest
  * encryption. Layout matches the data-path ciphertexts produced by
  * Spark's `aes_encrypt(..., 'GCM')`: `[12B IV][ciphertext][16B tag]`
  * (the same layout the reference writer emits, see
  * /root/reference/src/parquet_writer.cpp:137-170).
  *
  * This runs only on the driver and only over key/metadata material —
  * O(columns) work, never O(rows) — so it adds nothing to the
  * distributed data path at 100 TB.
  */
object AesGcm {
  private val IvLen = 12
  private val TagBits = 128
  private val rng = new SecureRandom()

  def encrypt(key: Array[Byte], plaintext: Array[Byte]): Array[Byte] = {
    val iv = new Array[Byte](IvLen)
    rng.nextBytes(iv)
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"), new GCMParameterSpec(TagBits, iv))
    val ct = c.doFinal(plaintext)
    iv ++ ct
  }

  def decrypt(key: Array[Byte], blob: Array[Byte]): Array[Byte] = {
    val iv = blob.take(IvLen)
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"), new GCMParameterSpec(TagBits, iv))
    c.doFinal(blob.drop(IvLen))
  }
}

/** Envelope-encryption KMS with AWS-KMS-style data keys (semantics of
  * /root/reference/src/kms.cpp:8-31, re-done with real AES-GCM key wrap
  * instead of the reference's demo XOR).
  *
  * `generateDataKey` returns a fresh random data-encryption key (DEK)
  * in plaintext plus the same key wrapped under a named master key; the
  * plaintext DEK encrypts data and is then discarded, while only the
  * wrapped blob is persisted (in the file manifest). `decryptDataKey`
  * unwraps it on the read path.
  */
object Kms {
  final case class DataKey(plaintext: Array[Byte], wrapped: Array[Byte], masterKeyId: String)

  private val rng = new SecureRandom()

  /** Master keys are derived deterministically from their id — stand-in
    * for an external vault lookup; swap this resolver for a real HSM/KMS
    * call in production. 32 bytes → AES-256 for wrapping.
    */
  def masterKey(masterKeyId: String): Array[Byte] =
    MessageDigest.getInstance("SHA-256")
      .digest(("graft-master:" + masterKeyId).getBytes(StandardCharsets.UTF_8))

  def generateDataKey(masterKeyId: String, numBytes: Int = 16): DataKey = {
    val dek = new Array[Byte](numBytes)
    rng.nextBytes(dek)
    DataKey(dek, AesGcm.encrypt(masterKey(masterKeyId), dek), masterKeyId)
  }

  def decryptDataKey(wrapped: Array[Byte], masterKeyId: String): Array[Byte] =
    AesGcm.decrypt(masterKey(masterKeyId), wrapped)

  def wrapToBase64(dk: DataKey): String = Base64.getEncoder.encodeToString(dk.wrapped)
  def unwrapFromBase64(b64: String, masterKeyId: String): Array[Byte] =
    decryptDataKey(Base64.getDecoder.decode(b64), masterKeyId)
}

/** How a single column's encryption key is sourced. */
final case class ColumnPolicy(
    column: String,
    /** explicit per-column key (UTF-8; must be 16/24/32 bytes) */
    explicitKey: Option[String] = None,
    /** generate a per-column DEK under this KMS master key */
    kmsMasterKeyId: Option[String] = None)

/** A key resolved through the fallback chain, tagged with how. */
final case class ResolvedKey(
    key: Array[Byte],
    /** "column-key" | "kms" | "fallback" | "plaintext" */
    mode: String,
    /** wrapped DEK (base64) + master id, persisted when mode == "kms" */
    wrappedDek: Option[String],
    masterKeyId: Option[String])

/** Encryption config for a write: which columns, which keys, and the
  * master key protecting the manifest.
  *
  * Key-resolution chain (reference /root/reference/src/parquet_writer.cpp:78-135):
  * explicit column key → KMS-generated data key → fallback key →
  * plaintext with warning. Invalid-length explicit keys fall through to
  * the next link rather than failing the write.
  */
final case class CryptoConfig(
    masterKeyId: String,
    columns: Seq[ColumnPolicy],
    fallbackKey: Option[String] = None) {

  private def validKeyBytes(k: String): Option[Array[Byte]] = {
    val b = k.getBytes(StandardCharsets.UTF_8)
    if (b.length == 16 || b.length == 24 || b.length == 32) Some(b) else None
  }

  def resolveKeyForWrite(p: ColumnPolicy): ResolvedKey =
    p.explicitKey.flatMap(validKeyBytes).map(ResolvedKey(_, "column-key", None, None))
      .orElse(p.kmsMasterKeyId.map { mid =>
        val dk = Kms.generateDataKey(mid)
        ResolvedKey(dk.plaintext, "kms", Some(Kms.wrapToBase64(dk)), Some(mid))
      })
      .orElse(fallbackKey.flatMap(validKeyBytes).map(ResolvedKey(_, "fallback", None, None)))
      .getOrElse(ResolvedKey(Array.empty, "plaintext", None, None))

  /** Re-resolve on the read path from persisted manifest metadata. */
  def resolveKeyForRead(col: String, mode: String, wrappedDek: Option[String],
      masterKeyId: Option[String]): Array[Byte] = mode match {
    case "column-key" =>
      columns.find(_.column == col).flatMap(_.explicitKey).flatMap(validKeyBytes)
        .getOrElse(throw new IllegalArgumentException(
          s"no valid explicit key supplied for column $col"))
    case "kms" =>
      Kms.unwrapFromBase64(
        wrappedDek.getOrElse(throw new IllegalStateException(s"missing wrapped DEK for $col")),
        masterKeyId.getOrElse(throw new IllegalStateException(s"missing master key id for $col")))
    case "fallback" =>
      fallbackKey.flatMap(validKeyBytes).getOrElse(
        throw new IllegalArgumentException(s"no valid fallback key for column $col"))
    case _ => Array.empty
  }
}
