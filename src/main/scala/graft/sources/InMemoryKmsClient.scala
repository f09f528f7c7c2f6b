package graft.sources

import java.util.Base64
import javax.crypto.Cipher
import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}
import org.apache.hadoop.conf.Configuration
import org.apache.parquet.crypto.KeyAccessDeniedException
import org.apache.parquet.crypto.keytools.KmsClient

/** KMS client for Parquet Modular Encryption backed by master keys carried
  * in the Hadoop configuration (reference: `encrypted_parquet.slt` /
  * `parquet/src/encryption.rs` — the reference exercises PME with
  * directly-supplied AES keys; Spark's parquet writer goes through the
  * parquet-mr envelope-encryption toolkit, whose pluggable unit is this
  * `KmsClient`).
  *
  * Envelope wrap is real AES-256-GCM of the generated data-encryption keys
  * under the configured master keys — only the KEY DISTRIBUTION is
  * test-grade (keys ride in the job conf as `graft.encryption.key.list`
  * entries `name:base64`, where a production client would call a key
  * service). Instantiated by class name on executors, so encryption and
  * decryption both run distributed.
  */
class InMemoryKmsClient extends KmsClient {

  @volatile private var masterKeys: Map[String, SecretKeySpec] = Map.empty

  override def initialize(conf: Configuration, kmsInstanceID: String,
      kmsInstanceURL: String, accessToken: String): Unit = {
    val entries = Option(conf.getTrimmedStrings(InMemoryKmsClient.KeyListProperty))
      .getOrElse(Array.empty[String])
    masterKeys = entries.map { entry =>
      entry.split(":", 2) match {
        case Array(name, b64) =>
          name.trim -> new SecretKeySpec(Base64.getDecoder.decode(b64.trim), "AES")
        case _ =>
          throw new KeyAccessDeniedException(s"malformed key entry: $entry")
      }
    }.toMap
  }

  private def master(id: String): SecretKeySpec =
    masterKeys.getOrElse(id, throw new KeyAccessDeniedException(s"unknown master key: $id"))

  override def wrapKey(keyBytes: Array[Byte], masterKeyIdentifier: String): String = {
    val iv = new Array[Byte](12)
    new java.security.SecureRandom().nextBytes(iv)
    val cipher = Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(Cipher.ENCRYPT_MODE, master(masterKeyIdentifier), new GCMParameterSpec(128, iv))
    Base64.getEncoder.encodeToString(iv ++ cipher.doFinal(keyBytes))
  }

  override def unwrapKey(wrappedKey: String, masterKeyIdentifier: String): Array[Byte] = {
    val blob = Base64.getDecoder.decode(wrappedKey)
    val cipher = Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(Cipher.DECRYPT_MODE, master(masterKeyIdentifier),
      new GCMParameterSpec(128, blob, 0, 12))
    cipher.doFinal(blob, 12, blob.length - 12)
  }
}

object InMemoryKmsClient {
  val KeyListProperty = "graft.encryption.key.list"

  /** Two fixed 256-bit test master keys (footer + columns). */
  val FooterKeyB64: String = Base64.getEncoder.encodeToString(Array.tabulate(32)(i => i.toByte))
  val ColumnKeyB64: String = Base64.getEncoder.encodeToString(Array.tabulate(32)(i => (31 - i).toByte))

  /** The option set that routes a parquet read/write through PME with this
    * client; pass to `.options(...)` on both sides. */
  def cryptoOptions: Map[String, String] = Map(
    "parquet.crypto.factory.class" ->
      "org.apache.parquet.crypto.keytools.PropertiesDrivenCryptoFactory",
    "parquet.encryption.kms.client.class" -> classOf[InMemoryKmsClient].getName,
    KeyListProperty -> s"footer_key:$FooterKeyB64,col_key:$ColumnKeyB64")
}
