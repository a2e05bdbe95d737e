package graft.operators

import graft.Pipeline.ModuleCfg
import graft.config.Json._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `crypto` transform (reference `module/transform/CryptoTransform
  * .java` — AES field encrypt/decrypt; KMS/RSA vendor paths are out of
  * local scope per SURVEY §7.5). Uses Spark's built-in
  * `aes_encrypt`/`aes_decrypt` expressions (codegen'd, GCM default).
  *
  * parameters:
  *   mode: encrypt | decrypt
  *   key: 16/24/32-byte secret (config-provided)
  *   fields: [names] — each replaced (encrypt → binary, decrypt →
  *     string) or suffixed via `suffix`
  */
object CryptoTransform {
  def build(spark: SparkSession, cfg: ModuleCfg,
      inputs: Map[String, DataFrame]): Map[String, DataFrame] = {
    // deliberately NOT widened (r21 A/B): AES-CTR over short fields
    // is cheaper than the exchange widening adds (q27 0.30→0.55 s)
    var df = TransformCommon.single(cfg, inputs)
    val p = cfg.params
    val mode = p.str("mode").getOrElse("encrypt")
    val key = p.str("key").getOrElse(
      throw new IllegalArgumentException("crypto requires key"))
    // aes_encrypt consumes the key's UTF-8 BYTES — validating
    // key.length (UTF-16 chars) would pass a multibyte key here and
    // fail every row at execution
    val keyBytes =
      key.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
    require(Set(16, 24, 32).contains(keyBytes),
      s"AES key must be 16/24/32 UTF-8 bytes, got $keyBytes")
    val suffix = p.str("suffix").getOrElse("")
    val algo = p.str("algorithm").getOrElse("GCM")
    p.strArr("fields").foreach { f =>
      val out = if (suffix.isEmpty) f else s"$f$suffix"
      val c = mode match {
        case "encrypt" =>
          aes_encrypt(col(f).cast(StringType).cast(BinaryType),
            lit(key), lit(algo))
        case "decrypt" =>
          aes_decrypt(col(f), lit(key), lit(algo)).cast(StringType)
        case other =>
          throw new IllegalArgumentException(s"crypto mode: $other")
      }
      df = df.withColumn(out, c)
    }
    TransformCommon.finishRouted(df, cfg)
  }
}
