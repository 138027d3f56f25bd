package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's Confidential/Silver PII branch
  * (`generar_correo_electronico` `/root/reference/main.py:478-514`,
  * `enmascarar_emails` `/root/reference/main.py:517-551`).
  *
  * The reference generates synthetic emails with a row-wise Faker loop —
  * nondeterministic and O(rows) Python. Here the surrogate is a pure,
  * deterministic, codegen-friendly expression (seeded hash of the source
  * column), which (a) makes the Confidential/Silver branch reproducible
  * without caching and (b) vectorizes: no UDF, no per-row interpreter.
  */
object Pii {

  /** F16: deterministic email surrogate — local part is a salted SHA-256
    * prefix of the source column, domain derived by lowercasing (F13) and
    * concatenating (F14), matching `f'{local}@{dominio}'`.
    */
  def surrogateEmail(src: Column, salt: String = "graft",
                     domain: String = "example.com"): Column =
    concat(substring(sha2(concat(src.cast("string"), lit(salt)), 256), 1, 12),
      lit("@"), lower(lit(domain)))

  /** F15: domain after the '@' (`email.split('@')[1]`). */
  def emailDomain(email: Column): Column = substring_index(email, "@", -1)

  /** F17: mask the local part (`f'*****@{dominio}'`) — pure regexp, no UDF.
    * Idempotent: masking a masked email is a no-op (PiiSpec property).
    */
  def maskEmail(email: Column): Column =
    regexp_replace(email, "^[^@]+", "*****")

  /** The full Confidential/Silver split (`/root/reference/main.py:613-623`):
    * one frame gains a surrogate email; the masked variant drops the raw
    * email column (P5). Returns (confidential, silver). Both branch from
    * the same plan — caller should `.cache()` upstream if the source is
    * expensive (the reference's `copy()` at `main.py:615`).
    */
  def confidentialSplit(df: DataFrame, srcCol: String): (DataFrame, DataFrame) = {
    val withEmail = df.withColumn("email", surrogateEmail(col(srcCol)))
    val masked = withEmail
      .withColumn("email_enmascarados", maskEmail(col("email")))
      .drop("email")
    (withEmail, masked)
  }
}
