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

  /** Multi-class free-text PII scrub — the redaction pass a training-data
    * pipeline runs over raw documents before anything else sees them.
    * Patterns are deliberately RE2-safe (character classes + bounded
    * quantifiers, no backreferences/lookaround) so the same literal
    * pattern means the same thing in Java regex (Spark) and RE2 (DuckDB
    * oracle) — cross-engine redaction equality is hash-checked by
    * q_pii_scrub. Pure codegen'd projection: zero shuffle at any corpus
    * size; the scan is the cost.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\b[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Redact all three PII classes, each to its own tag. Email first: an
    * email can embed digit runs, but neither phone (hyphens) nor IPv4
    * (dots between digit groups) patterns can match inside the remaining
    * classes, so the chain order is otherwise free.
    */
  def scrubText(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "[EMAIL]"),
        PhonePattern, "[PHONE]"),
      Ipv4Pattern, "[IP]")

  /** Per-class match counts (audit columns emitted next to the scrub).
    * Each class is counted on the text AS THE SCRUB CHAIN SEES IT
    * (phones on email-scrubbed text, IPs after phones too), so the
    * counts always equal the number of tags scrubText emits — a digit
    * run inside an email never double-counts as a phone/IP.
    */
  def piiCounts(text: Column): Seq[Column] = {
    val afterEmail = regexp_replace(text, EmailPattern, "[EMAIL]")
    val afterPhone = regexp_replace(afterEmail, PhonePattern, "[PHONE]")
    Seq(
      regexp_count(text, lit(EmailPattern)).as("n_emails"),
      regexp_count(afterEmail, lit(PhonePattern)).as("n_phones"),
      regexp_count(afterPhone, lit(Ipv4Pattern)).as("n_ips"))
  }

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
