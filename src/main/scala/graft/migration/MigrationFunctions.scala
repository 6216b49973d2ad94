package graft.migration

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar functions X1-X17 (SURVEY §2.7) as pure Column compositions —
  * codegen'd built-ins only, no UDFs. Each cites its reference behavior.
  */
object MigrationFunctions {

  /** X1 (APIHelper.php:166-176): split full name at the FIRST space;
    * first = head token, last = trimmed remainder, no space ⇒ last null. */
  def nameFirst(c: Column): Column =
    when(instr(c, " ") > 0, substring_index(c, " ", 1)).otherwise(c)
  def nameLast(c: Column): Column =
    when(instr(c, " ") > 0,
      ltrim(expr_substr_after_first_space(c))).otherwise(lit(null).cast("string"))
  private def expr_substr_after_first_space(c: Column): Column =
    substring(c, instr(c, " ") + 1, lit(Int.MaxValue))

  /** X2/X3 (APIHelper.php:180-189, CustomerProcessor.php:64-77): truncate
    * to n chars; pair with wasTruncated for the warning channel. */
  def truncated(c: Column, n: Int): Column = substring(c, 1, n)
  def wasTruncated(c: Column, n: Int): Column = length(c) > n

  /** X5 (CP:108, TP:414): email validity. The reference uses PHP
    * filter_var(FILTER_VALIDATE_EMAIL); this is the documented pragmatic
    * approximation (no spaces, one @, dotted domain). */
  val emailRegex = "^[^@\\s]+@[^@\\s]+\\.[^@\\s]+$"
  def isValidEmail(c: Column): Column = c.rlike(emailRegex)

  /** X4 (CP:92-133): split a multi-email field on space/semicolon/comma,
    * drop blanks (F3, CP:105-107); if ANY part is invalid fall back to the
    * whole original string as the single primary (all-or-nothing rule,
    * CP:108-117). Returns the email array (head = primary). */
  def splitEmails(c: Column): Column = {
    val parts = filter(transform(split(c, "[ ;,]"), trim(_)), p => length(p) > 0)
    val allValid = forall(parts, isValidEmail(_))
    when(allValid && size(parts) > 0, parts).otherwise(array(c))
  }
  def primaryEmail(c: Column): Column = element_at(splitEmails(c), 1)
  def otherEmails(c: Column): Column = {
    val emails = splitEmails(c)
    // length = full size is safe (slice clamps); Int.MaxValue would
    // overflow start+length under ANSI and return empty
    slice(emails, lit(2), size(emails))
  }

  /** X6/X8 (TP:210-223, 410-413): pull the email/id out of a Groove link
    * href — `customers/(.*)` vs `agents/(.*)`; empty extract = no match. */
  def hrefCustomerId(c: Column): Column = regexp_extract(c, "customers/(.*)$", 1)
  def hrefAgentId(c: Column): Column = regexp_extract(c, "agents/(.*)$", 1)
  /** Author kind tag from the href ('customer' | 'agent' | null=error). */
  def hrefAuthorType(c: Column): Column =
    when(hrefCustomerId(c) =!= "", "customer")
      .when(hrefAgentId(c) =!= "", "agent")
      .otherwise(lit(null).cast("string"))
  def hrefAuthorEmail(c: Column): Column =
    when(hrefCustomerId(c) =!= "", hrefCustomerId(c))
      .when(hrefAgentId(c) =!= "", hrefAgentId(c))
      .otherwise(lit(null).cast("string"))

  /** X7 (TP:271-277): attachment-list message id. */
  def hrefAttachmentMessageId(c: Column): Column =
    regexp_extract(c, "attachments\\?message=(.*)$", 1)

  /** X10 (APIHelper.php:198-218): Groove state → HelpScout status;
    * unknown ⇒ null, which the caller routes to the error channel
    * (TP:444-446). */
  def stateToStatus(c: Column): Column =
    when(c.isin("unread", "opened"), "active")
      .when(c === "pending", "pending")
      .when(c === "closed", "closed")
      .when(c === "spam", "spam")
      .otherwise(lit(null).cast("string"))

  /** X11 (TP:99-100,436-437): parse + ISO-8601 re-format; session TZ is
    * fixed UTC (build.sbt) — documented divergence from America/Toronto
    * (ST:38). */
  def toIso(c: Column): Column =
    date_format(to_timestamp(c), "yyyy-MM-dd'T'HH:mm:ssxxx")

  /** X9: case-insensitive equality — normalized at join time. */
  def ciEq(a: Column, b: Column): Column = lower(a) === lower(b)

  /** X13 (TP:296-298): MIME sniff by magic number over the payload blob.
    * finfo() replacement: a when-chain over the hex prefix. */
  def mimeSniff(bin: Column): Column = {
    val prefix = hex(substring(bin, 1, 4))
    when(prefix.startsWith("89504E47"), "image/png")
      .when(prefix.startsWith("FFD8FF"), "image/jpeg")
      .when(prefix.startsWith("47494638"), "image/gif")
      .when(prefix.startsWith("25504446"), "application/pdf")
      .when(prefix.startsWith("504B0304"), "application/zip")
      .otherwise("application/octet-stream")
  }

  /** X14 (TP:301-303): attachment size guard. */
  val AttachmentSizeCap = 10485760L
  def oversized(sizeCol: Column): Column = sizeCol > AttachmentSizeCap

  /** X16 (AH:224-233): flatten an error struct array to display lines. */
  def formatErrors(arr: Column): Column =
    concat_ws("; ", transform(arr, e =>
      format_string("[%s] %s", e.getField("property"), e.getField("message"))))
}
