package graft.queries

import org.apache.spark.sql.functions._
import graft.migration._
import graft.migration.MigrationFunctions._

/** The migration-domain pipeline (the reference's actual semantics) run on
  * deterministic in-memory fixtures (Fixtures.scala = FIXTURES.md §A).
  * Oracles are self-contained DuckDB SQL over VALUES clauses generated from
  * the same fixture objects — X1/X4/X10 and the join/fallback logic are
  * re-implemented in SQL, so both engines compute the semantics
  * independently. The full-pipeline query (q64) carries a hand-derived
  * golden table as its oracle.
  */
object MigrationQueries extends QueryPack {

  private def sqlStr(s: String): String = "'" + s.replace("'", "''") + "'"
  private def sqlOpt(o: Option[String]): String = o.map(sqlStr).getOrElse("NULL")

  private val customerValues: String = Fixtures.customers.map { c =>
    s"(${sqlStr(c.email)}, ${sqlStr(c.name)}, ${sqlOpt(c.about)}, ${sqlOpt(c.title)}, ${sqlOpt(c.company_name)})"
  }.mkString(", ")

  // ::BIGINT on ids — DuckDB VALUES integer literals default to INT32 but
  // the Spark side carries LongType (dtype parity for the hash compare)
  private val ticketValues: String = Fixtures.tickets.map { t =>
    s"(${t.number}::BIGINT, ${sqlStr(t.state)}, ${sqlStr(t.title)}, ${sqlStr(t.mailbox)}, ${sqlStr(t.customer_href)})"
  }.mkString(", ")

  private val mailboxValues: String = Fixtures.hsMailboxes.map { m =>
    s"(${m.id}::BIGINT, ${sqlStr(m.name)}, ${sqlStr(m.email)})"
  }.mkString(", ")

  /** P1+X1+X2+X4: the customer projection, flattened for oracle compare.
    * The oracle re-implements first-space split, 40/60 truncation, and the
    * all-or-nothing email split in DuckDB list lambdas. */
  private val q60 = Q(
    "q60_customer_projection",
    (s, _) => CustomerTransform.toHelpScout(Fixtures.customersDf(s))
      .select(col("groove_email"), col("first_name"), col("last_name"),
        col("first_name_truncated"), col("organization_truncated"),
        col("organization"), col("job_title"),
        col("primary_email"),
        array_join(col("other_emails"), ";").as("other_emails_joined"),
        col("error_type"))
      .orderBy(col("groove_email")),
    Some(s"""WITH src(email, name, about, title, company) AS (VALUES $customerValues),
      e AS (SELECT *,
        list_filter(list_transform(string_split_regex(email, '[ ;,]'), x -> trim(x)),
          x -> len(x) > 0) AS parts FROM src),
      e2 AS (SELECT *,
        CASE WHEN len(parts) > 0 AND len(list_filter(parts,
            p -> NOT regexp_matches(p, '^[^@\\s]+@[^@\\s]+\\.[^@\\s]+$$'))) = 0
          THEN parts ELSE [email] END AS emails FROM e),
      n AS (SELECT *,
        CASE WHEN position(' ' IN name) > 0
          THEN substr(name, 1, position(' ' IN name) - 1) ELSE name END AS fn_raw,
        CASE WHEN position(' ' IN name) > 0
          THEN ltrim(substr(name, position(' ' IN name) + 1)) ELSE NULL END AS ln_raw
        FROM e2)
      SELECT email AS groove_email,
        substr(fn_raw, 1, 40) AS first_name,
        substr(ln_raw, 1, 40) AS last_name,
        coalesce(length(fn_raw) > 40, false) AS first_name_truncated,
        coalesce(length(company) > 60, false) AS organization_truncated,
        substr(company, 1, 60) AS organization,
        substr(title, 1, 60) AS job_title,
        CASE WHEN email IS NOT NULL AND length(trim(email)) > 0 THEN emails[1] END AS primary_email,
        CASE WHEN email IS NOT NULL AND length(trim(email)) > 0
          THEN coalesce(array_to_string(emails[2:], ';'), '') ELSE '' END AS other_emails_joined,
        CASE WHEN email IS NULL OR length(trim(email)) = 0 THEN 'missing_email' END AS error_type
      FROM n ORDER BY groove_email"""))

  /** X10 state→status over the fixture tickets incl. the unknown-state
    * error row (AH:198-218, TP:444-446). */
  private val q61 = Q(
    "q61_state_mapping",
    (s, _) => Fixtures.ticketsDf(s)
      .select(col("number"), col("state"),
        stateToStatus(col("state")).as("status"),
        when(stateToStatus(col("state")).isNull, "unknown_state").as("error_type"))
      .orderBy(col("number")),
    Some(s"""WITH t(number, state, title, mailbox, href) AS (VALUES $ticketValues)
      SELECT number, state,
        CASE WHEN state IN ('unread','opened') THEN 'active'
          WHEN state = 'pending' THEN 'pending'
          WHEN state = 'closed' THEN 'closed'
          WHEN state = 'spam' THEN 'spam' END AS status,
        CASE WHEN state NOT IN ('unread','opened','pending','closed','spam')
          THEN 'unknown_state' END AS error_type
      FROM t ORDER BY number"""))

  /** J1+J2: ci mailbox lookup with default-mailbox fallback. */
  private val q62 = Q(
    "q62_mailbox_fallback",
    (s, _) => {
      val mb = Fixtures.hsMailboxesDf(s)
        .select(col("id").as("mailbox_id"), lower(col("name")).as("mb_name"))
      val defaultMb = Fixtures.hsMailboxesDf(s)
        .filter(lower(col("email")) === Fixtures.defaultMailboxEmail.toLowerCase)
        .select(col("id").as("default_mailbox_id")).limit(1)
      Fixtures.ticketsDf(s)
        .join(broadcast(mb), lower(col("mailbox")) === col("mb_name"), "left")
        .crossJoin(broadcast(defaultMb))
        .select(col("number"), col("mailbox"),
          coalesce(col("mailbox_id"), col("default_mailbox_id")).as("resolved_mailbox_id"),
          col("mailbox_id").isNull.as("used_fallback"))
        .orderBy(col("number"))
    },
    Some(s"""WITH t(number, state, title, mailbox, href) AS (VALUES $ticketValues),
      mb(id, name, email) AS (VALUES $mailboxValues),
      d AS (SELECT id AS default_id FROM mb
        WHERE lower(email) = '${Fixtures.defaultMailboxEmail.toLowerCase}' LIMIT 1)
      SELECT t.number, t.mailbox,
        coalesce(mb.id, d.default_id) AS resolved_mailbox_id,
        (mb.id IS NULL) AS used_fallback
      FROM t LEFT JOIN mb ON lower(t.mailbox) = lower(mb.name) CROSS JOIN d
      ORDER BY t.number"""))

  /** J7/J8 validation gates as anti-joins (ST:84-108). */
  private val q63 = Q(
    "q63_validation_gates",
    (s, _) => {
      Validation.gate(
        Fixtures.grooveMailboxesDf(s), Fixtures.hsMailboxesDf(s),
        Fixtures.grooveAgentsDf(s), Fixtures.hsUsersDf(s)) match {
        case Left(bad) => bad.orderBy(col("error_type"), col("detail"))
        case Right(()) =>
          s.createDataFrame(Seq.empty[(String, String)]).toDF("error_type", "detail")
      }
    },
    Some(s"""WITH gm(name) AS (VALUES ${Fixtures.grooveMailboxes.map(sqlStr).map(v => s"($v)").mkString(", ")}),
      ga(email) AS (VALUES ${Fixtures.grooveAgents.map(sqlStr).map(v => s"($v)").mkString(", ")}),
      mb(id, name, email) AS (VALUES $mailboxValues),
      u(email) AS (VALUES ${Fixtures.hsUsers.map(x => s"(${sqlStr(x.email)})").mkString(", ")})
      SELECT 'unmatched_mailbox' AS error_type, gm.name AS detail FROM gm
        WHERE NOT EXISTS (SELECT 1 FROM mb WHERE lower(mb.name) = lower(gm.name))
      UNION ALL
      SELECT 'unmatched_agent', ga.email FROM ga
        WHERE NOT EXISTS (SELECT 1 FROM u WHERE lower(u.email) = lower(ga.email))
      ORDER BY error_type, detail"""))

  /** The full ticket pipeline (stages A-D incl. dedup, two-phase
    * attachments, failed notes, person resolution), flattened; the oracle
    * is the hand-derived golden table — an independent statement of the
    * reference's semantics for these fixtures. */
  private val q64 = Q(
    "q64_conversations",
    (s, _) => {
      val threads = TicketTransform.threadsByTicket(
        Fixtures.messagesDf(s), Fixtures.attachmentsDf(s),
        Fixtures.hsUsersDf(s), Fixtures.hsCustomersDf(s))
      TicketTransform.conversations(
        Fixtures.ticketsDf(s), threads,
        Fixtures.hsMailboxesDf(s), Fixtures.hsCustomersDf(s),
        Fixtures.defaultMailboxEmail,
        Some(Fixtures.existingConversationsDf(s)))
        .select(col("groove_ticket_number"), col("subject"),
          col("mailbox_id"), col("customer_email"), col("customer_id"),
          col("created_at_iso"), col("status"),
          col("n_threads").cast("long").as("n_threads"),
          col("n_thread_errors"), col("error_type"))
        .orderBy(col("groove_ticket_number"))
    },
    Some("""SELECT * FROM (VALUES
      (1001::BIGINT, 'Printer on fire', 11::BIGINT, 'alice@example.com', 31::BIGINT,
        '2016-02-01T10:00:00+00:00', 'active', 3::BIGINT, 0::BIGINT, NULL),
      (1002::BIGINT, 'Login broken', 11::BIGINT, 'bob@x.com', 32::BIGINT,
        '2016-02-02T11:30:00+00:00', 'closed', 2::BIGINT, 1::BIGINT, NULL),
      (1003::BIGINT, 'Feature request', 12::BIGINT, 'cher@music.com', NULL::BIGINT,
        '2016-02-03T09:15:00+00:00', 'pending', 1::BIGINT, 0::BIGINT, NULL),
      (1004::BIGINT, 'Mystery ticket', 11::BIGINT, 'alice@example.com', 31::BIGINT,
        '2016-02-04T08:00:00+00:00', NULL, 0::BIGINT, 0::BIGINT, 'unknown_state'),
      (1005::BIGINT, 'Lost package', 13::BIGINT, 'alice@example.com', 31::BIGINT,
        '2016-02-05T16:45:00+00:00', 'active', 0::BIGINT, 0::BIGINT, NULL),
      (1006::BIGINT, 'Weird link', 11::BIGINT, '0xdeadbeef', NULL::BIGINT,
        '2016-02-06T12:00:00+00:00', 'active', 0::BIGINT, 0::BIGINT, 'bad_customer_link'))
      AS t(groove_ticket_number, subject, mailbox_id, customer_email, customer_id,
           created_at_iso, status, n_threads, n_thread_errors, error_type)
      ORDER BY groove_ticket_number"""))

  /** X13 MIME sniffing over the attachment payload blobs (binary column)
    * plus the upload-stage hash and oversize guard (X14/K3). Oracle: a
    * hand-derived golden, the q64 device — every value is independently
    * computable from the fixture spec (Fixtures.scala:100-116): mime from
    * the documented magic numbers, hash = md5 of the spelled-out payload
    * bytes (verified against a standalone md5 outside either engine),
    * oversize = declared size > the 10 MB guard, and broken.bin's null row
    * is the payload-less fetch-failure path. */
  private val q65 = Q(
    "q65_attachment_upload",
    (s, _) => {
      val (ok, failed) = TicketTransform.uploadAttachments(Fixtures.attachmentsDf(s))
      // oversize rides as a string: the driver compare reprs a null BOOLEAN
      // differently per engine (None vs NaN), strings null identically
      ok.select(col("message_id"), col("filename"), col("mime_type"),
          col("hash"), col("oversize").cast("string").as("oversize"))
        .unionByName(failed.select(col("message_id"), col("filename"),
          lit(null).cast("string").as("mime_type"),
          lit(null).cast("string").as("hash"), lit(null).cast("string").as("oversize")))
        .orderBy(col("message_id"), col("filename"))
    },
    Some("""SELECT * FROM (VALUES
      ('m1', 'burning.png', 'image/png',
        '8abb360ba01c0917895c0fd99a1215df', 'false'),
      ('m1', 'manual.pdf', 'application/pdf',
        '307ddb5f41f66df59f1e28b325a31c3e', 'false'),
      ('m4', 'broken.bin', NULL, NULL, NULL),
      ('m4', 'huge.zip', 'application/zip',
        'e21793897de69b3982022c5f38b1fb43', 'true'))
      AS t(message_id, filename, mime_type, hash, oversize)
      ORDER BY message_id, filename"""))

  override val all: Seq[Q] = Seq(q60, q61, q62, q63, q64, q65)
}
