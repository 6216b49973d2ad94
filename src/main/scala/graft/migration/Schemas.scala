package graft.migration

/** Typed data model of the migration domain — the implicit schemas the
  * reference reads/writes (SURVEY §1.2, field evidence cited per class).
  * Input records are schema-on-read (explicit StructTypes at the JSON edge
  * replace PHP duck typing); the transform core is typed on these case
  * classes; outputs carry the Groove lineage key as a provenance column
  * (HybridConversation, Models/HybridConversation.php:14-53).
  */
object Schemas {

  /** Groove customer — fields read by CustomerProcessor.php:47-160. */
  case class GrooveCustomer(
      email: String,            // may hold multiple addrs sep by space/;/, (CP:93)
      name: String,             // split at first space (AH:166-176)
      about: Option[String],
      twitter_username: Option[String],
      linkedin_username: Option[String],
      title: Option[String],         // ≤60 after truncation (CP:72-77)
      company_name: Option[String],  // ≤60 (CP:64-68)
      phone_number: Option[String],
      location: Option[String],
      website_url: Option[String])

  /** Groove ticket — TicketProcessor.php:351-446. */
  case class GrooveTicket(
      number: Long,
      state: String,            // unread/opened/pending/closed/spam (AH:198-218)
      title: String,
      summary: Option[String],
      tags: Seq[String],
      created_at: String,       // ISO-8601
      mailbox: String,          // joined to HS mailbox by ci name (TP:382-388)
      customer_href: String,    // links.customer.href (TP:410-413)
      assignee_href: Option[String]) // links.assignee.href (TP:171-172)

  /** Groove message — TicketProcessor.php:60-199. */
  case class GrooveMessage(
      ticket_number: Long,
      body: String,
      created_at: String,
      note: Boolean,
      agent_response: Boolean,
      href: String,
      author_href: String,           // links.author.href (TP:210-223)
      recipient_href: Option[String],
      attachments_href: Option[String]) // attachments?message=<id> (TP:271-277)

  /** Groove attachment incl. fetched payload (TP:284-303). */
  case class GrooveAttachment(
      message_id: String,
      filename: String,
      size: Long,
      url: String,
      payload: Option[Array[Byte]]) // None = fetch failed -> failed-note path

  /** HelpScout dimension rows (APIHelper.php:41-105; SyncTickets.php:78-108). */
  case class HsMailbox(id: Long, name: String, email: String)
  case class HsUser(id: Long, email: String, firstName: String, lastName: String)
  case class HsCustomer(id: Long, email: String)
  /** Existing conversations — the dedup probe target (TP:353-373). */
  case class HsConversation(subject: String, modifiedAt: String)
}
