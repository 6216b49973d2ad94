package graft.migration

import org.apache.spark.sql.{DataFrame, SparkSession}
import Schemas._

/** Deterministic in-memory migration fixtures covering every edge case
  * FIXTURES.md §A requires (multi-email, invalid-part fallback, no-space
  * name, >40/>60 truncation, null optionals, unknown state, unmatched
  * mailbox, non-email customer link, agent/customer/note authors, missing
  * agent, failed + oversized attachments). Used by both the ScalaTest
  * specs and the q6x queries, whose DuckDB oracles re-state these rows as
  * VALUES clauses.
  */
object Fixtures {

  val longName: String =
    "Maximilian-Alexander Konstantinopolous-Wittgenstein Van Der Bergen-Holstein"
  val longOrg: String =
    "The Extraordinarily Long Company Name Corporation of Greater Metropolitan Area Holdings"

  val customers: Seq[GrooveCustomer] = Seq(
    GrooveCustomer("alice@example.com", "Alice Anderson", Some("likes widgets"),
      Some("alice_t"), Some("alice_l"), Some("Engineer"), Some("Acme Corp"),
      Some("555-0100"), Some("Toronto"), Some("https://alice.example.com")),
    GrooveCustomer("bob@x.com; carol@y.com bob2@z.org", "Bob Builder", None,
      None, None, None, None, None, None, None),
    GrooveCustomer("dave@x.com; not-an-email", "Dave Deviant", None,
      None, None, None, None, None, None, None),
    GrooveCustomer("cher@music.com", "Cher", None,
      None, None, None, None, None, None, None),
    GrooveCustomer("max@long.com", longName, None,
      None, None, Some("Director"), Some(longOrg), None, None, None),
    GrooveCustomer("nulls@empty.com", "Null Nillson", None,
      None, None, None, None, None, None, None),
    GrooveCustomer("", "No Email", None,
      None, None, None, None, None, None, None),
    GrooveCustomer("phone@listed.com", "555-1234", None,
      None, None, None, None, None, None, None))

  val tickets: Seq[GrooveTicket] = Seq(
    GrooveTicket(1001L, "opened", "Printer on fire", Some("hw issue"),
      Seq("urgent", "hardware"), "2016-02-01T10:00:00Z", "Support",
      "https://api.groovehq.com/v1/customers/alice@example.com",
      Some("https://api.groovehq.com/v1/agents/agent@corp.com")),
    GrooveTicket(1002L, "closed", "Login broken", None,
      Seq(), "2016-02-02T11:30:00Z", "Support",
      "https://api.groovehq.com/v1/customers/bob@x.com", None),
    GrooveTicket(1003L, "pending", "Feature request", None,
      Seq("feature"), "2016-02-03T09:15:00Z", "Sales",
      "https://api.groovehq.com/v1/customers/cher@music.com", None),
    // unknown state -> error channel (AH:198-218 else-branch)
    GrooveTicket(1004L, "weird_state", "Mystery ticket", Some("odd"),
      Seq(), "2016-02-04T08:00:00Z", "Support",
      "https://api.groovehq.com/v1/customers/alice@example.com", None),
    // unmatched mailbox -> default fallback (TP:382-388)
    GrooveTicket(1005L, "unread", "Lost package", None,
      Seq("shipping"), "2016-02-05T16:45:00Z", "Nonexistent Box",
      "https://api.groovehq.com/v1/customers/alice@example.com", None),
    // customer link is an opaque id, not an email (TP:414-422)
    GrooveTicket(1006L, "opened", "Weird link", None,
      Seq(), "2016-02-06T12:00:00Z", "Support",
      "https://api.groovehq.com/v1/customers/0xdeadbeef", None),
    // duplicate of an existing conversation (same day, ci subject, J6);
    // title distinct from 1001 so only this ticket matches the probe
    GrooveTicket(1007L, "opened", "PRINTER ON FIRE again", None,
      Seq(), "2016-02-01T14:00:00Z", "Support",
      "https://api.groovehq.com/v1/customers/alice@example.com", None))

  val messages: Seq[GrooveMessage] = Seq(
    GrooveMessage(1001L, "<p>My printer is on fire!</p>", "2016-02-01T10:00:00Z",
      note = false, agent_response = false,
      "https://api.groovehq.com/v1/messages/m1",
      "https://api.groovehq.com/v1/customers/alice@example.com",
      Some("https://api.groovehq.com/v1/customers/agent@corp.com"),
      Some("https://api.groovehq.com/v1/attachments?message=m1")),
    GrooveMessage(1001L, "<p>On our way.</p>", "2016-02-01T10:05:00Z",
      note = false, agent_response = true,
      "https://api.groovehq.com/v1/messages/m2",
      "https://api.groovehq.com/v1/agents/agent@corp.com",
      Some("https://api.groovehq.com/v1/customers/alice@example.com"), None),
    GrooveMessage(1001L, "<p>internal: check warranty</p>", "2016-02-01T10:06:00Z",
      note = true, agent_response = false,
      "https://api.groovehq.com/v1/messages/m3",
      "https://api.groovehq.com/v1/agents/agent@corp.com", None, None),
    GrooveMessage(1002L, "<p>Cannot log in.</p>", "2016-02-02T11:30:00Z",
      note = false, agent_response = false,
      "https://api.groovehq.com/v1/messages/m4",
      "https://api.groovehq.com/v1/customers/bob@x.com", None,
      Some("https://api.groovehq.com/v1/attachments?message=m4")),
    // agent author missing from HS users -> ValidationException path (TP:154-157)
    GrooveMessage(1002L, "<p>ghost agent reply</p>", "2016-02-02T11:40:00Z",
      note = false, agent_response = true,
      "https://api.groovehq.com/v1/messages/m5",
      "https://api.groovehq.com/v1/agents/ghost@corp.com", None, None),
    GrooveMessage(1003L, "<p>Please add dark mode.</p>", "2016-02-03T09:15:00Z",
      note = false, agent_response = false,
      "https://api.groovehq.com/v1/messages/m6",
      "https://api.groovehq.com/v1/customers/cher@music.com", None, None))

  private val pngMagic: Array[Byte] =
    Array(0x89.toByte, 0x50.toByte, 0x4E.toByte, 0x47.toByte, 0x0D, 0x0A, 0x1A, 0x0A)
  private val pdfMagic: Array[Byte] = "%PDF-1.4 fake".getBytes("UTF-8")

  val attachments: Seq[GrooveAttachment] = Seq(
    GrooveAttachment("m1", "burning.png", 2048L,
      "https://files.example.com/burning.png", Some(pngMagic ++ "png-body".getBytes("UTF-8"))),
    GrooveAttachment("m1", "manual.pdf", 4096L,
      "https://files.example.com/manual.pdf", Some(pdfMagic)),
    // fetch failed -> failed-attachment note (TP:313-333)
    GrooveAttachment("m4", "broken.bin", 1024L,
      "https://files.example.com/broken.bin", None),
    // oversized -> warning (TP:301-303)
    GrooveAttachment("m4", "huge.zip", 20971520L,
      "https://files.example.com/huge.zip",
      Some(Array(0x50.toByte, 0x4B.toByte, 0x03.toByte, 0x04.toByte) ++
        "zip-body".getBytes("UTF-8"))))

  val hsMailboxes: Seq[HsMailbox] = Seq(
    HsMailbox(11L, "support", "support@corp.com"),
    HsMailbox(12L, "Sales", "sales@corp.com"),
    HsMailbox(13L, "Fallback", "default@corp.com"))
  val defaultMailboxEmail = "default@corp.com"

  val hsUsers: Seq[HsUser] = Seq(
    HsUser(21L, "AGENT@corp.com", "Agnes", "Agent"),
    HsUser(22L, "other@corp.com", "Otto", "Other"))

  val hsCustomers: Seq[HsCustomer] = Seq(
    HsCustomer(31L, "alice@example.com"),
    HsCustomer(32L, "bob@x.com"))

  val existingConversations: Seq[HsConversation] = Seq(
    HsConversation("printer on fire AGAIN", "2016-02-01T18:00:00Z"))

  val grooveMailboxes: Seq[String] = Seq("Support", "Sales", "Nonexistent Box")
  val grooveAgents: Seq[String] = Seq("agent@corp.com", "ghost@corp.com")

  def customersDf(s: SparkSession): DataFrame = { import s.implicits._; customers.toDF() }
  def ticketsDf(s: SparkSession): DataFrame = { import s.implicits._; tickets.toDF() }
  def messagesDf(s: SparkSession): DataFrame = { import s.implicits._; messages.toDF() }
  def attachmentsDf(s: SparkSession): DataFrame = { import s.implicits._; attachments.toDF() }
  def hsMailboxesDf(s: SparkSession): DataFrame = { import s.implicits._; hsMailboxes.toDF() }
  def hsUsersDf(s: SparkSession): DataFrame = { import s.implicits._; hsUsers.toDF() }
  def hsCustomersDf(s: SparkSession): DataFrame = { import s.implicits._; hsCustomers.toDF() }
  def existingConversationsDf(s: SparkSession): DataFrame = { import s.implicits._; existingConversations.toDF() }
  def grooveMailboxesDf(s: SparkSession): DataFrame = { import s.implicits._; grooveMailboxes.toDF("name") }
  def grooveAgentsDf(s: SparkSession): DataFrame = { import s.implicits._; grooveAgents.toDF("email") }
}
