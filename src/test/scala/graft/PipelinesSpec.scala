package graft

import org.apache.spark.sql.Row
import graft.migration.{Fixtures, Pipelines, SyncOptions}

/** Local-mode executor-side recorder: a top-level object so the publish
  * closure serializes without dragging the spec (and its SparkSession). */
object PipelinePostRecorder {
  val posted: java.util.List[Row] = java.util.Collections.synchronizedList(
    new java.util.ArrayList[Row]())
  def post(rows: Seq[Row]): Unit = rows.foreach(posted.add)
}

/** End-to-end lifecycles (SURVEY §3): the three composed entry points over
  * the migration fixtures, exercising the CLI options option-for-option.
  */
class PipelinesSpec extends SparkSpec {

  private def posted = PipelinePostRecorder.posted
  private def post: Seq[Row] => Unit = PipelinePostRecorder.post

  test("sync-customers publishes ok rows, quarantines errors, writes the CSV") {
    posted.clear()
    val tmp = java.nio.file.Files.createTempDirectory("graft-synccust").toString
    val report = Pipelines.syncCustomers(
      Fixtures.customersDf(spark),
      errorCsv = Some((tmp, "20160201000000")))(post)
    assert(report.errors === 1L) // the no-email fixture row
    assert(report.published === Fixtures.customers.size - 1L)
    assert(posted.size().toLong === report.published)
    assert(report.batches >= 1L)
    val csv = new java.io.File(s"$tmp/sync-errors-20160201000000")
    assert(csv.exists, "error CSV directory missing")
  }

  test("sync-tickets: validation gate aborts with the unmatched report (ST exit)") {
    posted.clear()
    val out = Pipelines.syncTickets(
      Fixtures.ticketsDf(spark), Fixtures.messagesDf(spark),
      Fixtures.attachmentsDf(spark),
      Fixtures.grooveMailboxesDf(spark), Fixtures.grooveAgentsDf(spark),
      Fixtures.hsMailboxesDf(spark), Fixtures.hsUsersDf(spark),
      Fixtures.hsCustomersDf(spark), Fixtures.existingConversationsDf(spark),
      Fixtures.defaultMailboxEmail)(post)
    assert(out.isLeft, "fixture dims contain planted mismatches -> must abort")
    assert(out.left.toOption.get.count() === 2L) // q63's two unmatched rows
    assert(posted.isEmpty, "nothing may publish after a failed gate")
  }

  test("sync-tickets: bypassValidation + checkDuplicates end-to-end") {
    posted.clear()
    def run(opts: SyncOptions): Long = {
      posted.clear()
      Pipelines.syncTickets(
        Fixtures.ticketsDf(spark), Fixtures.messagesDf(spark),
        Fixtures.attachmentsDf(spark),
        Fixtures.grooveMailboxesDf(spark), Fixtures.grooveAgentsDf(spark),
        Fixtures.hsMailboxesDf(spark), Fixtures.hsUsersDf(spark),
        Fixtures.hsCustomersDf(spark), Fixtures.existingConversationsDf(spark),
        Fixtures.defaultMailboxEmail, opts)(post)
        .toOption.get.published
    }
    val all = run(SyncOptions(bypassValidation = true))
    val deduped = run(SyncOptions(bypassValidation = true, checkDuplicates = true))
    assert(all > deduped, s"dedup must drop the planted duplicate ($all vs $deduped)")
    val one = run(SyncOptions(bypassValidation = true, tickets = Seq(1001L)))
    assert(one === 1L)
    assert(posted.size() === 1)
  }

  test("view-ticket dumps the assembled conversation for one ticket") {
    val dump = Pipelines.viewTicket(
      Fixtures.ticketsDf(spark), Fixtures.messagesDf(spark),
      Fixtures.attachmentsDf(spark), Fixtures.hsMailboxesDf(spark),
      Fixtures.hsUsersDf(spark), Fixtures.hsCustomersDf(spark),
      Fixtures.defaultMailboxEmail, 1001L)
    assert(dump.contains("Printer on fire"))
    assert(dump.contains("\"groove_ticket_number\":1001"))
  }
}
