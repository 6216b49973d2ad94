package graft.migration

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import MigrationFunctions.ciEq

/** Fail-fast validation gates (SyncTickets.php:70-115): every Groove
  * mailbox must match a HelpScout mailbox by ci name (J7, ST:84-92) and
  * every Groove agent a HelpScout user by ci email (J8, ST:100-108);
  * misses abort the run. Expressed as left-anti joins whose counts gate
  * the pipeline — dims are broadcast, the gate is one tiny job before the
  * main scan (same plan order the reference hand-rolls).
  */
object Validation {

  /** Groove mailboxes with no ci-name match in HelpScout (J7). */
  def unmatchedMailboxes(grooveMailboxes: DataFrame, hsMailboxes: DataFrame): DataFrame =
    grooveMailboxes.join(broadcast(hsMailboxes),
        ciEq(grooveMailboxes("name"), hsMailboxes("name")), "left_anti")

  /** Groove agents with no ci-email match in HelpScout users (J8). */
  def unmatchedAgents(grooveAgents: DataFrame, hsUsers: DataFrame): DataFrame =
    grooveAgents.join(broadcast(hsUsers),
        ciEq(grooveAgents("email"), hsUsers("email")), "left_anti")

  /** The gate: Left(unmatched report) to abort, Right(()) to proceed. */
  def gate(grooveMailboxes: DataFrame, hsMailboxes: DataFrame,
           grooveAgents: DataFrame, hsUsers: DataFrame): Either[DataFrame, Unit] = {
    val badM = unmatchedMailboxes(grooveMailboxes, hsMailboxes)
      .select(lit("unmatched_mailbox").as("error_type"), col("name").as("detail"))
    val badA = unmatchedAgents(grooveAgents, hsUsers)
      .select(lit("unmatched_agent").as("error_type"), col("email").as("detail"))
    val bad = badM.unionByName(badA)
    if (bad.isEmpty) Right(()) else Left(bad)
  }
}
