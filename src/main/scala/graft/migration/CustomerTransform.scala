package graft.migration

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import MigrationFunctions._

/** P1 (CustomerProcessor.php:41-169): Groove customer → HelpScout customer.
  * One declarative select over the scalar surface (X1-X5) plus the
  * missing-email error row (CP:90-133 requires ≥1 email) — the whole
  * projection is a single codegen'd stage, no joins, no UDFs.
  *
  * Output is flat + arrays: firstName/lastName (40-cap + warn flags),
  * organization/jobTitle (60-cap), location, background, primary/other
  * emails (X4 all-or-nothing split), phones/social/websites.
  */
object CustomerTransform {

  def toHelpScout(grooveCustomers: DataFrame): DataFrame = {
    val fn = nameFirst(col("name"))
    val ln = nameLast(col("name"))
    grooveCustomers.select(
      col("email").as("groove_email"),
      truncated(fn, 40).as("first_name"),
      truncated(ln, 40).as("last_name"),
      coalesce(wasTruncated(fn, 40), lit(false)).as("first_name_truncated"),
      coalesce(wasTruncated(ln, 40), lit(false)).as("last_name_truncated"),
      truncated(col("company_name"), 60).as("organization"),
      coalesce(wasTruncated(col("company_name"), 60), lit(false)).as("organization_truncated"),
      truncated(col("title"), 60).as("job_title"),
      coalesce(wasTruncated(col("title"), 60), lit(false)).as("job_title_truncated"),
      col("location"),
      col("about").as("background"),
      when(col("email").isNotNull && length(trim(col("email"))) > 0,
        primaryEmail(col("email"))).as("primary_email"),
      when(col("email").isNotNull && length(trim(col("email"))) > 0,
        otherEmails(col("email")))
        .otherwise(array().cast("array<string>")).as("other_emails"),
      col("phone_number").as("phone"),
      col("twitter_username").as("twitter"),
      col("linkedin_username").as("linkedin"),
      col("website_url").as("website"),
      // CP:90: an output customer must carry at least one email
      when(col("email").isNull || length(trim(col("email"))) === 0,
        lit("missing_email")).otherwise(lit(null).cast("string"))
        .as(ErrorChannel.ErrorType),
      when(col("email").isNull || length(trim(col("email"))) === 0,
        concat(lit("customer '"), coalesce(col("name"), lit("?")), lit("' has no email")))
        .otherwise(lit(null).cast("string"))
        .as(ErrorChannel.ErrorDetail))
  }
}
