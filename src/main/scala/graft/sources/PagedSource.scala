package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Paged-scan reader (S1/S2: the reference's page loops,
  * SyncCustomers.php:57-83, SyncTickets.php:169-202) re-expressed
  * Spark-first: one JSON file per page, page number in the file name.
  * Pages become partitions; a `--startPage/--stopPage` range (F4) prunes
  * at FILE LISTING time via pathGlobFilter — pruned pages are never opened,
  * the distributed analog of "never fetch the page".
  *
  * At 100 TB the same shape holds: a landing zone of page/chunk files, a
  * manifest for statistics (A1 count-first planning), range pruning on the
  * partition column. A live DataSource-V2 REST source would add
  * SupportsPushDownFilters + planInputPartitions-from-total_pages on the
  * same layout (SURVEY §4).
  */
object PagedSource {

  /** Read page files `page-<n>.json` under `dir`, optionally restricted to
    * [startPage, stopPage]. The page id is recovered from the file path
    * into a `page` column. */
  def readPages(
      spark: SparkSession,
      dir: String,
      schema: StructType,
      startPage: Option[Int] = None,
      stopPage: Option[Int] = None): DataFrame = {
    val reader = spark.read.schema(schema)
    val withFilter = (startPage, stopPage) match {
      case (Some(a), Some(b)) =>
        val pages = (a to b).map(p => s"page-$p.json")
        // explicit path list: pruned pages never reach the file scan
        return reader.json(pages.map(p => s"$dir/$p"): _*)
          .withColumn("page", pageOf(input_file_name()))
      case _ => reader
    }
    withFilter.option("pathGlobFilter", "page-*.json").json(dir)
      .withColumn("page", pageOf(input_file_name()))
  }

  private def pageOf(file: org.apache.spark.sql.Column) =
    regexp_extract(file, "page-(\\d+)\\.json", 1).cast("int")

  /** A1 count-first planning: total_count/total_pages from the manifest
    * (the `meta.pagination` envelope, SC:60-63) without scanning pages. */
  def readManifest(spark: SparkSession, dir: String): (Long, Long) = {
    val m = spark.read.json(s"$dir/meta.json")
      .select(col("pagination.total_count"), col("pagination.total_pages"))
      .head()
    (m.getLong(0), m.getLong(1))
  }
}
