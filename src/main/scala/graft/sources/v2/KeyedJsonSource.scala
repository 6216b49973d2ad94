package graft.sources.v2

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JacksonGenerator, JSONOptions, JacksonParser}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortOrder, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 source for a KEY-SHARDED directory layout
  * (`<keycol>=<v>/part-*.json`, the layout `df.write.partitionBy(keycol)`
  * produces) that REPORTS its clustering to Catalyst — the
  * storage-partitioned-join device (SPARK-37375): the scan implements
  * `SupportsReportPartitioning` with a `KeyGroupedPartitioning` over
  * `identity(keycol)` and every input partition carries its key via
  * `HasPartitionKey`, so a join of two such tables on the shard key plans
  * with ZERO Exchange — co-location proven by layout, like Hive bucketing
  * (q158/q160), but carried by the CONNECTOR, no metastore, no catalog
  * table registration. This is how the Iceberg-era lakehouse avoids
  * shuffles on 100 TB fact-fact joins, and the engine's paged DSv2 source
  * (S1/S2) gains the same planning citizenship its relational scans have.
  *
  * identity(), not bucket(): a V2 bucket transform is only resolvable
  * through a FunctionCatalog, which a path-based table does not have —
  * so the shard id is materialized AT WRITE TIME (pmod(xxhash64(key), S),
  * the q129/q158 idiom) and reported as an identity-partitioned column.
  * The reader never parses the shard from data files (partitionBy strips
  * it): it is injected from the directory name, exactly as the page scan
  * injects its page id.
  *
  * Usage: spark.read.format("graft-keyed").schema(s)
  *   .option("keycol", "shard").load(dir)
  * The schema must contain `keycol` as an INT column.
  */
class KeyedJsonSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-keyed"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "graft-keyed requires an explicit schema (schema-on-read)")

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val path = Option(opts.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-keyed requires a path"))
    val keyCol = Option(opts.get("keycol")).getOrElse(
      throw new IllegalArgumentException("graft-keyed requires keycol"))
    require(schema.fieldNames.contains(keyCol),
      s"graft-keyed: schema must contain key column '$keyCol'")
    require(schema(keyCol).dataType == IntegerType,
      s"graft-keyed: key column '$keyCol' must be INT")
    new KeyedJsonTable(schema, path, keyCol)
  }
}

class KeyedJsonTable(userSchema: StructType, path: String, keyCol: String)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-keyed:$path"
  override def schema(): StructType = userSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KeyedJsonScanBuilder(userSchema, path, keyCol)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val s = info.schema()
    require(s.fieldNames.contains(keyCol),
      s"graft-keyed write: input must carry key column '$keyCol'")
    require(s(keyCol).dataType == IntegerType,
      s"graft-keyed write: key column '$keyCol' must be INT")
    // streaming exactly-once leg: a foreachBatch caller passes the
    // micro-batch id and the write's commit becomes idempotent (marker
    // check + residue scrub keyed on the id) — see KeyedJsonStream
    val batchId = Option(info.options.get("batchid")).map(_.toLong)
    new WriteBuilder {
      override def build(): Write = new KeyedJsonWrite(s, path, keyCol, batchId)
    }
  }
}

/** The write side of the connector — the layout contract ENFORCED at
  * write time, which is what makes the read side's reported partitioning
  * trustworthy:
  *
  *  - `RequiresDistributionAndOrdering` demands clustering by the key
  *    column, so Spark shuffles ONCE at write and every shard directory
  *    is produced whole — the write pays the exchange the SPJ reads then
  *    never pay again (the lakehouse amortization, end to end in one
  *    connector);
  *  - a temp-dir + driver-commit protocol: each task attempt writes
  *    under `_tmp-<writeUUID>/attempt-<partition>-<task>/`, commit moves
  *    ONLY committed attempts' files into `key=<v>/` (file names carry
  *    (partitionId, taskId), so speculative/retried attempts can never
  *    collide), abort deletes the attempt dirs — a failed or speculative
  *    task leaves NOTHING visible;
  *  - the key column is stripped from the JSON body (JacksonGenerator
  *    over the non-key fields), symmetric with the read side's
  *    inject-from-dir-name.
  */
class KeyedJsonWrite(
    schema: StructType, path: String, keyCol: String,
    batchId: Option[Long] = None)
    extends Write with RequiresDistributionAndOrdering {
  override def requiredDistribution(): Distribution =
    Distributions.clustered(Array(Expressions.identity(keyCol)))
  override def requiredOrdering(): Array[SortOrder] = Array.empty
  override def toBatch: BatchWrite =
    new KeyedJsonBatchWrite(schema, path, keyCol, batchId)
}

case class KeyedFileCommit(files: Seq[(Int, String)]) extends WriterCommitMessage

class KeyedJsonBatchWrite(
    schema: StructType, path: String, keyCol: String,
    batchId: Option[Long] = None)
    extends BatchWrite {
  private val tmpRoot =
    s"$path/_tmp-${java.util.UUID.randomUUID().toString.take(8)}"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new KeyedJsonWriterFactory(schema, keyCol, tmpRoot)

  /** Batch-id exactly-once protocol (streaming foreachBatch leg; batch
    * writes without a batchid are untouched). Ordered so every crash
    * window replays clean:
    *  1. marker present → the batch already committed whole; a replayed
    *     commit is a no-op (crash after step 4);
    *  2. scrub `batch-<id>-*` residue from the shard dirs — a previous
    *     attempt that crashed mid-move (step 3) left a visible PARTIAL
    *     batch; the replay deletes it before re-moving, so the batch's
    *     files are never seen twice;
    *  3. move this attempt's files in, names prefixed `batch-<id>-` (the
    *     scrub key);
    *  4. write the marker, temp + ATOMIC_MOVE (the commit point).
    * Readers tolerate every window: shard files are the only data, the
    * marker flips atomically, and pre-marker partials are exactly what
    * step 2 scrubs on replay. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    if (batchId.exists(markerExists)) { deleteTmp(); return }
    batchId.foreach(scrubResidue)
    val prefix = batchId.map(id => s"batch-$id-").getOrElse("")
    val root = java.nio.file.Paths.get(path)
    messages.foreach {
      case KeyedFileCommit(files) => files.foreach { case (key, tmp) =>
        val src = java.nio.file.Paths.get(tmp)
        val destDir = root.resolve(s"$keyCol=$key")
        java.nio.file.Files.createDirectories(destDir)
        java.nio.file.Files.move(src,
          destDir.resolve(prefix + src.getFileName.toString),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
      case other => throw new IllegalStateException(s"unexpected commit $other")
    }
    deleteTmp()
    batchId.foreach(writeMarker)
  }

  private def markerPath(id: Long): java.nio.file.Path =
    java.nio.file.Paths.get(path, "_batches", s"batch-$id.committed")

  private def markerExists(id: Long): Boolean =
    java.nio.file.Files.exists(markerPath(id))

  private def writeMarker(id: Long): Unit = {
    val marker = markerPath(id)
    java.nio.file.Files.createDirectories(marker.getParent)
    val tmp = java.nio.file.Files.createTempFile(
      marker.getParent, s"batch-$id", ".tmp")
    java.nio.file.Files.write(tmp,
      java.util.Arrays.asList(s"batch $id committed"))
    java.nio.file.Files.move(tmp, marker,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def scrubResidue(id: Long): Unit = {
    val root = new java.io.File(path)
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith(s"$keyCol="))
      .foreach { shard =>
        Option(shard.listFiles()).getOrElse(Array.empty)
          .filter(_.getName.startsWith(s"batch-$id-"))
          .foreach(f => java.nio.file.Files.deleteIfExists(f.toPath))
      }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = deleteTmp()

  private def deleteTmp(): Unit = {
    val p = java.nio.file.Paths.get(tmpRoot)
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}

class KeyedJsonWriterFactory(schema: StructType, keyCol: String, tmpRoot: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new KeyedJsonDataWriter(schema, keyCol, tmpRoot, partitionId, taskId)
}

class KeyedJsonDataWriter(
    schema: StructType, keyCol: String, tmpRoot: String,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {

  private val keyIdx = schema.fieldIndex(keyCol)
  private val dataFields = schema.fields.zipWithIndex.filter(_._1.name != keyCol)
  private val dataSchema = StructType(dataFields.map(_._1))
  private val stripKey = UnsafeProjection.create(
    dataFields.map { case (f, i) => BoundReference(i, f.dataType, f.nullable) })
  private val attemptDir = java.nio.file.Paths.get(
    s"$tmpRoot/attempt-$partitionId-$taskId")
  // clustered distribution usually routes ONE key here, but several
  // groups may share a partition — one open generator per key
  private val open = scala.collection.mutable.Map.empty[
    Int, (JacksonGenerator, java.io.Writer, java.nio.file.Path)]

  override def write(row: InternalRow): Unit = {
    val key = row.getInt(keyIdx)
    val (gen, _, _) = open.getOrElseUpdate(key, {
      val f = attemptDir.resolve(s"$keyCol=$key")
        .resolve(s"part-$partitionId-$taskId.json")
      java.nio.file.Files.createDirectories(f.getParent)
      val w = java.nio.file.Files.newBufferedWriter(f)
      (new JacksonGenerator(dataSchema, w,
        new JSONOptions(Map.empty[String, String], "UTC", "")), w, f)
    })
    gen.write(stripKey(row))
    gen.writeLineEnding()
  }

  override def commit(): WriterCommitMessage = {
    open.values.foreach { case (g, w, _) => g.flush(); g.close(); w.close() }
    KeyedFileCommit(open.toSeq.map { case (k, (_, _, f)) => (k, f.toString) })
  }

  override def abort(): Unit = {
    open.values.foreach { case (g, w, _) =>
      try { g.close(); w.close() } catch { case _: Exception => }
    }
    if (java.nio.file.Files.exists(attemptDir)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(attemptDir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  override def close(): Unit = ()
}

object KeyedJson {

  /** The survivor-store GENERATION manifest (r17 verdict #3): once a
    * store has been compacted, `<path>/_gen` names the single LIVE
    * generation `gen` and the max batch id `folded` into it. Readers
    * resolve liveness through it: `gen-<gen>-*` files plus
    * `batch-<id>-*` files with id > folded (plus unprefixed plain-batch
    * files, which compaction never touches). A store never compacted
    * has no manifest and reads exactly as before — except that stray
    * `gen-*` files (a compaction that crashed before its swap) are
    * ignored, which is what makes the swap atomic: the ONLY visibility
    * flip is the manifest rename. */
  final case class GenState(gen: Long, folded: Long)

  private[v2] def genManifestPath(path: String): java.nio.file.Path =
    java.nio.file.Paths.get(path, "_gen")

  def readGen(path: String): Option[GenState] = {
    val p = genManifestPath(path)
    if (!java.nio.file.Files.exists(p)) None
    else {
      val lines = java.nio.file.Files.readAllLines(p).asScala
        .map(_.trim).filter(_.nonEmpty)
      val gen = lines.collectFirst { case s if s.startsWith("gen ") =>
        s.drop(4).toLong }
      val folded = lines.collectFirst { case s if s.startsWith("folded ") =>
        s.drop(7).toLong }
      require(gen.isDefined && folded.isDefined,
        s"graft-keyed: malformed generation manifest at $p")
      Some(GenState(gen.get, folded.get))
    }
  }

  private[v2] val GenFileRe = "^gen-(\\d+)-.*".r
  private[v2] val BatchFileRe = "^batch-(\\d+)-.*".r

  /** Is a shard data file LIVE under the store's generation state? */
  private[graft] def liveFile(name: String, gen: Option[GenState]): Boolean =
    name match {
      case GenFileRe(g) => gen.exists(_.gen == g.toLong)
      case BatchFileRe(id) => gen.forall(id.toLong > _.folded)
      case _ => true
    }

  /** (keyValue, files) per shard directory, sorted by key — a stable
    * partition order keeps two sides' reported partitionings comparable.
    * Files are filtered through the generation manifest (see
    * [[GenState]]); for a never-compacted store that filter is the
    * identity on everything a writer can have produced. A
    * missing/non-directory/URI-prefixed path is an ERROR, not an empty
    * scan: java.io.File silently yields null for all of those, and a
    * connector that answers a typo'd load() with zero rows is a
    * correctness hazard (this source is local-filesystem-backed, like
    * the paged fixture scan's file mode — s3://ish paths don't belong
    * here). */
  def listShards(path: String, keyCol: String): Seq[(Int, Seq[String])] = {
    val dir = new java.io.File(path)
    require(dir.isDirectory,
      s"graft-keyed: '$path' is not a local directory (URI-prefixed or " +
        "remote paths are not supported by this source)")
    val gen = readGen(path)
    val re = (java.util.regex.Pattern.quote(keyCol) + "=(-?\\d+)").r
    Option(dir.listFiles()).getOrElse(Array.empty).toSeq
      .flatMap(d => d.getName match {
        case re(v) if d.isDirectory =>
          // parse as Long first: a stray `key=99999999999` directory is a
          // LAYOUT error to surface by name, not a NumberFormatException
          // that fails the scan opaquely (the regex already guarantees
          // digits, so only the range can go wrong)
          val asLong = scala.util.Try(v.toLong).getOrElse(
            throw new IllegalArgumentException(
              s"graft-keyed: shard directory '${d.getName}' under '$path' " +
                s"has a key outside Long range"))
          require(asLong >= Int.MinValue && asLong <= Int.MaxValue,
            s"graft-keyed: shard directory '${d.getName}' under '$path' " +
              s"has a key outside Int range (the shard key column is " +
              "32-bit); fix the directory layout")
          val files = Option(d.listFiles()).getOrElse(Array.empty).toSeq
            .filter(f => f.isFile && !f.getName.startsWith("_")
              && !f.getName.startsWith(".") && liveFile(f.getName, gen))
            .map(_.getAbsolutePath).sorted
          if (files.nonEmpty) Some(asLong.toInt -> files) else None
        case _ => None
      }).sortBy(_._1)
  }
}

class KeyedJsonScanBuilder(userSchema: StructType, path: String, keyCol: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = userSchema
  private var keep: Option[Set[Int]] = None // None = all shards
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Shard-dir pruning — the partition-pruning leg of the source (the
    * paged scan's page-range pushdown, applied to the key=value layout):
    * equality/IN filters on the key column drop whole directories at
    * PLANNING time; pruned shards are never listed as input partitions,
    * so their files are never opened. Everything else stays a residual
    * Spark evaluates post-scan. */
  override def pushFilters(
      filters: Array[org.apache.spark.sql.sources.Filter]): Array[org.apache.spark.sql.sources.Filter] = {
    import org.apache.spark.sql.sources.{EqualTo, In}
    def restrict(s: Set[Int]): Unit =
      keep = Some(keep.fold(s)(_.intersect(s)))
    val (accepted, residual) = filters.partition {
      case EqualTo(c, _: Integer) if c == keyCol => true
      case In(c, vs) if c == keyCol &&
        vs.forall(_.isInstanceOf[Integer]) => true
      case _ => false
    }
    accepted.foreach {
      case EqualTo(_, v: Integer) => restrict(Set(v.intValue))
      case In(_, vs) => restrict(vs.map(_.asInstanceOf[Integer].intValue).toSet)
      case _ =>
    }
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushed

  override def build(): Scan =
    new KeyedJsonScan(userSchema, required, path, keyCol, keep)
}

class KeyedJsonScan(
    userSchema: StructType,
    required: StructType,
    path: String,
    keyCol: String,
    keep: Option[Set[Int]] = None) extends Scan with Batch
    with SupportsReportPartitioning {

  private val shards: Seq[(Int, Seq[String])] =
    KeyedJson.listShards(path, keyCol)
      .filter { case (v, _) => keep.forall(_.contains(v)) }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-keyed shards=[${shards.map(_._1).mkString(",")}] of $path"

  /** The SPJ contract: clustering by identity(keyCol) with one reported
    * partition per shard directory. Catalyst resolves the reference
    * against the scan output, so the key column must survive pruning for
    * the partitioning to be honored (a join on it always reads it). */
  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(Array(Expressions.identity(keyCol)), shards.size)

  override def planInputPartitions(): Array[InputPartition] =
    shards.map { case (v, files) => ShardPartition(v, files): InputPartition }
      .toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new KeyedJsonReaderFactory(required, keyCol)
}

/** One shard directory = one input partition; `partitionKey` is what lets
  * BatchScanExec group/align the two sides without a shuffle. */
case class ShardPartition(key: Int, files: Seq[String])
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](key))
}

class KeyedJsonReaderFactory(required: StructType, keyCol: String)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ShardPartitionReader(partition.asInstanceOf[ShardPartition], required, keyCol)
}

/** Reads every data file of one shard directory; the shard column is not
  * in the files (partitionBy strips it) — it is injected from the
  * directory's key, the page-id-injection pattern of the paged scan. */
class ShardPartitionReader(
    partition: ShardPartition,
    required: StructType,
    keyCol: String) extends PartitionReader[InternalRow] {

  private val dataFields: Seq[StructField] =
    required.fields.toSeq.filter(_.name != keyCol)
  private val dataSchema = StructType(dataFields)
  private val keyIdx: Int = required.fieldNames.indexOf(keyCol)

  private lazy val parser = new JacksonParser(
    dataSchema, new JSONOptions(Map.empty[String, String], "UTC", ""),
    false, Seq.empty)

  // streaming line reader: a multi-GB part file must not be materialized
  // as a whole java.util.List<String> before the first row is emitted —
  // the reader holds one buffered file at a time, closed on exhaustion
  // (or by close() if the scan stops early, e.g. under a LIMIT)
  private var openReader: java.io.BufferedReader = _
  private def linesOf(f: String): Iterator[String] = {
    val br = java.nio.file.Files.newBufferedReader(java.nio.file.Paths.get(f))
    openReader = br
    Iterator.continually(br.readLine()).takeWhile { l =>
      if (l == null) { br.close(); openReader = null; false } else true
    }
  }

  private lazy val rows: Iterator[InternalRow] =
    partition.files.iterator.flatMap(linesOf).filter(_.trim.nonEmpty)
      .flatMap { line =>
        parser.parse(line, CreateJacksonParser.string,
          (s: String) => org.apache.spark.unsafe.types.UTF8String.fromString(s))
      }.map { dataRow =>
        if (keyIdx < 0) dataRow.copy()
        else {
          val out = new GenericInternalRow(required.length)
          var i = 0; var j = 0
          while (i < required.length) {
            if (i == keyIdx) out.update(i, partition.key)
            else { out.update(i, dataRow.get(j, dataFields(j).dataType)); j += 1 }
            i += 1
          }
          out
        }
      }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit =
    if (openReader != null) { openReader.close(); openReader = null }
}
