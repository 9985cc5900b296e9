package graft.sources.v2

import java.util.{Map => JMap}

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 "one text file = one document" source — the reference's
  * ingestion model (manifest + whole-file read inside the mapper,
  * BookQuery.java:44-61) as a REAL optimizer-visible table:
  *
  * {{{ spark.read.format("graft-text").load(corpusDir) }}}
  *
  * Schema is (doc_id string, text string) with doc_id = file basename minus
  * extension — the identity rule the reference applies at BookQuery.java:48-49
  * — computed INSIDE the source, so plans need no input_file_name()+regexp
  * projection and column pruning reaches the reader: a doc_id-only query
  * never materializes file contents (`SupportsPushDownRequiredColumns`).
  * Equality/IN predicates on doc_id push down too
  * (`SupportsPushDownFilters`): because doc_id IS the file name, they prune
  * the FILE LISTING at planning time — a point lookup on a 100 TB corpus
  * opens exactly one file (spec-asserted), the `PushedDocIds` entry in
  * explain shows it, and non-matching predicates stay Spark-side.
  *
  * Scale shape: the driver sees only file METADATA (one listing, exactly the
  * manifest the reference driver wrote); files are packed into splits by
  * cumulative size against `spark.sql.files.maxPartitionBytes` +
  * `openCostInBytes`, so a 100 TB corpus of small files spreads evenly over
  * executors and each file's bytes are read once, executor-side.
  *
  * Deliberately NO MicroBatchStream: watching a directory correctly needs a
  * persisted seen-files log with compaction (publish order and mtime don't
  * agree under staged renames, so a high-water mark silently drops late
  * publishes) — exactly what Spark's built-in FileStreamSource already
  * provides; `readStream.text(dir)` plus the doc_id projection covers the
  * streaming-ingest case without re-implementing that battle-tested log,
  * and the engine's streaming tiers consume it that way.
  */
class TextCorpusSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-text"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TextCorpusSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-text requires a path: .load(dir)"))
    new TextCorpusTable(path)
  }
}

object TextCorpusSource {
  val Schema: StructType = new StructType()
    .add("doc_id", StringType, nullable = false)
    .add("text", StringType, nullable = false)

  /** basename minus extension — reference identity rule (BookQuery.java:48-49). */
  def docId(fileName: String): String = {
    val base = fileName.substring(fileName.lastIndexOf('/') + 1)
    val dot = base.lastIndexOf('.')
    if (dot > 0) base.substring(0, dot) else base
  }
}

private[v2] class TextCorpusTable(path: String) extends Table
    with SupportsRead with org.apache.spark.sql.connector.catalog.SupportsWrite {
  // no backticks: Spark embeds this name in analysis errors, and stray
  // backticks there turn a clear schema-mismatch into a parser error
  override def name(): String = s"graft-text $path"
  override def schema(): StructType = TextCorpusSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TextCorpusScanBuilder(path)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new TextCorpusWriteBuilder(path, info.schema())
}

private[v2] class TextCorpusScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  private var required: StructType = TextCorpusSource.Schema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  // doc_id IS the file name, so equality/IN predicates on it are FILE
  // pruning: matching is exact at the listing, non-matching files are
  // never opened (the point-lookup shape on a 100 TB corpus). Accepted
  // filters are fully handled here — Spark does not re-evaluate them.
  // Multiple accepted filters AND together: intersect their allowed sets.
  private var accepted: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  private var allowedDocIds: Option[Set[String]] = None

  override def pushFilters(
      filters: Array[org.apache.spark.sql.sources.Filter]): Array[org.apache.spark.sql.sources.Filter] = {
    import org.apache.spark.sql.sources.{EqualTo, In}
    def allowed(f: org.apache.spark.sql.sources.Filter): Option[Set[String]] = f match {
      case EqualTo("doc_id", v: String) => Some(Set(v))
      case In("doc_id", vs) if vs != null && vs.forall(_.isInstanceOf[String]) =>
        Some(vs.map(_.asInstanceOf[String]).toSet)
      case _ => None
    }
    val (sup, rest) = filters.partition(allowed(_).isDefined)
    accepted = sup
    allowedDocIds = sup.flatMap(allowed).reduceOption(_ intersect _)
    rest
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = accepted

  override def build(): Scan = new TextCorpusScan(path, required, allowedDocIds)
}

private[graft] class TextCorpusScan(path: String, required: StructType,
    docIdFilter: Option[Set[String]] = None)
    extends Scan with Batch {
  // session Hadoop conf captured at plan time (driver) and shipped to
  // executors — a bare `new Configuration()` would drop spark.hadoop.*
  // settings (credentials, filesystem tuning)
  private val confSer: java.io.Serializable =
    org.apache.spark.sql.GraftShim.serializableHadoopConf(
      org.apache.spark.sql.GraftShim.sessionHadoopConf())

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"TextCorpusScan path=$path, ReadSchema: ${required.simpleString}" +
      docIdFilter.fold("")(ids => s", PushedDocIds: [${ids.toSeq.sorted.mkString(", ")}]")

  /** Driver-side METADATA listing only (the reference's manifest, :216-226);
    * deterministic order, hidden files skipped, splits packed by size like
    * Spark's own FilePartition planning.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val fs = p.getFileSystem(org.apache.spark.sql.GraftShim.hadoopConfOf(confSer))
    val stats: Array[FileStatus] =
      (if (fs.getFileStatus(p).isDirectory) fs.listStatus(p) else Array(fs.getFileStatus(p)))
        .filter { s =>
          val n = s.getPath.getName
          s.isFile && !n.startsWith("_") && !n.startsWith(".") &&
            docIdFilter.forall(_.contains(TextCorpusSource.docId(n)))
        }
        .sortBy(_.getPath.toString)
    val conf = SQLConf.get
    val maxBytes = conf.filesMaxPartitionBytes
    val openCost = conf.filesOpenCostInBytes
    val splits = Array.newBuilder[InputPartition]
    var current = List.empty[FileSlice]
    var acc = 0L
    stats.foreach { s =>
      val cost = s.getLen + openCost
      if (acc + cost > maxBytes && current.nonEmpty) {
        splits += TextFilesPartition(current.reverse.toArray)
        current = Nil
        acc = 0L
      }
      current ::= FileSlice(s.getPath.toString, s.getLen)
      acc += cost
    }
    if (current.nonEmpty) splits += TextFilesPartition(current.reverse.toArray)
    splits.result()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TextCorpusReaderFactory(required, confSer)
}

private[graft] case class FileSlice(path: String, len: Long)
private[graft] case class TextFilesPartition(files: Array[FileSlice]) extends InputPartition

private[v2] class TextCorpusReaderFactory(required: StructType, confSer: java.io.Serializable)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new TextCorpusReader(partition.asInstanceOf[TextFilesPartition], required, confSer)
}

/** Executor-side reader: one row per file; reads bytes only if `text` is in
  * the required schema (column pruning all the way down). Line breaks are
  * normalized to single spaces — the reference concatenates lines with " "
  * (BookQuery.java:57-61).
  */
private[v2] class TextCorpusReader(partition: TextFilesPartition, required: StructType,
    confSer: java.io.Serializable)
    extends PartitionReader[InternalRow] {
  private val needText = required.fieldNames.contains("text")
  private val fieldIdx = required.fieldNames.zipWithIndex.toMap
  private var i = -1
  private var row: InternalRow = _
  private lazy val fs = new Path(partition.files.head.path)
    .getFileSystem(org.apache.spark.sql.GraftShim.hadoopConfOf(confSer))

  override def next(): Boolean = {
    i += 1
    if (i >= partition.files.length) return false
    val f = partition.files(i)
    val values = new Array[Any](required.length)
    fieldIdx.get("doc_id").foreach { idx =>
      values(idx) = UTF8String.fromString(TextCorpusSource.docId(f.path))
    }
    if (needText) {
      // a whole-file-as-one-row source is bounded by the JVM array limit;
      // fail loudly instead of a negative allocation or silent truncation
      require(f.len <= Int.MaxValue - 16,
        s"${f.path} is ${f.len} B — too large for a single whole-text document row")
      val in = fs.open(new Path(f.path))
      try {
        val bytes = new Array[Byte](f.len.toInt)
        in.readFully(0, bytes)
        val text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
          .replaceAll("\\r?\\n", " ")
        values(fieldIdx("text")) = UTF8String.fromString(text)
      } finally in.close()
    }
    row = new GenericInternalRow(values)
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}

// ----------------------------------------------------------------- write path

/** The WRITE half of the doc-per-file corpus table — the reference's output
  * model (files on a shared FS) as a real DSv2 sink with the distributed
  * two-phase commit the `foreachPartition` export util could never give:
  *
  * {{{ df.write.format("graft-text").mode("append"|"overwrite").save(dir) }}}
  *
  * Commit protocol (Hadoop v2-committer discipline, executor-side publish):
  * each task writes its rows as `<doc_id>.txt` under a hidden per-task
  * staging dir, then — at TASK commit, which Spark's output-commit
  * coordination grants to exactly one attempt per partition
  * (`useCommitCoordinator`) — ATOMIC-OVERWRITE-renames each file into the
  * corpus root. Publish work is therefore parallel across executors and
  * O(docs/task) per task; the DRIVER commit is O(tasks): it only handles
  * truncate, drops the staging dir, and writes `_SUCCESS` (this is the fix
  * for the classic Hadoop-v1 "driver renames every file serially"
  * bottleneck — at 100 TB doc-per-file the old loop was the engine's one
  * remaining driver-side scale killer, measured 97.7 s cold at sf0.1).
  *
  * Semantics readers can rely on:
  *  - **per-document atomicity**: upsert is a single overwrite rename
  *    (`Options.Rename.OVERWRITE`), so a concurrent reader sees each
  *    document's old bytes or new bytes — never torn, never momentarily
  *    absent.
  *  - **append-as-upsert is idempotent**: replaying a write converges
  *    byte-for-byte (text is published line-normalized, `\r?\n` → space,
  *    the corpus format's canonical form).
  *  - **job failure rolls back NEW documents**: abort deletes staged dirs
  *    and the freshly CREATED files named in committed-task messages. A
  *    document the failed job had already *replaced* keeps the new version
  *    (its old bytes are unrecoverable after an overwrite rename) — i.e.
  *    failed jobs are at-least-once per replaced doc, and the replay that
  *    retries the job converges to exactly-once corpus state (the same
  *    contract `publishCorpus` is spec'd on).
  *  - **`overwrite` (TRUNCATE)** removes stale visible files only at
  *    driver commit, AFTER all tasks published: readers see per-document
  *    old-or-new (briefly the union — never an empty corpus), and a crash
  *    mid-commit leaves a recoverable superset plus staging, never loss.
  *
  * doc_id is the FILE NAME: it must be unique per corpus (last rename wins
  * otherwise — the primary-key contract every doc table in the engine
  * carries) and path-safe (validated loudly per row). The write schema
  * must be EXACTLY (doc_id string, text string): extra input columns would
  * be silently discarded by a doc-per-file format, so they fail the write
  * up front instead.
  */
private[v2] class TextCorpusWriteBuilder(path: String, schema: StructType)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var truncateFirst = false
  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    truncateFirst = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write = {
    require(schema.fieldNames.toSet == Set("doc_id", "text") &&
        schema.fields.forall(_.dataType == StringType),
      "graft-text write requires exactly (doc_id string, text string) — a " +
        s"doc-per-file corpus cannot carry extra columns; got ${schema.simpleString}")
    new TextCorpusWrite(path, schema, truncateFirst)
  }
}

private[v2] class TextCorpusWrite(path: String, schema: StructType, truncateFirst: Boolean)
    extends org.apache.spark.sql.connector.write.Write {
  override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
    new TextCorpusBatchWrite(path, schema, truncateFirst)
}

/** Test-visible accounting: filesystem MUTATION ops performed on the DRIVER
  * during `BatchWrite.commit` (renames/deletes/creates — listings excluded).
  * The spec pins the append path at a small constant independent of the
  * number of documents written: the whole point of the executor-side
  * publish is that driver commit work is O(tasks), never O(docs).
  */
private[graft] object TextCorpusSinkMetrics {
  val lastDriverCommitOps = new java.util.concurrent.atomic.AtomicLong(0L)
}

private[v2] class TextCorpusBatchWrite(path: String, schema: StructType,
    truncateFirst: Boolean)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._
  // driver-side conf, shipped to executors (same rule as the scan)
  private val confSer: java.io.Serializable =
    org.apache.spark.sql.GraftShim.serializableHadoopConf(
      org.apache.spark.sql.GraftShim.sessionHadoopConf())
  private val stagingName = s".staging-${java.util.UUID.randomUUID()}"

  // publish happens at TASK commit, so exactly one attempt per partition
  // may commit — Spark's OutputCommitCoordinator provides that guarantee
  override def useCommitCoordinator(): Boolean = true

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new TextCorpusWriterFactory(path, s"$path/$stagingName", schema, confSer)

  /** Driver commit is O(tasks): tasks already atomically published their
    * own files at task commit. Remaining driver work — truncate stale
    * visible files (only in overwrite mode, inherently O(stale)), drop the
    * staging dir (1 recursive op), write `_SUCCESS` (1 op).
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(path)
    val fs = root.getFileSystem(org.apache.spark.sql.GraftShim.hadoopConfOf(confSer))
    var driverOps = 0L
    val published = scala.collection.mutable.Set.empty[String]
    messages.foreach {
      case TextWriteDone(_, created, replaced) =>
        published ++= created; published ++= replaced
      case null => () // zero-task stage edge
      case other => sys.error(s"unexpected commit message: $other")
    }
    // truncate AFTER all tasks published: readers see per-document
    // old-or-new (briefly the union), and a crash here leaves a
    // recoverable superset plus staging — never an emptied corpus
    if (truncateFirst) {
      val existing = if (fs.exists(root)) fs.listStatus(root) else Array.empty[FileStatus]
      existing.foreach { s =>
        val n = s.getPath.getName
        if (s.isFile && !n.startsWith("_") && !n.startsWith(".") && !published.contains(n)) {
          fs.delete(s.getPath, false); driverOps += 1
        }
      }
    }
    fs.delete(new Path(root, stagingName), true); driverOps += 1
    val ok = fs.create(new Path(root, "_SUCCESS"), true); ok.close(); driverOps += 1
    TextCorpusSinkMetrics.lastDriverCommitOps.set(driverOps)
  }

  /** Roll back what committed tasks CREATED (messages only exist for
    * committed attempts); a document the job had already REPLACED keeps the
    * new version — its old bytes are gone after an overwrite rename — so a
    * failed job is at-least-once per replaced doc and the retrying replay
    * converges (the idempotent-upsert contract the sink is spec'd on).
    */
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(path)
    val fs = root.getFileSystem(org.apache.spark.sql.GraftShim.hadoopConfOf(confSer))
    messages.foreach {
      case TextWriteDone(_, created, _) =>
        created.foreach(n => fs.delete(new Path(root, n), false))
      case _ => ()
    }
    fs.delete(new Path(root, stagingName), true)
  }
}

/** `created`/`replaced` are the published FILE NAMES this task renamed into
  * the corpus root at task commit, split by whether the destination already
  * existed — abort rolls back `created` only.
  */
private[v2] case class TextWriteDone(taskDir: String,
    created: Array[String], replaced: Array[String])
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

private[v2] class TextCorpusWriterFactory(rootPath: String, stagingPath: String,
    schema: StructType, confSer: java.io.Serializable)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new TextCorpusDataWriter(rootPath, s"$stagingPath/$partitionId-$taskId", schema, confSer)
}

/** Executor-side writer: one UTF-8 file per row under this task's private
  * staging subdir (task attempts never collide; a failed/speculated attempt
  * leaves only garbage in staging that abort or the driver commit's
  * dir-drop reclaims). At TASK commit — granted to exactly one attempt per
  * partition by the output-commit coordinator — every staged file is
  * ATOMIC-OVERWRITE-renamed into the corpus root (`FileContext` +
  * `Options.Rename.OVERWRITE`): a concurrent reader sees each document's
  * old bytes or new bytes, never torn and never momentarily absent, and
  * publish work runs parallel across executors instead of serially on the
  * driver. doc_id is validated path-safe loudly — a '/' or a leading
  * '_'/'.' would silently vanish from the read side's listing.
  */
private[v2] class TextCorpusDataWriter(rootPath: String, taskDir: String,
    schema: StructType, confSer: java.io.Serializable)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
  import TextCorpusDataWriter.NewlineRe
  private val docIdx = schema.fieldIndex("doc_id")
  private val textIdx = schema.fieldIndex("text")
  private var n = 0L
  private lazy val conf = org.apache.spark.sql.GraftShim.hadoopConfOf(confSer)
  private lazy val fs = new Path(taskDir).getFileSystem(conf)

  /** `file://`-scheme fast path: Hadoop's local adapter forks a `chmod`
    * PROCESS per created file when the native library is absent (measured
    * 21 ms/create + 44 ms/rename here vs 0.05 ms for the raw OS call —
    * it made a 5k-doc publish cost 238 s). java.nio performs the same ops
    * with identical semantics: `ATOMIC_MOVE + REPLACE_EXISTING` is the
    * POSIX atomic overwrite rename. Any non-local scheme (HDFS, S3A — the
    * real-cluster deployments) takes the Hadoop branch unchanged.
    */
  private lazy val localTaskDir: Option[java.nio.file.Path] = {
    val uri = new Path(taskDir).toUri
    if (uri.getScheme == null || uri.getScheme == "file")
      Some(java.nio.file.Paths.get(uri.getPath))
    else None
  }
  private var localDirReady = false

  override def write(row: InternalRow): Unit = {
    val docId = row.getUTF8String(docIdx).toString
    require(docId.nonEmpty && !docId.contains('/') && !docId.contains('\\') &&
        !docId.startsWith("_") && !docId.startsWith("."),
      s"doc_id '$docId' is not a publishable file name (path separators and " +
        "underscore/dot prefixes collide with the corpus listing rules)")
    // publish in the corpus' line-normalized form (what the read side and
    // the reference's ingestion produce) — write→read is then the identity
    // on what readers of this format observe
    val text = NewlineRe.matcher(row.getUTF8String(textIdx).toString).replaceAll(" ")
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    localTaskDir match {
      case Some(dir) =>
        if (!localDirReady) {
          java.nio.file.Files.createDirectories(dir); localDirReady = true
        }
        java.nio.file.Files.write(dir.resolve(s"$docId.txt"), bytes)
      case None =>
        val out = fs.create(new Path(taskDir, s"$docId.txt"), true)
        try out.write(bytes)
        finally out.close()
    }
    n += 1
  }

  /** Publish this task's staged files into the corpus root. Runs only on
    * the coordinator-approved attempt. A failure mid-loop fails the task:
    * already-renamed files are upserts a retry or job-abort reconciles
    * (replay converges), un-renamed ones stay hidden in staging.
    */
  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    val created = Array.newBuilder[String]
    val replaced = Array.newBuilder[String]
    localTaskDir match {
      case Some(dir) if n > 0 && java.nio.file.Files.isDirectory(dir) =>
        import java.nio.file.{Files, StandardCopyOption}
        val rootDir = java.nio.file.Paths.get(new Path(rootPath).toUri.getPath)
        val files = Files.list(dir)
        try files.iterator().forEachRemaining { f =>
          val name = f.getFileName.toString
          val dest = rootDir.resolve(name)
          // existence probe classifies new-vs-replaced for abort rollback
          // only; the move itself is a single atomic overwrite (no
          // delete-then-rename absence window)
          val existed = Files.exists(dest)
          Files.move(f, dest,
            StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
          if (existed) replaced += name else created += name
        } finally files.close()
      case None if n > 0 && fs.exists(new Path(taskDir)) =>
        val root = new Path(rootPath)
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(root.toUri, conf)
        fs.listStatus(new Path(taskDir)).foreach { f =>
          val name = f.getPath.getName
          val dest = new Path(root, name)
          val existed = fs.exists(dest)
          fc.rename(f.getPath, dest, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
          if (existed) replaced += name else created += name
        }
      case _ => ()
    }
    TextWriteDone(taskDir, created.result(), replaced.result())
  }
  override def abort(): Unit = fs.delete(new Path(taskDir), true)
  override def close(): Unit = ()
}

private[v2] object TextCorpusDataWriter {
  /** Precompiled once — `String.replaceAll` re-compiles its regex per row. */
  private val NewlineRe = java.util.regex.Pattern.compile("\\r?\\n")
}
