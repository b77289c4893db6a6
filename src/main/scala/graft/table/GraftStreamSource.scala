package graft.table

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Streaming OFFSET for a graft table: simply the committed version — the
  * commit log is already a totally-ordered, replayable sequence, so the
  * table IS its own write-ahead log (Delta's streaming source uses the
  * same identity: offset = (reservoir version, index)). */
final case class GraftOffset(version: Long) extends Offset {
  override def json(): String = s"""{"version":$version}"""
}

object GraftOffset {
  private val Re = """\{"version":(\d+)\}""".r
  def fromJson(s: String): GraftOffset = s match {
    case Re(v) => GraftOffset(v.toLong)
    case other => throw new IllegalArgumentException(s"bad graft offset: $other")
  }
}

/** One data file of a micro-batch. Carries everything an executor needs:
  * the absolute path, the REQUIRED projection (as schema JSON — compact,
  * version-stable), and the file's Hive partition values (absent from the
  * data pages; re-injected as constants, exactly what a batch scan's
  * partition-value columns are). */
final case class GraftFilePartition(absPath: String, requiredJson: String,
                                    partition: Map[String, String],
                                    dvAbsPath: Option[String] = None,
                                    changeType: Option[String] = None,
                                    emitNewDvAbsPath: Option[String] = None,
                                    columnarEligible: Boolean = false)
    extends InputPartition

/** STREAMING SOURCE over the versioned table (round-12 extension — the
  * consumer half of the table/streaming integration, whose producer half
  * is [[graft.streaming.StreamOps.tableSink]]):
  *
  * {{{
  *   spark.readStream.format("graft").load(root)                   // full backlog, then increments
  *   spark.readStream.format("graft")
  *     .option("startingVersion", "latest").load(root)             // only new commits
  * }}}
  *
  * Offsets are table VERSIONS: a micro-batch is the half-open version
  * range (start, end], and its input files are resolved from the two
  * manifests alone — the append-only fast path of `changesBetween`, so a
  * batch costs O(its own files), never a table scan, and a restart
  * replays exactly the unprocessed versions from the checkpointed offset
  * (versions are immutable, so replays are byte-identical). Combined
  * with [[graft.streaming.StreamOps.tableSink]] downstream, a
  * table→transform→table pipeline is exactly-once END TO END: the source
  * replays deterministically by version, the sink deduplicates by
  * (appId, batchId).
  *
  * A REWRITE inside the range (merge/compact/zorder drops a file, a
  * DELETE swaps a deletion vector) makes file identity meaningless for
  * increments, so the stream fails with an explicit error rather than
  * re-emit rewritten rows — the Delta streaming source draws the same
  * line. `option("skipChangeCommits", true)` overrides (Delta's option
  * of the same name): the stream survives mid-stream maintenance and
  * delivers ONLY genuinely appended files, never rewritten base rows.
  *
  * Executors read the parquet files through the public parquet-hadoop
  * Group API (flat primitive schemas — exactly what the table format
  * writes), projecting only the required columns and re-injecting
  * partition values as constants. The row-materializing reader is the
  * honest cost of a self-contained source; the batch path keeps Spark's
  * vectorized scan (it reads through the V1 relation), and a streaming
  * micro-batch is delta-sized by construction.
  */
final class GraftMicroBatchStream(t: GraftTable, required: StructType,
                                  startingVersion: String,
                                  maxVersionsPerTrigger: Option[Long] = None,
                                  skipChangeCommits: Boolean = false,
                                  readChangeFeed: Boolean = false)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.ReadLimit

  private def filesAt(version: Long): Seq[ManifestFile] =
    if (version <= 0) Seq.empty else t.commitAt(version).files

  override def initialOffset(): Offset = {
    val v = startingVersion match {
      case "latest" => t.latestVersion
      case s => s.toLong
    }
    GraftOffset(v)
  }

  override def latestOffset(): Offset = GraftOffset(t.latestVersion)

  // ---- admission control: bounded micro-batches ---------------------------
  // `maxVersionsPerTrigger` caps how many COMMITS one micro-batch absorbs —
  // the backlog-catchup knob (Delta's maxFilesPerTrigger role): a stream
  // restarted against a month of commits drains in bounded, checkpointed
  // steps instead of one giant batch. AvailableNow pins the drain target
  // at start, so the query still terminates while respecting the cap.

  private var availableNowCap: Option[Long] = None

  override def getDefaultReadLimit: ReadLimit =
    maxVersionsPerTrigger.map(n => ReadLimit.maxFiles(n.toInt))
      .getOrElse(ReadLimit.allAvailable())

  /** Honors the ReadLimit SPARK passes (the SupportsAdmissionControl
    * contract) rather than re-deriving from the constructor option — the
    * engine may compose its own limits (Trigger.AvailableNow wraps the
    * default, future triggers may substitute): maxFiles counts VERSIONS
    * here (the unit [[getDefaultReadLimit]] advertises), composite limits
    * take their tightest member, ReadAllAvailable and unknown kinds mean
    * "no cap beyond the drain target". */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, ReadAllAvailable, ReadMaxFiles}
    val s = start.asInstanceOf[GraftOffset].version
    val target = availableNowCap.getOrElse(t.latestVersion)
    def capOf(l: ReadLimit): Long = l match {
      case m: ReadMaxFiles => s + m.maxFiles()
      case _: ReadAllAvailable => Long.MaxValue
      case c: CompositeReadLimit => c.getReadLimits.map(capOf).min
      case _ => Long.MaxValue
    }
    GraftOffset(math.max(s, math.min(target, capOf(limit))))
  }

  override def reportLatestOffset(): Offset = GraftOffset(t.latestVersion)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(t.latestVersion)

  override def deserializeOffset(json: String): Offset = GraftOffset.fromJson(json)

  /** Resolve a manifest path against the table root (ABSOLUTE entries —
    * shallow-cloned references — pass through). */
  private def abs(p: String): String =
    if (new java.io.File(p).isAbsolute) p else s"${t.root}/$p"

  /** STREAMING CHANGE FEED (`option("readChangeFeed", true)` — Delta's
    * streaming CDF): a micro-batch (s, e] delivers the per-commit row
    * changes, `_change_type`-tagged, instead of appended files only —
    * processed VERSION BY VERSION off the manifests alone:
    *
    *  - an ADDED file's live rows (through its vector) are inserts;
    *  - a REMOVED file's then-live rows (through its OLD vector) are
    *    deletes — a COW merge/update therefore renders touched rows as
    *    delete(pre-image) + insert(post-image) pairs, Delta's CDF shape;
    *  - a DELETION-VECTOR SWAP (same path, entry changed) emits exactly
    *    the NEWLY masked positions as deletes (new vector minus old);
    *  - `compact`/`zorder` are content-preserving BY CONSTRUCTION in
    *    this engine, so those commits emit NOTHING (the role Delta's
    *    dataChange=false flag plays) — maintenance never floods the
    *    feed; metadata-only commits have zero churn and emit nothing
    *    naturally.
    *
    * Rewrites are the feed's PURPOSE here, so the rewrite guard and
    * `skipChangeCommits` do not apply (combining them is refused at
    * option parsing). */
  private def planChangeFeed(s: Long, e: Long): Array[InputPartition] = {
    val mapping = t.commitAt(e).columnMapping
    // `_change_type` rides in the required schema (the reader
    // materializes it from the partition's tag, never from the file);
    // data fields map to their physical parquet names as usual
    val physRequired =
      if (mapping.isEmpty) required
      else StructType(required.fields.map(f =>
        f.copy(name = mapping.getOrElse(f.name, f.name))))
    val json = physRequired.json
    val parts = scala.collection.mutable.ArrayBuffer.empty[InputPartition]
    var prevMap = filesAt(s).map(f => f.path -> f).toMap
    ((s + 1) to e).foreach { v =>
      val cur = t.commitAt(v)
      val curMap = cur.files.map(f => f.path -> f).toMap
      if (cur.operation != "compact" && cur.operation != "zorder") {
        cur.files.filterNot(f => prevMap.contains(f.path)).foreach { f =>
          parts += GraftFilePartition(abs(f.path), json, f.partition,
            f.dv.map(abs), changeType = Some("insert"))
        }
        prevMap.values.filterNot(f => curMap.contains(f.path)).foreach { f =>
          parts += GraftFilePartition(abs(f.path), json, f.partition,
            f.dv.map(abs), changeType = Some("delete"))
        }
        prevMap.values.foreach { pf =>
          curMap.get(pf.path).foreach { cf =>
            // a deletion-vector CHANGE on a kept path. The vectors need
            // NOT nest (a restore can shrink or drop one): rows masked by
            // the new vector but not the old are this commit's deletes;
            // rows masked by the old but not the new are RESURRECTED —
            // they re-enter the table and must flow as inserts. Each
            // direction is a delta-emit partition (reader emits rows in
            // `emitNewDvAbsPath`'s vector and absent from `dvAbsPath`'s);
            // a side whose source vector is absent has an empty delta and
            // plans nothing — the reader never falls into the emit-all-
            // live-rows mode for a swap (round-14 advice).
            if (cf.dv != pf.dv) {
              if (cf.dv.isDefined) // deletes: new minus old
                parts += GraftFilePartition(abs(pf.path), json, pf.partition,
                  pf.dv.map(abs), changeType = Some("delete"),
                  emitNewDvAbsPath = cf.dv.map(abs))
              if (pf.dv.isDefined) // resurrections: old minus new
                parts += GraftFilePartition(abs(pf.path), json, pf.partition,
                  cf.dv.map(abs), changeType = Some("insert"),
                  emitNewDvAbsPath = pf.dv.map(abs))
            }
          }
        }
      }
      prevMap = curMap
    }
    parts.toArray
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftOffset].version
    val e = end.asInstanceOf[GraftOffset].version
    if (readChangeFeed) return planChangeFeed(s, e)
    val fromFiles = filesAt(s)
    val toFiles = filesAt(e)
    val fromPaths = fromFiles.map(_.path).toSet
    val toByPath = toFiles.map(f => f.path -> f).toMap
    // Data changes inside the range: a base file REMOVED (rewrite) or a
    // base ENTRY changed in place (a deletion-vector swap — same path,
    // fewer rows). Either way file identity no longer equals row
    // identity for increments.
    val removed = fromPaths -- toByPath.keySet
    val changed = fromFiles.filter(f =>
      toByPath.get(f.path).exists(_ != f)).map(_.path)
    if ((removed.nonEmpty || changed.nonEmpty) && !skipChangeCommits)
      throw new IllegalStateException(
        s"graft stream over ${t.root}: versions ($s, $e] rewrite " +
          s"${removed.size} and modify ${changed.size} base file(s) " +
          "(merge/compact/zorder/DELETE) — file identity no longer " +
          "equals row identity, so incremental consumption would " +
          "re-emit or miss rewritten rows. Run maintenance before the " +
          "stream's startingVersion, restart from a version after the " +
          "rewrite, or set option(\"skipChangeCommits\", true) to " +
          "consume only appended files (Delta's skipChangeCommits).")
    // With skipChangeCommits: only genuinely NEW paths flow — rewritten
    // or DV-modified base rows are intentionally skipped, matching the
    // documented Delta option of the same name. New files may still
    // carry a vector (a restore can re-add a DV'd entry): the reader
    // subtracts it position-by-position.
    // Column-mapped tables: the executor reader matches parquet fields
    // (and partition directory keys) by PHYSICAL name, so serialize the
    // required projection under physical names — field ORDER stays the
    // logical order, which is what the produced InternalRows follow.
    val mapping = t.commitAt(e).columnMapping
    val physRequired =
      if (mapping.isEmpty) required
      else org.apache.spark.sql.types.StructType(required.fields.map(f =>
        f.copy(name = mapping.getOrElse(f.name, f.name))))
    // Columnar eligibility is decided PER BATCH and stamped uniformly on
    // every partition (Spark refuses scans that mix row-based and columnar
    // partitions): a batch hands whole decoded batches to ColumnarToRow —
    // zero per-row materialization — exactly when no file needs the
    // row-at-a-time deletion-vector subtract and every file has at least
    // one file-stored column to drive the reader.
    val newFiles = toFiles.filter(f => !fromPaths.contains(f.path))
    val dataCols = physRequired.fields.map(_.name).toSet - "_change_type"
    val eligible = newFiles.nonEmpty && newFiles.forall(f =>
      f.dv.isEmpty && (dataCols -- f.partition.keySet).nonEmpty)
    newFiles
      .map(f => GraftFilePartition(abs(f.path), physRequired.json,
        f.partition, f.dv.map(abs),
        columnarEligible = eligible): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // operational escape hatch: spark.graft.stream.vectorizedReader=false
    // pins the row-based Group reader (also the automatic per-file
    // fallback for shapes the vectorized path cannot serve)
    new GraftStreamReaderFactory(
      org.apache.spark.sql.SparkSession.active.sessionState.conf
        .getConfString("spark.graft.stream.vectorizedReader", "true").toBoolean)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Executor-side reader factory (round-15 verdict task 5): the VECTORIZED
  * parquet reader first — Spark's own `VectorizedParquetRecordReader`,
  * the decoder the batch path uses, driven per file with the projection
  * clipped to the file's schema; rows come off the columnar batch, so a
  * wide-column backlog replay decodes at batch-scan speed instead of the
  * Group API's per-field materialization. Partition values, the CDF tag
  * column, deletion-vector masking and delta-emit all behave exactly as
  * the row-based reader. Any file/shape the vectorized path cannot serve
  * (it throws at INITIALIZATION, never mid-stream: position bookkeeping
  * starts after init succeeds) falls back to [[GraftGroupReaderFactory]]
  * — correctness is never gated on the fast path. */
final class GraftStreamReaderFactory(vectorized: Boolean = true)
    extends PartitionReaderFactory {

  /** True COLUMNAR hand-off (round-16): when the planner stamped the whole
    * micro-batch eligible (no deletion vectors, a file-stored projection),
    * decoded parquet batches flow straight into ColumnarToRow codegen with
    * ZERO per-row materialization on the source side — the shape Spark's
    * own file scan uses. The flag is uniform per batch by construction
    * (Spark refuses mixed row/columnar partitions in one scan). */
  override def supportColumnarReads(p: InputPartition): Boolean =
    vectorized && p.asInstanceOf[GraftFilePartition].columnarEligible

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    new GraftColumnarFileReader(p.asInstanceOf[GraftFilePartition])

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val fp = p.asInstanceOf[GraftFilePartition]
    if (!vectorized) return new GraftGroupReaderFactory().createReader(p)
    try new GraftVectorizedFileReader(fp)
    catch {
      case scala.util.control.NonFatal(_) =>
        new GraftGroupReaderFactory().createReader(p)
    }
  }
}

/** One file through Spark's vectorized parquet decoder, surfaced as the
  * required projection's InternalRows. The projection is clipped to the
  * columns the FILE stores (schema evolution: missing columns are null;
  * partition/tag columns are injected as constants); numeric widening
  * (int→long, int/float→double — ALTER COLUMN TYPE) adapts per column at
  * setup. Rebase modes are CORRECTED: every graft data file is written by
  * this engine on Spark 4, proleptic calendar. */
private[table] final class GraftVectorizedFileReader(fp: GraftFilePartition)
    extends PartitionReader[InternalRow] {
  import org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader

  private val required = DataType.fromJson(fp.requiredJson).asInstanceOf[StructType]

  private val wanted: Set[String] = required.fields.map(_.name).toSet --
    fp.partition.keySet - "_change_type"
  require(GraftFooterFields.of(fp.absPath).exists(wanted.contains),
    "no file-stored columns requested — use the row reader")
  // projection clipped to the columns the FILE stores, in file order
  private val (reader, cols) = GraftVectorizedInit.open(fp.absPath, wanted)

  // batch column types, positionally aligned with `cols`
  private val batchTypes: Seq[DataType] = {
    val cb = reader.resultBatch()
    (0 until cb.numCols()).map(i => cb.column(i).dataType())
  }
  require(batchTypes.length == cols.length,
    s"projection mismatch: ${cols.length} columns requested, ${batchTypes.length} decoded")

  /** Per-required-field extractor over the (reused) batch row. */
  private val extractors: Array[InternalRow => Any] =
    required.fields.map { f =>
      if (fp.changeType.isDefined && f.name == "_change_type") {
        val tag = UTF8String.fromString(fp.changeType.get)
        (_: InternalRow) => tag
      } else fp.partition.get(f.name) match {
        case Some(v) =>
          val const = GraftGroupReaderFactory.partitionValue(f, v)
          (_: InternalRow) => const
        case None =>
          val i = cols.indexOf(f.name)
          if (i < 0) (_: InternalRow) => null
          else {
            val bt = batchTypes(i)
            (f.dataType, bt) match {
              case (a, b) if a == b => a match {
                case LongType => r => if (r.isNullAt(i)) null else r.getLong(i)
                case IntegerType => r => if (r.isNullAt(i)) null else r.getInt(i)
                case DoubleType => r => if (r.isNullAt(i)) null else r.getDouble(i)
                case FloatType => r => if (r.isNullAt(i)) null else r.getFloat(i)
                case BooleanType => r => if (r.isNullAt(i)) null else r.getBoolean(i)
                case StringType =>
                  r => if (r.isNullAt(i)) null else r.getUTF8String(i).clone()
                case DateType => r => if (r.isNullAt(i)) null else r.getInt(i)
                case ArrayType(_, _) =>
                  r => if (r.isNullAt(i)) null else r.getArray(i).copy()
                case other => throw new UnsupportedOperationException(
                  s"graft vectorized stream reader: column type $other for ${f.name}")
              }
              // TIMESTAMP flavors both surface as INT64 micros
              case (TimestampType | TimestampNTZType,
                    TimestampType | TimestampNTZType) =>
                r => if (r.isNullAt(i)) null else r.getLong(i)
              // type widening (ALTER COLUMN TYPE): old narrow files
              case (LongType, IntegerType) =>
                r => if (r.isNullAt(i)) null else r.getInt(i).toLong
              case (DoubleType, IntegerType) =>
                r => if (r.isNullAt(i)) null else r.getInt(i).toDouble
              case (DoubleType, FloatType) =>
                r => if (r.isNullAt(i)) null else r.getFloat(i).toDouble
              case (a, b) => throw new UnsupportedOperationException(
                s"graft vectorized stream reader: cannot serve ${f.name}: " +
                  s"$b as $a")
            }
          }
      }
    }

  // deletion-vector masking / delta-emit — same contract as the row reader
  private val dv: Array[Long] =
    fp.dvAbsPath.map(GraftTable.readDv).getOrElse(Array.emptyLongArray)
  private var dvCursor = 0
  private var rowIdx = -1L
  private val emitNew: Array[Long] =
    fp.emitNewDvAbsPath.map(GraftTable.readDv).orNull
  private var emitCursor = 0
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (true) {
      if (!reader.nextKeyValue()) return false
      current = reader.getCurrentValue.asInstanceOf[InternalRow]
      rowIdx += 1
      val inOld =
        if (dvCursor < dv.length && dv(dvCursor) == rowIdx) {
          dvCursor += 1; true
        } else false
      if (emitNew == null) {
        if (!inOld) return true
      } else {
        while (emitCursor < emitNew.length && emitNew(emitCursor) < rowIdx)
          emitCursor += 1
        val inNew = emitCursor < emitNew.length && emitNew(emitCursor) == rowIdx
        if (inNew && !inOld) return true
      }
    }
    false // unreachable
  }

  // One reusable output row (standard PartitionReader practice — the scan
  // exec copies each row before buffering): the previous
  // `InternalRow.fromSeq(extractors.toIndexedSeq.map(_(r)))` allocated a
  // wrapper + a mapped Seq + a fresh row PER ROW, which benchmarked the
  // "vectorized" reader 2x SLOWER than the Group-API fallback on the 1M-row
  // StreamBench drain (0.76 s vs 0.39 s).
  private val outValues = new Array[Any](required.fields.length)
  private val outRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(outValues)

  override def get(): InternalRow = {
    val r = current
    var i = 0
    while (i < extractors.length) {
      outValues(i) = extractors(i)(r)
      i += 1
    }
    outRow
  }

  override def close(): Unit = reader.close()
}

/** Per-JVM cache of parquet footer metadata (field order, schema, length)
  * by absolute path — table data files are immutable once committed (new
  * content = new path), so entries never go stale; the cache removes one
  * redundant footer open+parse per (file, task) across micro-batches and
  * readers (guide §6 metadata-read cost). Crude size bound against
  * unbounded long-service growth. */
private[table] object GraftFooterFields {
  final case class Footer(fields: Seq[String], messageType: String,
                          length: Long)
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Footer]()
  def footer(absPath: String): Footer = {
    if (cache.size > 65536) cache.clear()
    cache.computeIfAbsent(absPath, p => {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new Path(p), new Configuration())
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val md = r.getFooter.getFileMetaData.getSchema
        Footer((0 until md.getFieldCount).map(i => md.getFieldName(i)),
          md.toString, in.getLength)
      } finally r.close()
    })
  }
  def of(absPath: String): Seq[String] = footer(absPath).fields
}

/** Builds and initializes Spark's vectorized parquet reader over one graft
  * data file with the projection clipped to `wanted` ∩ file columns, under
  * a PROPER read configuration. The previously used test-only
  * `initialize(path, columns)` overload hardcodes
  * `int96AsTimestamp=false`, so every file with a Spark-default INT96
  * timestamp column threw at init and the "vectorized" reader silently
  * fell back to the Group-API row path — this goes through the production
  * `InputSplit`/`TaskAttemptContext` route instead, with the requested
  * schema derived from the FILE's own footer (so ALTER-COLUMN-TYPE files
  * surface their native narrow vectors, widened downstream). */
private[table] object GraftVectorizedInit {
  import org.apache.spark.sql.execution.datasources.parquet.{
    ParquetReadSupport, ParquetToSparkSchemaConverter, VectorizedParquetRecordReader}

  /** (initialized reader, projected column names in file order). The
    * caller owns the reader (close it). */
  def open(absPath: String, wanted: Set[String])
      : (VectorizedParquetRecordReader, Seq[String]) = {
    val ft = GraftFooterFields.footer(absPath)
    val cols = ft.fields.filter(wanted.contains)
    val conf = new Configuration()
    conf.set("spark.sql.parquet.binaryAsString", "false")
    conf.set("spark.sql.parquet.int96AsTimestamp", "true")
    conf.set("spark.sql.caseSensitive", "false")
    conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    val msg = org.apache.parquet.schema.MessageTypeParser
      .parseMessageType(ft.messageType)
    val fileCatalyst = new ParquetToSparkSchemaConverter(conf).convert(msg)
    val requested = StructType(
      fileCatalyst.fields.filter(f => cols.contains(f.name)))
    conf.set(ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA, requested.json)
    conf.set("parquet.read.support.class",
      classOf[ParquetReadSupport].getName)
    // the base reader casts to the old-API split class internally
    val split = new org.apache.hadoop.mapred.FileSplit(
      new Path(absPath), 0, ft.length, Array.empty[String])
    val ctx = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
      conf, new org.apache.hadoop.mapreduce.TaskAttemptID())
    val reader = new VectorizedParquetRecordReader(
      java.time.ZoneId.of("UTC"), "CORRECTED", "UTC", "CORRECTED", "UTC",
      /* useOffHeap = */ false, /* capacity = */ 4096)
    try {
      reader.initialize(split, ctx)
      reader.initBatch(new StructType(), InternalRow.empty)
    } catch {
      case t: Throwable => reader.close(); throw t
    }
    (reader, cols)
  }
}

/** Delegating ColumnVector that serves an ALTER-COLUMN-TYPE widened view
  * of an un-widened file vector (int→long, int/float→double) — the
  * columnar twin of the row reader's widening extractors. Only the
  * target-type getter and the null accessors are reachable. */
private[table] final class GraftWideningVector(
    child: org.apache.spark.sql.vectorized.ColumnVector,
    from: DataType, to: DataType)
    extends org.apache.spark.sql.vectorized.ColumnVector(to) {
  override def close(): Unit = ()
  override def hasNull: Boolean = child.hasNull
  override def numNulls(): Int = child.numNulls()
  override def isNullAt(i: Int): Boolean = child.isNullAt(i)
  override def getLong(i: Int): Long = (to, from) match {
    case (LongType, IntegerType) => child.getInt(i).toLong
    case _ => throw new UnsupportedOperationException(s"$from as $to")
  }
  override def getDouble(i: Int): Double = (to, from) match {
    case (DoubleType, IntegerType) => child.getInt(i).toDouble
    case (DoubleType, FloatType) => child.getFloat(i).toDouble
    case _ => throw new UnsupportedOperationException(s"$from as $to")
  }
  private def nope = throw new UnsupportedOperationException(s"$from as $to")
  override def getBoolean(i: Int): Boolean = nope
  override def getByte(i: Int): Byte = nope
  override def getShort(i: Int): Short = nope
  override def getInt(i: Int): Int = nope
  override def getFloat(i: Int): Float = nope
  override def getArray(i: Int): org.apache.spark.sql.vectorized.ColumnarArray = nope
  override def getMap(i: Int): org.apache.spark.sql.vectorized.ColumnarMap = nope
  override def getDecimal(i: Int, p: Int, s: Int): org.apache.spark.sql.types.Decimal = nope
  override def getUTF8String(i: Int): UTF8String = nope
  override def getBinary(i: Int): Array[Byte] = nope
  override def getChild(i: Int): org.apache.spark.sql.vectorized.ColumnVector = nope
}

/** One file surfaced as COLUMNAR BATCHES (the planner-stamped eligible
  * case: no deletion vector, no delta-emit, ≥1 file-stored column):
  * Spark's vectorized parquet decoder in batch-return mode, with the
  * output batch assembled from the decoded vectors REORDERED to the
  * required projection — partition values and the CDF tag as constant
  * vectors, schema-evolution-missing columns as null constants, ALTER'd
  * types through [[GraftWideningVector]]. No per-row work at all on the
  * source side; ColumnarToRow downstream is whole-stage codegen. */
private[table] final class GraftColumnarFileReader(fp: GraftFilePartition)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  import org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader
  import org.apache.spark.sql.execution.vectorized.ConstantColumnVector
  import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

  private val required = DataType.fromJson(fp.requiredJson).asInstanceOf[StructType]
  private val wanted: Set[String] = required.fields.map(_.name).toSet --
    fp.partition.keySet - "_change_type"
  private val (reader, cols) = GraftVectorizedInit.open(fp.absPath, wanted)
  require(cols.nonEmpty,
    s"graft columnar stream reader: no file-stored columns of ${fp.absPath}" +
      " requested — planner must not mark such partitions eligible")
  reader.enableReturningBatches()
  private val src = reader.resultBatch()

  private def const(f: StructField, set: ConstantColumnVector => Unit)
      : ColumnVector = {
    val v = new ConstantColumnVector(4096, f.dataType)
    set(v)
    v
  }

  private val outVectors: Array[ColumnVector] = required.fields.map { f =>
    if (fp.changeType.isDefined && f.name == "_change_type")
      const(f, _.setUtf8String(UTF8String.fromString(fp.changeType.get)))
    else fp.partition.get(f.name) match {
      case Some(raw) =>
        GraftGroupReaderFactory.partitionValue(f, raw) match {
          case null => const(f, _.setNull())
          case s: UTF8String => const(f, _.setUtf8String(s))
          case l: java.lang.Long => const(f, _.setLong(l))
          case i: java.lang.Integer => const(f, _.setInt(i))
          case d: java.lang.Double => const(f, _.setDouble(d))
          case fl: java.lang.Float => const(f, _.setFloat(fl))
          case b: java.lang.Boolean => const(f, _.setBoolean(b))
          case other => throw new UnsupportedOperationException(
            s"graft columnar stream reader: partition constant $other")
        }
      case None =>
        val i = cols.indexOf(f.name)
        if (i < 0) const(f, _.setNull()) // schema evolution: missing column
        else {
          val cv = src.column(i)
          val bt = cv.dataType()
          (f.dataType, bt) match {
            case (a, b) if a == b => cv
            // TIMESTAMP flavors share the INT64-micros layout
            case (TimestampType | TimestampNTZType,
                  TimestampType | TimestampNTZType) => cv
            case (LongType, IntegerType) |
                 (DoubleType, IntegerType) |
                 (DoubleType, FloatType) =>
              new GraftWideningVector(cv, bt, f.dataType)
            case (a, b) => throw new UnsupportedOperationException(
              s"graft columnar stream reader: cannot serve ${f.name}: $b as $a")
          }
        }
    }
  }
  private val out = new ColumnarBatch(outVectors)

  override def next(): Boolean = {
    if (!reader.nextKeyValue()) return false
    out.setNumRows(src.numRows())
    true
  }

  override def get(): ColumnarBatch = out
  override def close(): Unit = reader.close()
}

/** Executor-side ROW-BASED reader (the fallback path): parquet Group
  * records → InternalRow of the required projection. Primitive columns
  * (long, int, double, float,
  * boolean, string, timestamp[_ntz] as INT64 micros or INT96, date) plus
  * ARRAYS of those primitives (Spark's 3-level parquet list layout — the
  * embeddings table's `array<float>` streams) — the shapes the table
  * format writes; anything else fails loudly. A required column missing
  * from the file (schema evolution) or from a row (null) is null; a
  * required column present in the file's PARTITION values materializes
  * as a constant. */
final class GraftGroupReaderFactory extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val fp = p.asInstanceOf[GraftFilePartition]
    val required = DataType.fromJson(fp.requiredJson).asInstanceOf[StructType]
    new PartitionReader[InternalRow] {
      private val reader: ParquetReader[Group] =
        ParquetReader.builder(new GroupReadSupport(), new Path(fp.absPath))
          .withConf(new Configuration()).build()
      private var current: Group = _
      // deletion vector: sorted deleted positions, consumed in lockstep
      // with the sequential read (positions ascend, so one cursor)
      private val dv: Array[Long] =
        fp.dvAbsPath.map(GraftTable.readDv).getOrElse(Array.emptyLongArray)
      private var dvCursor = 0
      private var rowIdx = -1L
      // change-feed DV-swap partitions: emit ONLY the positions the NEW
      // vector masks beyond the old one (the rows this commit deleted)
      private val emitNew: Array[Long] =
        fp.emitNewDvAbsPath.map(GraftTable.readDv).orNull
      private var emitCursor = 0

      override def next(): Boolean = {
        while (true) {
          current = reader.read()
          if (current == null) return false
          rowIdx += 1
          val inOld =
            if (dvCursor < dv.length && dv(dvCursor) == rowIdx) {
              dvCursor += 1; true
            } else false
          if (emitNew == null) {
            if (!inOld) return true // normal mode: vector masks
          } else {
            // delta-emit mode: row qualifies iff newly masked
            while (emitCursor < emitNew.length && emitNew(emitCursor) < rowIdx)
              emitCursor += 1
            val inNew = emitCursor < emitNew.length && emitNew(emitCursor) == rowIdx
            if (inNew && !inOld) return true
          }
        }
        false // unreachable
      }

      override def get(): InternalRow = {
        val g = current
        val schema = g.getType
        val vals = required.fields.map { f =>
          if (fp.changeType.isDefined && f.name == "_change_type")
            UTF8String.fromString(fp.changeType.get)
          else fp.partition.get(f.name) match {
            case Some(v) => partitionValue(f, v)
            case None =>
              if (!schema.containsField(f.name)) null
              else {
                val i = schema.getFieldIndex(f.name)
                if (g.getFieldRepetitionCount(i) == 0) null
                else fieldValue(f, g, i)
              }
          }
        }
        InternalRow.fromSeq(vals.toIndexedSeq)
      }

      override def close(): Unit = reader.close()
    }
  }

  private def fieldValue(f: StructField, g: Group, i: Int): Any = f.dataType match {
    case ArrayType(et, _) =>
      // Spark's 3-level list layout: optional group f (LIST) {
      //   repeated group list { optional ELEMENT element } } — the outer
      // group's field 0 repeats once per element, each repetition a
      // single-field group holding the (possibly null) element
      val outer = g.getGroup(i, 0)
      val n = outer.getFieldRepetitionCount(0)
      val out = new Array[Any](n)
      var j = 0
      while (j < n) {
        val el = outer.getGroup(0, j)
        out(j) = if (el.getFieldRepetitionCount(0) == 0) null
                 else primValue(et, el, 0, 0, f.name)
        j += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    case dt => primValue(dt, g, i, 0, f.name)
  }

  private def primValue(dt: DataType, g: Group, i: Int, j: Int, name: String): Any =
    dt match {
      case LongType =>
        // TYPE WIDENING: a file written before an ALTER COLUMN TYPE
        // stores the narrow physical type — upcast exactly like the
        // batch reader does
        import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
        g.getType.getType(i).asPrimitiveType().getPrimitiveTypeName match {
          case PrimitiveTypeName.INT32 => g.getInteger(i, j).toLong
          case _ => g.getLong(i, j)
        }
      case IntegerType => g.getInteger(i, j)
      case DoubleType =>
        import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
        g.getType.getType(i).asPrimitiveType().getPrimitiveTypeName match {
          case PrimitiveTypeName.INT32 => g.getInteger(i, j).toDouble
          case PrimitiveTypeName.FLOAT => g.getFloat(i, j).toDouble
          case _ => g.getDouble(i, j)
        }
      case FloatType => g.getFloat(i, j)
      case BooleanType => g.getBoolean(i, j)
      case StringType => UTF8String.fromBytes(g.getBinary(i, j).getBytes)
      case TimestampType | TimestampNTZType =>
        import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
        g.getType.getType(i).asPrimitiveType().getPrimitiveTypeName match {
          case PrimitiveTypeName.INT64 => g.getLong(i, j) // micros
          case PrimitiveTypeName.INT96 =>
            // legacy layout: 8B nanos-of-day (LE) + 4B julian day (LE) —
            // Spark's default physical type for TIMESTAMP (LTZ) output
            val b = java.nio.ByteBuffer
              .wrap(g.getInt96(i, j).getBytes)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            val nanosOfDay = b.getLong
            val julianDay = b.getInt
            (julianDay - 2440588L) * 86400000000L + nanosOfDay / 1000L
          case other => throw new UnsupportedOperationException(
            s"graft stream reader: timestamp physical type $other for $name")
        }
      case DateType => g.getInteger(i, j) // epoch days
      case other => throw new UnsupportedOperationException(
        s"graft stream reader: unsupported column type $other for $name")
    }

  private def partitionValue(f: StructField, v: String): Any =
    GraftGroupReaderFactory.partitionValue(f, v)
}

object GraftGroupReaderFactory {
  /** Hive partition value string → catalyst value of the field's type.
    * The null-partition directory marker reconstructs as NULL, matching
    * the batch path. Shared by the vectorized and Group readers. */
  private[table] def partitionValue(f: StructField, v: String): Any =
    if (v == GraftTable.HiveNullPartition) null
    else f.dataType match {
      case LongType => v.toLong
      case IntegerType => v.toInt
      case DoubleType => v.toDouble
      case FloatType => v.toFloat
      case BooleanType => v.toBoolean
      case StringType => UTF8String.fromString(v)
      case DateType => java.time.LocalDate.parse(v).toEpochDay.toInt
      case TimestampType | TimestampNTZType =>
        // Hive renders timestamp partition values as 'yyyy-MM-dd HH:mm:ss[.f]'
        val ts = java.sql.Timestamp.valueOf(v)
        ts.getTime / 1000L * 1000000L + ts.getNanos / 1000L
      case other => throw new UnsupportedOperationException(
        s"graft stream reader: unsupported partition type $other for ${f.name}")
    }
}
