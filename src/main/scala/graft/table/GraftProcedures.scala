package graft.table

import java.util.Collections

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL-callable MAINTENANCE + AUDIT procedures for graft tables (the
  * Iceberg `CALL catalog.system.*` surface; Spark 4 executes them
  * natively):
  *
  * {{{
  *   CALL graft.system.compact(tbl => 'db.t', target_rows => 1000000)
  *   CALL graft.system.zorder(tbl => 'db.t', x => 'user_id', y => 'dd', n_files => 32)
  *   CALL graft.system.vacuum(tbl => 'db.t', retain_from => 5)
  *   CALL graft.system.history(tbl => 'db.t')          -- DESCRIBE HISTORY
  *   CALL graft.system.detail(tbl => 'db.t')           -- DESCRIBE DETAIL
  *   CALL graft.system.restore(tbl => 'db.t', version => 3)
  *   CALL graft.system.checkpoint(tbl => 'db.t')
  * }}}
  *
  * Each procedure resolves the table under the catalog root, runs the
  * programmatic op ([[GraftTable.compact]]/[[GraftTable.zorderBy]]/
  * [[GraftTable.vacuum]]/[[GraftTable.restoreTo]]/
  * [[GraftTable.checkpoint]]) or reads the commit log
  * ([[GraftTable.commitAt]] per retained version for `history` — pure
  * manifest metadata, zero data IO), and returns its summary rows as the
  * LocalScan Spark requires of procedure output. Maintenance thereby
  * needs no driver program — a scheduler can run pure SQL, exactly how
  * production lakehouse OPTIMIZE jobs are operated. `vacuum` keeps its
  * in-flight-writer age guard: the `min_age_ms` parameter DEFAULTS to
  * the 24 h horizon, so a scheduler that omits it can never race a live
  * writer (tests lower it explicitly).
  */
private[table] final class GraftProcedure(
    catalogRoot: String, val name: String,
    params: Seq[ProcedureParameter],
    outSchema: StructType,
    run: (SparkSession, InternalRow) => Array[InternalRow])
    extends UnboundProcedure with BoundProcedure {

  override def description(): String = s"graft maintenance procedure $name"
  override def bind(inputType: StructType): BoundProcedure = this
  override def parameters(): Array[ProcedureParameter] = params.toArray
  override def isDeterministic: Boolean = false

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val spark = SparkSession.active
    val out = run(spark, input)
    // procedure output must be a LOCAL scan (Spark executes the side
    // effect here on the driver; only the summary rows flow out)
    val scan: Scan = new org.apache.spark.sql.connector.read.LocalScan {
      override def readSchema(): StructType = outSchema
      override def description(): String = s"GraftProcedureResult $name"
      override def rows(): Array[InternalRow] = out
    }
    Collections.singletonList(scan).iterator()
  }
}

private[table] object GraftProcedures {

  private def p(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()

  private val opVersionSchema = new StructType()
    .add("operation", StringType).add("version", LongType)

  private def opVersion(op: String, v: Long): Array[InternalRow] =
    Array(InternalRow(UTF8String.fromString(op), v))

  /** OPTIONAL maintenance scope — `OPTIMIZE ... WHERE`'s SQL spelling:
    * `where_col` names a partition/stat column and `[where_lo, where_hi]`
    * its inclusive bounds (numeric when both parse as numbers, UTF-8
    * string range otherwise). Defaulted empty = whole table, so existing
    * callers are untouched; with a scope, only matching files rewrite and
    * the rest carry by reference — maintenance cost O(touched partition). */
  private val scopeParams: Seq[ProcedureParameter] = Seq(
    ProcedureParameter.in("where_col", StringType).defaultValue("''").build(),
    ProcedureParameter.in("where_lo", StringType).defaultValue("''").build(),
    ProcedureParameter.in("where_hi", StringType).defaultValue("''").build())

  /** Decode the three scope params starting at ordinal `at`. */
  private def scopeOf(in: InternalRow, at: Int)
      : (Seq[(String, BigDecimal, BigDecimal)],
         Seq[(String, Option[String], Option[String])]) = {
    val colName = in.getUTF8String(at).toString
    if (colName.isEmpty) return (Seq.empty, Seq.empty)
    val lo = in.getUTF8String(at + 1).toString
    val hi = in.getUTF8String(at + 2).toString
    scala.util.Try((BigDecimal(lo), BigDecimal(hi))).toOption match {
      case Some((l, h)) => (Seq((colName, l, h)), Seq.empty)
      case None => (Seq.empty, Seq((colName, Some(lo), Some(hi))))
    }
  }

  /** Resolve `db.t`-style table references against the catalog root. */
  private def tableFor(spark: SparkSession, root: String,
                       ref: String): GraftTable = {
    val path = ref.split('.').foldLeft(new java.io.File(root))(
      (d, seg) => new java.io.File(d, seg))
    GraftTable.forPath(spark, path.getAbsolutePath)
  }

  def load(catalogName: String, root: String, ident: Identifier): UnboundProcedure =
    ident.name match {
      case "compact" => new GraftProcedure(root, "compact",
        Seq(p("tbl", StringType), p("target_rows", LongType)) ++ scopeParams :+
          // bin by on-disk bytes instead of rows when > 0 (the production
          // OPTIMIZE file-size target; manifests carry per-file bytes)
          ProcedureParameter.in("target_bytes", LongType).defaultValue("0").build(),
        opVersionSchema,
        (spark, in) => {
          val t = tableFor(spark, root, in.getUTF8String(0).toString)
          val (r, sr) = scopeOf(in, 2)
          opVersion("compact",
            t.compactWhere(in.getLong(1), r, sr, targetBytes = in.getLong(5)))
        })
      case "zorder" => new GraftProcedure(root, "zorder",
        Seq(p("tbl", StringType), p("x", StringType), p("y", StringType),
          p("n_files", IntegerType)) ++ scopeParams, opVersionSchema,
        (spark, in) => {
          val t = tableFor(spark, root, in.getUTF8String(0).toString)
          val (r, sr) = scopeOf(in, 4)
          opVersion("zorder", t.zorderWhere(col(in.getUTF8String(1).toString),
            col(in.getUTF8String(2).toString), in.getInt(3), r, sr))
        })
      case "vacuum" => new GraftProcedure(root, "vacuum",
        Seq(p("tbl", StringType),
          // exactly ONE of retain_from (a version) or retain_ms (a
          // retention duration, Delta's VACUUM ... RETAIN n HOURS —
          // boundary = the snapshot active at now − retain_ms) must be
          // given; -1 marks the other unset
          ProcedureParameter.in("retain_from", LongType)
            .defaultValue("-1").build(),
          // defaulted: the in-flight-writer horizon — schedulers omit it,
          // tests lower it explicitly
          ProcedureParameter.in("min_age_ms", LongType)
            .defaultValue(GraftTable.DefaultVacuumMinAgeMs.toString).build(),
          // dry_run => true: report how many files WOULD be reclaimed,
          // delete nothing (Delta's VACUUM ... DRY RUN)
          ProcedureParameter.in("dry_run", BooleanType)
            .defaultValue("false").build(),
          ProcedureParameter.in("retain_ms", LongType)
            .defaultValue("-1").build()),
        opVersionSchema,
        (spark, in) => {
          val t = tableFor(spark, root, in.getUTF8String(0).toString)
          val rf = in.getLong(1)
          val rm = in.getLong(4)
          require((rf >= 0) != (rm >= 0),
            "vacuum: specify exactly one of retain_from (a version) or " +
              "retain_ms (a retention duration)")
          val boundary = if (rf >= 0) rf else t.vacuumRetainBoundary(rm)
          if (in.getBoolean(3))
            opVersion("vacuum_dry_run_would_delete",
              t.vacuumPlan(boundary, in.getLong(2)).size.toLong)
          else {
            t.vacuum(boundary, in.getLong(2))
            opVersion("vacuum", t.latestVersion)
          }
        })
      case "clone" => new GraftProcedure(root, "clone",
        // SHALLOW CLONE: dest's v1 references src's files by absolute
        // path — zero bytes copied (Delta CREATE TABLE ... SHALLOW CLONE)
        Seq(p("tbl", StringType), p("dest", StringType),
          ProcedureParameter.in("version", LongType).defaultValue("-1").build()),
        opVersionSchema,
        (spark, in) => {
          val t = tableFor(spark, root, in.getUTF8String(0).toString)
          val dest = in.getUTF8String(1).toString.split('.')
            .foldLeft(new java.io.File(root))((d, seg) => new java.io.File(d, seg))
          t.cloneTo(dest.getAbsolutePath, in.getLong(2))
          opVersion("clone", 1L)
        })
      case "mv_refresh" => new GraftProcedure(root, "mv_refresh",
        // incremental materialized aggregate ([[MaterializedAgg]]):
        // creates dest on first call, then refreshes it from tbl's
        // change feed — O(rows changed) + O(groups), never O(table)
        Seq(p("tbl", StringType), p("dest", StringType),
          p("group_cols", StringType),
          ProcedureParameter.in("sum_cols", StringType).defaultValue("''").build()),
        opVersionSchema,
        (spark, in) => {
          val t = tableFor(spark, root, in.getUTF8String(0).toString)
          val dest = in.getUTF8String(1).toString.split('.')
            .foldLeft(new java.io.File(root))((d, seg) => new java.io.File(d, seg))
          def cols(i: Int): Seq[String] = in.getUTF8String(i).toString
            .split(',').map(_.trim).filter(_.nonEmpty).toSeq
          val v = MaterializedAgg.refresh(spark, t, dest.getAbsolutePath,
            cols(2), cols(3))
          opVersion("mv_refresh", v)
        })
      case "set_partitioning" => new GraftProcedure(root, "set_partitioning",
        // partition evolution (Iceberg's role): comma-separated columns,
        // empty string = unpartitioned; future writes only, zero IO
        Seq(p("tbl", StringType), p("cols", StringType)),
        opVersionSchema,
        (spark, in) => {
          val t = tableFor(spark, root, in.getUTF8String(0).toString)
          val cols = in.getUTF8String(1).toString.split(',')
            .map(_.trim).filter(_.nonEmpty).toSeq
          opVersion("set_partitioning", t.setPartitioning(cols))
        })
      case "set_not_null" => new GraftProcedure(root, "set_not_null",
        // NOT NULL column constraint: value=true validates existing data
        // then flips the flag (the SQL analyzer refuses v2 SET NOT NULL,
        // so the tightening direction lives here); value=false relaxes
        Seq(p("tbl", StringType), p("col", StringType),
          ProcedureParameter.in("value", org.apache.spark.sql.types.BooleanType)
            .defaultValue("true").build()),
        opVersionSchema,
        (spark, in) => {
          val t = tableFor(spark, root, in.getUTF8String(0).toString)
          // an omitted value arrives as a NULL slot, not the declared
          // default — read it defensively (tighten is the natural default)
          val value = if (in.isNullAt(2)) true else in.getBoolean(2)
          opVersion("set_not_null",
            t.setNotNull(in.getUTF8String(1).toString, value))
        })
      case "index_bloom" => new GraftProcedure(root, "index_bloom",
        // per-file bloom index for point-lookup skipping (Delta's bloom
        // filter index role); incremental — re-run after appends
        Seq(p("tbl", StringType), p("col", StringType),
          ProcedureParameter.in("fpp", org.apache.spark.sql.types.DoubleType)
            .defaultValue("0.01").build()),
        opVersionSchema,
        (spark, in) => {
          val t = tableFor(spark, root, in.getUTF8String(0).toString)
          opVersion("index_bloom_files_indexed",
            t.indexBloom(in.getUTF8String(1).toString, in.getDouble(2)))
        })
      case "add_constraint" => new GraftProcedure(root, "add_constraint",
        // ALTER TABLE ... ADD CONSTRAINT name CHECK (expr): validates the
        // existing table once, then a metadata-only commit; every write
        // path enforces it from then on (minWriterVersion 2 — see
        // GraftTable.addConstraint)
        Seq(p("tbl", StringType), p("name", StringType), p("expr", StringType)),
        opVersionSchema,
        (spark, in) => {
          val t = tableFor(spark, root, in.getUTF8String(0).toString)
          opVersion("add_constraint", t.addConstraint(
            in.getUTF8String(1).toString, in.getUTF8String(2).toString))
        })
      case "drop_constraint" => new GraftProcedure(root, "drop_constraint",
        Seq(p("tbl", StringType), p("name", StringType)),
        opVersionSchema,
        (spark, in) => {
          val t = tableFor(spark, root, in.getUTF8String(0).toString)
          opVersion("drop_constraint",
            t.dropConstraint(in.getUTF8String(1).toString))
        })
      case "history" => new GraftProcedure(root, "history",
        Seq(p("tbl", StringType)),
        // Delta DESCRIBE HISTORY's audit columns, from manifests alone —
        // incl. the commit timestamp (round 14) and live vs vectored rows
        new StructType()
          .add("version", LongType).add("parent", LongType)
          .add("operation", StringType)
          .add("committed_at", TimestampType)
          .add("files", IntegerType).add("rows", LongType)
          .add("dv_rows", LongType)
          .add("txn_app", StringType).add("txn_batch", LongType),
        (spark, in) => {
          val t = tableFor(spark, root, in.getUTF8String(0).toString)
          // ascending resolution rides the snapshot cache: each version
          // reconstructs from its cached parent, O(1) amortized log reads
          t.versions.map { v =>
            val c = t.commitAt(v)
            InternalRow(c.version, c.parent,
              UTF8String.fromString(c.operation),
              c.timestampMs * 1000L, // micros since epoch
              c.files.size, c.files.map(_.liveRows).sum,
              c.files.map(_.dvRows).sum,
              c.txn.map(x => UTF8String.fromString(x._1)).orNull,
              c.txn.map(x => java.lang.Long.valueOf(x._2)).orNull)
          }.toArray
        })
      case "restore" => new GraftProcedure(root, "restore",
        Seq(p("tbl", StringType), p("version", LongType)), opVersionSchema,
        (spark, in) => {
          val t = tableFor(spark, root, in.getUTF8String(0).toString)
          val target = in.getLong(1)
          opVersion(s"restore_v$target", t.restoreTo(target))
        })
      case "detail" => new GraftProcedure(root, "detail",
        Seq(p("tbl", StringType)),
        // Delta DESCRIBE DETAIL's one-row snapshot summary, from the
        // latest manifest alone — zero data IO, zero listing
        new StructType()
          .add("location", StringType)
          .add("latest_version", LongType)
          .add("committed_at", TimestampType)
          .add("num_files", IntegerType)
          .add("total_bytes", LongType)
          .add("live_rows", LongType)
          .add("dv_files", IntegerType)
          .add("dv_rows", LongType)
          .add("partition_columns", StringType)
          .add("mapped_columns", IntegerType)
          .add("retained_versions", IntegerType),
        (spark, in) => {
          val t = tableFor(spark, root, in.getUTF8String(0).toString)
          val v = t.latestVersion
          val c = t.commitAt(v)
          Array(InternalRow(
            UTF8String.fromString(t.root),
            v,
            c.timestampMs * 1000L,
            c.files.size,
            c.files.map(f => math.max(0L, f.bytes)).sum,
            c.files.map(_.liveRows).sum,
            c.files.count(_.dv.isDefined),
            c.files.map(_.dvRows).sum,
            UTF8String.fromString(c.partitionCols.mkString(",")),
            c.columnMapping.size,
            t.versions.size))
        })
      case "checkpoint" => new GraftProcedure(root, "checkpoint",
        Seq(p("tbl", StringType)), opVersionSchema,
        (spark, in) => {
          val t = tableFor(spark, root, in.getUTF8String(0).toString)
          opVersion("checkpoint", t.checkpoint())
        })
      case other => throw new IllegalArgumentException(
        s"unknown graft procedure $catalogName.${ident.namespace.mkString(".")}.$other " +
          s"(available: ${names.mkString(", ")})")
    }

  val names: Seq[String] = Seq("add_constraint", "drop_constraint", "clone", "set_not_null",
    "index_bloom", "set_partitioning", "mv_refresh", "compact", "zorder", "vacuum",
    "history", "restore", "checkpoint", "detail")
}
