package graft.table

import java.util.Collections

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** SQL-callable MAINTENANCE procedures for graft tables (the Iceberg
  * `CALL catalog.system.*` surface; Spark 4 executes them natively):
  *
  * {{{
  *   CALL graft.system.compact(tbl => 'db.t', target_rows => 1000000)
  *   CALL graft.system.zorder(tbl => 'db.t', x => 'user_id', y => 'dd', n_files => 32)
  *   CALL graft.system.vacuum(tbl => 'db.t', retain_from => 5)
  * }}}
  *
  * Each procedure resolves the table under the catalog root, runs the
  * programmatic maintenance op ([[GraftTable.compact]]/[[GraftTable.zorderBy]]/
  * [[GraftTable.vacuum]]), and returns a one-row summary (operation +
  * resulting latest version) as the LocalScan Spark requires of
  * procedure output. Maintenance thereby needs no driver program — a
  * scheduler can run pure SQL, exactly how production lakehouse OPTIMIZE
  * jobs are operated. `vacuum` keeps its in-flight-writer age guard: the
  * `min_age_ms` parameter DEFAULTS to the 24 h horizon, so a scheduler
  * that omits it can never race a live writer (tests lower it
  * explicitly).
  */
private[table] final class GraftProcedure(
    catalogRoot: String, val name: String,
    params: Seq[ProcedureParameter],
    run: (SparkSession, InternalRow) => (String, Long))
    extends UnboundProcedure with BoundProcedure {

  override def description(): String = s"graft maintenance procedure $name"
  override def bind(inputType: StructType): BoundProcedure = this
  override def parameters(): Array[ProcedureParameter] = params.toArray
  override def isDeterministic: Boolean = false

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val spark = SparkSession.active
    val (op, version) = run(spark, input)
    val schema = new StructType()
      .add("operation", StringType).add("version", LongType)
    // procedure output must be a LOCAL scan (Spark executes the side
    // effect here on the driver; only the one-row summary flows out)
    val scan: Scan = new org.apache.spark.sql.connector.read.LocalScan {
      override def readSchema(): StructType = schema
      override def description(): String = s"GraftProcedureResult $name"
      override def rows(): Array[InternalRow] = Array(InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(op), version))
    }
    Collections.singletonList(scan).iterator()
  }
}

private[table] object GraftProcedures {

  private def p(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()

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
        Seq(p("tbl", StringType), p("target_rows", LongType)),
        (spark, in) => {
          val t = tableFor(spark, root, in.getUTF8String(0).toString)
          ("compact", t.compact(in.getLong(1)))
        })
      case "zorder" => new GraftProcedure(root, "zorder",
        Seq(p("tbl", StringType), p("x", StringType), p("y", StringType),
          p("n_files", IntegerType)),
        (spark, in) => {
          val t = tableFor(spark, root, in.getUTF8String(0).toString)
          ("zorder", t.zorderBy(col(in.getUTF8String(1).toString),
            col(in.getUTF8String(2).toString), in.getInt(3)))
        })
      case "vacuum" => new GraftProcedure(root, "vacuum",
        Seq(p("tbl", StringType), p("retain_from", LongType),
          // defaulted: the in-flight-writer horizon — schedulers omit it,
          // tests lower it explicitly
          ProcedureParameter.in("min_age_ms", LongType)
            .defaultValue(GraftTable.DefaultVacuumMinAgeMs.toString).build()),
        (spark, in) => {
          val t = tableFor(spark, root, in.getUTF8String(0).toString)
          t.vacuum(in.getLong(1), in.getLong(2))
          ("vacuum", t.latestVersion)
        })
      case other => throw new IllegalArgumentException(
        s"unknown graft procedure $catalogName.${ident.namespace.mkString(".")}.$other " +
          "(available: compact, zorder, vacuum)")
    }

  val names: Seq[String] = Seq("compact", "zorder", "vacuum")
}
