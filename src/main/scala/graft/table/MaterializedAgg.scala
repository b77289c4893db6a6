package graft.table

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}

/** Incrementally-maintained aggregate table (materialized view) over a
  * graft source: a target graft table holding `GROUP BY <groupCols>`
  * counts and sums, refreshed from the source's CHANGE FEED instead of
  * recomputed — the canonical 100-TB summary-table pattern (Delta's live
  * tables / Iceberg+Flink MV maintenance play the same role). A daily
  * refresh of a grouped rollup over a 100-TB fact costs O(rows changed
  * since last refresh) + O(materialized groups), never O(table).
  *
  * Mechanics per refresh:
  *
  *  1. The source version the MV currently REFLECTS rides the target
  *     table's own transaction map (the Delta `txn` action the streaming
  *     sink uses) — the app id encodes the aggregate SPEC, so a refresh
  *     with a different grouping against the same target refuses instead
  *     of silently mixing states, and the stamp commits ATOMICALLY with
  *     the data (a crash between data and stamp is impossible).
  *  2. First refresh: one full aggregate of the pinned source snapshot
  *     (`VERSION AS OF`, not "latest" — a concurrent source commit must
  *     not tear the stamp).
  *  3. Every later refresh: `changesBetween(reflected, latest)` — the
  *     CDF emits 'insert'/'delete' rows (updates arrive as both), so the
  *     per-group delta is one signed aggregate: +1/-1 for counts,
  *     ±value for sums, with per-column NON-NULL counts maintained
  *     alongside so SQL semantics survive incrementality (a group whose
  *     summed column went all-NULL must read back as NULL, which a
  *     coalesced running total alone cannot represent). The deltas
  *     full-outer-join the current MV on NULL-SAFE group equality (a
  *     NULL group is a group), counts add, zero-count groups DROP, and
  *     the result commits as a snapshot replace of the (small) target.
  *
  * Maintainable aggregates are the self-inverting ones: COUNT, SUM, and
  * anything derived from them (AVG = sum/nn, exposed by [[readView]]).
  * MIN/MAX are deliberately NOT offered — a delete of the current
  * extremum needs the source group re-read, which is a recompute, not a
  * maintenance step (Delta/Flink draw the same line: MIN/MAX are only
  * incrementally safe for append-only sources). Floating-point sums
  * drift by reassociation under incremental maintenance exactly as they
  * do across shuffle orders; integral/decimal sums are exact.
  *
  * Compaction / Z-order / clone commits are change-free in the feed
  * (same rows, new files), so a refresh across them is a cheap no-op —
  * the MV never pays for layout maintenance. Source VACUUM can reclaim
  * files an old CDF range needs (Delta's own caveat): refresh more often
  * than the source's retention, or the refresh falls back with the
  * feed's missing-version error and a full re-init (drop + refresh)
  * recovers.
  */
object MaterializedAgg {

  /** The spec-carrying idempotency token: one MV root maintains ONE
    * aggregate shape; a mismatched spec against an existing target is a
    * corruption guard, not a migration path. */
  private def appId(groupCols: Seq[String], sums: Seq[String]): String =
    s"graft-mv:${groupCols.mkString(",")}|${sums.mkString(",")}"

  private def cntNn(c: String) = s"nn_$c"
  private def cntSum(c: String) = s"sum_$c"

  /** Bring the MV at `mvRoot` up to date with `source`'s latest version.
    * Returns the source version the MV now reflects. Creates the target
    * on first call. `groupCols` and `sums` must exist in the source
    * schema; `sums` must be numeric. */
  def refresh(spark: SparkSession, source: GraftTable, mvRoot: String,
              groupCols: Seq[String], sums: Seq[String]): Long = {
    require(groupCols.nonEmpty, "materialized aggregate needs group columns")
    val mv = GraftTable.handleFor(spark, mvRoot)
    val id = appId(groupCols, sums)
    val srcV = source.latestVersion
    require(srcV > 0, s"source table ${source.root} is empty")
    val reflected = if (mv.latestVersion == 0) None else mv.lastCommittedBatch(id)
    if (mv.latestVersion != 0 && reflected.isEmpty)
      throw new IllegalStateException(
        s"$mvRoot exists but carries no state for spec '$id' — it is not " +
          "this materialized aggregate (or was built with another spec)")
    reflected match {
      case Some(v) if v >= srcV => v // already current
      case None =>
        val full = spark.read.format("graft")
          .option("versionAsOf", srcV).load(source.root)
        val init = fullAggregate(full, groupCols, sums)
        mv.idempotentAppend(init, id, srcV, operation = "mv_init")
        srcV
      case Some(fromV) =>
        val changes = source.changesBetween(fromV, srcV)
        val mvParent = mv.latestVersion
        // ONE pass over the feed: the signed aggregate collapses the
        // churn to O(touched groups) rows, pinned so the emptiness probe
        // and the join never re-read the (potentially large) CDF slice
        val deltas = deltasOf(changes, groupCols, sums)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          if (deltas.isEmpty) {
            // change-free range (compaction / z-order / clone churn):
            // advance the reflected stamp in a ZERO-IO metadata commit so
            // later refreshes never re-telescope this slice of the feed
            val c = mv.commitAt(mvParent)
            mv.commit(mvParent, "mv_noop", c.files, c.schema,
              txn = Some((id, srcV)))
          } else {
            val current = spark.read.format("graft")
              .option("versionAsOf", mvParent).load(mvRoot)
            val next = applyDeltas(current, deltas, groupCols, sums)
            mv.overwrite(next, mvParent, operation = "mv_refresh",
              txn = Some((id, srcV)))
          }
        } finally deltas.unpersist()
        srcV
    }
  }

  /** CONTINUOUS maintenance: a streaming query that re-refreshes the MV
    * whenever the source commits. The version-offset stream is used as a
    * commit SIGNAL — each trigger calls [[refresh]], which reads the
    * change feed from the version the MV last reflected (its own atomic
    * stamp), so restarts, replayed micro-batches, and triggers that
    * coalesce several commits are all absorbed by the same idempotency
    * that protects the batch path: a duplicate trigger sees
    * `reflected >= latest` and does nothing. Exactly-once falls out of
    * the TARGET's transactionality, not the checkpoint's.
    * `skipChangeCommits` keeps the SIGNAL stream itself legal across
    * DELETE/MERGE/compaction rewrites — the batch contents are ignored;
    * the refresh reads the real change feed. */
  def continuousRefresh(spark: SparkSession, source: GraftTable,
                        mvRoot: String, groupCols: Seq[String],
                        sums: Seq[String], checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.format("graft")
      .option("skipChangeCommits", "true").load(source.root)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (_: DataFrame, _: Long) =>
        refresh(spark, source, mvRoot, groupCols, sums): Unit
      }
      .start()

  /** The MV contents with SQL read-back semantics: `cnt`, and per summed
    * column `sum_<c>` masked to NULL when the group holds no non-null
    * value, plus `avg_<c>` derived from the same state. */
  def readView(spark: SparkSession, mvRoot: String,
               groupCols: Seq[String], sums: Seq[String]): DataFrame = {
    val raw = spark.read.format("graft").load(mvRoot)
    val exposed: Seq[Column] =
      groupCols.map(col) ++ Seq(col("cnt")) ++ sums.flatMap { c =>
        val masked = when(col(cntNn(c)) === 0L, lit(null))
          .otherwise(col(cntSum(c)))
        Seq(masked.as(cntSum(c)),
          when(col(cntNn(c)) === 0L, lit(null))
            .otherwise(col(cntSum(c)).cast("double") / col(cntNn(c)))
            .as(s"avg_$c"))
      }
    raw.select(exposed: _*)
  }

  /** One full aggregate in the MV's STORAGE shape: running sums coalesced
    * to zero (so increments never poison on NULL) with the non-null
    * count alongside to reconstruct SQL NULL semantics at read. */
  private def fullAggregate(df: DataFrame, groupCols: Seq[String],
                            sums: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = Seq(count(lit(1)).as("cnt")) ++ sums.flatMap { c =>
      val t = sumType(df, c)
      Seq(coalesce(sum(col(c)).cast(t), lit(0L).cast(t)).as(cntSum(c)),
        count(col(c)).as(cntNn(c)))
    }
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** The natural Spark SUM result type for the column — the MV stores
    * running totals in it so increments and the initial aggregate agree. */
  private def sumType(df: DataFrame, c: String): DataType =
    df.select(sum(col(c)).as("s")).schema.head.dataType

  /** One signed aggregate over a CDF slice: +1 for 'insert', −1 for
    * 'delete', per group — the O(touched groups) delta frame. */
  private def deltasOf(changes: DataFrame, groupCols: Seq[String],
                       sums: Seq[String]): DataFrame = {
    val sgn = when(col("_change_type") === "insert", lit(1L)).otherwise(lit(-1L))
    val dAggs: Seq[Column] = Seq(sum(sgn).as("d_cnt")) ++ sums.flatMap { c =>
      val t = sumType(changes, c)
      Seq(sum(sgn.cast(t) * coalesce(col(c).cast(t), lit(0L).cast(t)))
          .as(s"d_${cntSum(c)}"),
        sum(when(col(c).isNotNull, sgn).otherwise(lit(0L)))
          .as(s"d_${cntNn(c)}"))
    }
    changes.groupBy(groupCols.map(col): _*).agg(dAggs.head, dAggs.tail: _*)
  }

  /** Current MV state + the delta frame → next MV state: one null-safe
    * full outer join on the group key, zero-count groups dropped. */
  private def applyDeltas(current: DataFrame, deltas: DataFrame,
                          groupCols: Seq[String], sums: Seq[String]): DataFrame = {
    val o = current.alias("o")
    val d = deltas.alias("d")
    // NULL-SAFE group equality: a NULL group key is a real group
    val cond = groupCols.map(g => col(s"o.$g") <=> col(s"d.$g")).reduce(_ && _)
    val keys = groupCols.map(g => coalesce(col(s"o.$g"), col(s"d.$g")).as(g))
    val cnt = (coalesce(col("o.cnt"), lit(0L)) +
      coalesce(col("d.d_cnt"), lit(0L))).as("cnt")
    val sumCols = sums.flatMap { c =>
      // the STORED type is the truth: decimal arithmetic widens precision
      // (delta multiply, running add), and an uncast result would drift
      // the MV's schema a little further on every refresh
      val t = current.schema(cntSum(c)).dataType
      Seq((coalesce(col(s"o.${cntSum(c)}"), lit(0L).cast(t)) +
            coalesce(col(s"d.d_${cntSum(c)}").cast(t), lit(0L).cast(t)))
          .cast(t).as(cntSum(c)),
        (coalesce(col(s"o.${cntNn(c)}"), lit(0L)) +
          coalesce(col(s"d.d_${cntNn(c)}"), lit(0L))).as(cntNn(c)))
    }
    o.join(d, cond, "full_outer")
      .select((keys :+ cnt) ++ sumCols: _*)
      .filter(col("cnt") > 0L)
  }
}
