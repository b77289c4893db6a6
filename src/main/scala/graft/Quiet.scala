package graft

import org.apache.logging.log4j.Level
import org.apache.logging.log4j.core.config.Configurator

/** Targeted log silencing for the harness mains (Bench/Verify/tools).
  *
  * The only logger turned off is `BlockManagerStorageEndpoint`: its sole
  * ERROR site is the async block-removal handler, which races with
  * executor-thread teardown when a bench/verify run unpersists pinned
  * blocks between queries (`unpersist(blocking = false)`) and then moves
  * on — the removal lands after the block is already gone and logs a
  * benign full stack trace. Every round's driver artifact was carrying
  * those `[error]` lines (BENCH_r06/r07 tails). Query-path errors are
  * unaffected: they surface as exceptions to the caller, not through
  * this logger. */
object Quiet {
  def storageShutdownRace(): Unit =
    Configurator.setLevel(
      "org.apache.spark.storage.BlockManagerStorageEndpoint", Level.OFF)
}
