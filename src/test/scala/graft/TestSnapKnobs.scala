package graft

import graft.table.SnapTable

/** Shared test control for the JVM-global SnapTable knobs. Safe under
  * sbt's sequential forked test execution (Test/fork := true,
  * testForkedParallel default false); if suites ever run in parallel
  * threads, this save/restore must become a lock.
  */
object TestSnapKnobs {
  def withCheckpointEvery[T](k: Int)(body: => T): T = {
    val old = SnapTable.checkpointEvery
    SnapTable.checkpointEvery = k
    try body finally SnapTable.checkpointEvery = old
  }
}
