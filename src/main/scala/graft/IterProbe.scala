package graft

import org.apache.spark.sql.DataFrame

/** Loop-iteration plan capture (VERDICT r18 next #5: the pageRank/hits/
  * BPE/unigram per-iteration claims — "the checkpointed side arrives
  * pre-partitioned, only the node-sized frame exchanges" — were only
  * verifiable by reading code, because the dumped plans are the 13-line
  * final frames over checkpointed RDDs). When `probe` is set, the loops
  * call it with (loopName, iteration, frame) on each iteration's frame
  * BEFORE its localCheckpoint, so PlanDumpR19 can write a mid-loop
  * `explain("formatted")`. Diagnostic only: None everywhere except under
  * PlanDumpR19 (a None check per iteration — no cost in Bench/Verify),
  * and the probe must only EXPLAIN, never execute, the frame.
  */
object IterProbe {
  @volatile var probe: Option[(String, Int, DataFrame) => Unit] = None

  def tap(name: String, iter: Int, df: DataFrame): Unit =
    probe.foreach(_(name, iter, df))
}
