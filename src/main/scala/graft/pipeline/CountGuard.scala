package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Fail-loud guards for additive count stores (the LM gram tables,
  * the CDC chunk index).
  *
  * After a negated-fold takedown, ZERO is the legitimate
  * fully-taken-down state — zeroed rows drop and scorers back off as
  * absent. NEGATIVE is impossible under the takedown contract
  * (tombstoned ⊆ indexed, text exactly as published): it means the
  * caller tombstoned documents the index never held, or their text
  * drifted since publish. A silent `> 0` filter masks that violation
  * as an under-counted survivor; these guards RAISE instead — the
  * same fail-loud discipline as the sidecar kind guard and
  * `TxLog.commit(purgedId)`. Each guard is one codegen'd conditional
  * inside the existing expression: no extra job, no cost on valid
  * data (the branch never fires).
  */
private[pipeline] object CountGuard {

  private def violation(c: Column, what: String): Column =
    raise_error(concat(
      lit(s"negative $what after merge — takedown contract violated " +
        "(tombstoned docs missing from the index, or their text drifted " +
        "since publish): "), c.cast("string")))

  /** `c > 0` as a filter condition that raises on negative `c`. */
  def positive(c: Column, what: String): Column =
    when(c < 0, violation(c, what)).otherwise(c) > 0

  /** `c` passed through unchanged, raising on negative. */
  def nonNegative(c: Column, what: String): Column =
    when(c < 0, violation(c, what)).otherwise(c)
}
