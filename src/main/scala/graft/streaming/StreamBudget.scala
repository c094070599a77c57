package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Online token-budget enforcement — the live counterpart of the batch
  * [[graft.operators.Sampling.tokenBudgetSample]]: documents stream in,
  * each stratum (language, source) has a token budget, and a document is
  * ACCEPTED iff its stratum's running total has room for the whole
  * document at the moment it arrives. The admission gate of a continuous
  * ingestion pipeline ("stop taking French web text once we have 40B
  * tokens"), where the batch operator is the retrospective selection.
  *
  * Unlike the batch prefix rule (salted-hash order), arrival order IS the
  * stream's order — within a micro-batch, rows are processed in (key,
  * seq) order so replays are deterministic. All-or-nothing admission:
  * a document never truncates; the first document that would overflow is
  * rejected, but a LATER smaller document may still fit (first-fit, not
  * prefix — the difference between admission control and sampling,
  * stated here because consumers comparing against the batch operator
  * will otherwise chase a phantom discrepancy).
  *
  * State per stratum: two longs (accepted tokens, accepted docs) —
  * O(#strata), forever. */
object StreamBudget {

  final case class Doc(stratum: String, key: Long, seq: Long, n_tokens: Long)

  final case class BudgetState(used: Long, accepted: Long)

  final case class Verdict(stratum: String, key: Long, n_tokens: Long,
      accepted: Boolean, used_after: Long)

  /** DEFAULT-DENY contract: a stratum absent from `budgets` has budget 0
    * — every one of its documents is rejected, mirroring the batch
    * [[graft.operators.Sampling.tokenBudgetSample]] semantics (strata
    * without a budget are dropped, not passed through). This is
    * deliberate, and it means a key typo or config drift silently turns
    * a stratum off: monitor the per-stratum rejected counts (the
    * `accepted=false` verdicts carry the stratum) rather than relying on
    * an error that will not come. */
  def admit(docs: Dataset[Doc], budgets: Map[String, Long]): Dataset[Verdict] = {
    require(budgets.values.forall(_ > 0), "budgets must be positive")
    import docs.sparkSession.implicits._
    val step: (String, Iterator[Doc], GroupState[BudgetState]) => Iterator[Verdict] = {
      case (stratum, rows, state) =>
        val budget = budgets.getOrElse(stratum, 0L)
        var st = state.getOption.getOrElse(BudgetState(0L, 0L))
        val out = rows.toSeq.sortBy(d => (d.seq, d.key)).map { d =>
          val fits = st.used + d.n_tokens <= budget
          if (fits) st = BudgetState(st.used + d.n_tokens, st.accepted + 1L)
          Verdict(stratum, d.key, d.n_tokens, fits, st.used)
        }
        state.update(st)
        out.iterator
    }
    docs.groupByKey(_.stratum)
      .flatMapGroupsWithState[BudgetState, Verdict](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout)(step)
  }
}
