package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the contract gate a pipeline runs on
  * every snapshot before publishing it downstream: row-level rules
  * ("quantity in [1, 50]", "discount is a valid rate") evaluated in ONE
  * scan, plus referential-integrity orphan counts across tables. The
  * output is a small per-rule violation table a scheduler thresholds on;
  * at 100 TB the row-rule pass is a map-side-combined aggregate (no rule
  * adds a scan or a shuffle) and each FK check is one anti-join, the
  * minimal movement that question admits.
  */
object Quality {

  /** Evaluate row-level rules in one pass. Each rule is (name, predicate a
    * GOOD row satisfies); a null predicate result counts as a violation
    * (unknown is not good — the SQL-three-valued-logic trap callers set
    * otherwise). Output: one row per rule with the checked/violation
    * counts, in rule order. */
  def rowChecks(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "no rules")
    val aggs = count(lit(1)).as("__n") +:
      rules.map { case (name, pred) =>
        sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(s"__v_$name")
      }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val arms = rules.map { case (name, _) => s"'$name', `__v_$name`" }.mkString(", ")
    wide.selectExpr("__n AS n_checked",
      s"stack(${rules.length}, $arms) AS (check_name, n_violations)")
      .select(col("check_name"), col("n_checked"),
        col("n_violations").cast("long"))
  }

  /** Referential-integrity orphan count: child rows whose `childKey` has
    * no match in `parent.parentKey`. One anti-join (broadcast or shuffled,
    * Catalyst's choice by size); null child keys are orphans (they
    * reference nothing). */
  def fkOrphans(child: DataFrame, childKey: String, parent: DataFrame,
      parentKey: String, checkName: String): DataFrame = {
    val n = child.count()
    val orphans = child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey), "left_anti")
      .count()
    val spark = child.sparkSession
    import spark.implicits._
    Seq((checkName, n, orphans)).toDF("check_name", "n_checked", "n_violations")
  }
}
