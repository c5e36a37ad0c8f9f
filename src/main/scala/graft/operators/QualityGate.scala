package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based data-quality gate — the validation report a pipeline runs
  * before promoting a snapshot (the Great-Expectations / dbt-test shape
  * re-expressed Spark-first): every row-local rule is a boolean Column
  * and the whole report is ONE conditional aggregation — a single scan
  * producing one row per rule, never a per-rule job. Key-uniqueness is
  * not row-local, so it runs as its own count-distinct aggregate and
  * unions into the same report schema.
  *
  * Report schema: (rule, n_violations, n_rows, pass) — the gate
  * promotes the snapshot iff every `pass` is true. At 100 TB the
  * row-local report is one pass over the table (predicates are
  * codegen'd into the scan); uniqueness is one hash aggregate on the
  * key — both shapes a validation suite can afford nightly.
  */
object QualityGate {

  final case class Rule(name: String, violated: Column) {
    require(name.matches("[A-Za-z0-9_]+"), s"rule name must be an identifier: $name")
  }

  /** One-pass conditional-aggregation report over row-local rules. */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val aggs = count(lit(1)).as("n_rows") +:
      rules.map(r => sum(when(r.violated, 1L).otherwise(0L)).as(r.name))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = s"stack(${rules.size}, " +
      rules.map(r => s"'${r.name}', `${r.name}`").mkString(", ") +
      ") as (rule, n_violations)"
    one.select(col("n_rows"), expr(stackExpr))
      .select(col("rule"), col("n_violations"), col("n_rows"),
        (col("n_violations") === 0).as("pass"))
  }

  /** Key-uniqueness rule: violations = surplus rows beyond one per key. */
  def uniqueness(df: DataFrame, keyCol: String,
      ruleName: String = "unique_key"): DataFrame =
    df.agg(count(lit(1)).as("n_rows"),
        countDistinct(col(keyCol)).as("n_keys"))
      .select(lit(ruleName).as("rule"),
        (col("n_rows") - col("n_keys")).as("n_violations"),
        col("n_rows"),
        (col("n_rows") === col("n_keys")).as("pass"))

  /** Full gate: row-local rules + key uniqueness, one report frame. */
  def gate(df: DataFrame, rules: Seq[Rule], keyCol: String): DataFrame =
    report(df, rules).unionByName(uniqueness(df, keyCol))
}
