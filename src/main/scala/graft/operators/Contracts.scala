package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-contract checks — the Deequ / Great Expectations pattern:
  * declare rules over a table, get back one row per rule with a
  * violation count and a pass flag. This is the gate a production
  * pipeline runs before publishing a release or admitting a new batch
  * into training data; it has no counterpart in the reference (which
  * trusts its inputs) but every 100 TB pipeline needs one.
  *
  * Rule algebra and its cost model:
  *  - ROW rules (`NotNull`, `InRange`, `Matches`, `Predicate`) are
  *    per-row predicates. ALL of them fold into ONE aggregate over a
  *    single scan — each rule is a conditional `sum`, so adding a rule
  *    adds a counter, not a job. No shuffle beyond the final one-row
  *    reduce (partial aggregation does the work map-side).
  *  - `Unique` costs one keyed aggregate on its column tuple (the
  *    standard exact-dedup shuffle; a duplicate row's whole group
  *    counts as violations so the metric is "rows that collide").
  *  - `ForeignKeyIn` costs one left join against the DISTINCT
  *    reference keys (AQE broadcasts small dimension key sets); a
  *    NULL key is a violation by definition — pair with `NotNull`
  *    when nulls are legal and should be exempt.
  *
  * Nothing ever collects more than the |rules|-row report; every rule
  * is a linear scan or one equi-keyed exchange, so the check suite
  * scales exactly like the table it audits.
  */
object Contracts {

  sealed trait Rule { def name: String }

  /** `column IS NOT NULL` on every row. */
  case class NotNull(column: String) extends Rule {
    def name: String = s"not_null($column)"
  }

  /** `lo <= column <= hi` (numeric, inclusive); NULL is a violation. */
  case class InRange(column: String, lo: Double, hi: Double) extends Rule {
    def name: String = s"in_range($column,$lo,$hi)"
  }

  /** `column RLIKE regex` anchored as given; NULL is a violation. */
  case class Matches(column: String, regex: String) extends Rule {
    def name: String = s"matches($column)"
  }

  /** Arbitrary row predicate under a caller-chosen rule name; rows
    * where the predicate is NULL or false count as violations.
    */
  case class Predicate(ruleName: String, predicate: Column) extends Rule {
    def name: String = s"predicate($ruleName)"
  }

  /** No two rows share this column tuple; every row of a colliding
    * group counts as a violation (so `violations = 0` iff the tuple
    * is a true key).
    */
  case class Unique(columns: Seq[String]) extends Rule {
    def name: String = s"unique(${columns.mkString(",")})"
  }

  /** Every value of `column` appears in `refCol` of the reference
    * table; NULL keys violate (they reference nothing).
    */
  case class ForeignKeyIn(column: String, ref: DataFrame, refCol: String)
      extends Rule {
    // the reference column is part of the identity: two FK rules on
    // the same column against different references must be
    // distinguishable in the report and in requireContract's message
    def name: String = s"fk($column->$refCol)"
  }

  private def rowViolation(r: Rule): Option[(String, Column)] = r match {
    case NotNull(c) => Some(r.name -> col(c).isNull)
    case InRange(c, lo, hi) => Some(r.name ->
      !(col(c).isNotNull && col(c) >= lo && col(c) <= hi))
    case Matches(c, re) => Some(r.name ->
      !(col(c).isNotNull && col(c).rlike(re)))
    case Predicate(_, p) => Some(r.name -> !coalesce(p, lit(false)))
    case _ => None
  }

  /** The one-pass aggregate for the row rules only — shared by
    * [[check]] and the streaming twin (it is a plain aggregation, so
    * it runs on a streaming DataFrame under complete output mode with
    * no extra state: Spark keeps exactly the |rules| running
    * counters). Output: (rule, checked, violations, pass), one row
    * per rule, rule-declaration order preserved via a leading index.
    */
  def checkRowRules(df: DataFrame, rules: Seq[Rule]): DataFrame =
    rowRuleReport(df, rules, Nil)
      .orderBy(col("__i")).drop("__i")

  /** Shared scaffolding for the two row-rule reports: the one-pass
    * counter fold, struct stacking, and report projection — grouped
    * and ungrouped forms differ ONLY in the grouping key.
    */
  private def rowRuleReport(
      df: DataFrame, rules: Seq[Rule],
      groupKeys: Seq[Column]): DataFrame = {
    val row = rules.flatMap(rowViolation)
    require(row.size == rules.size,
      "row-rule reports take row-local rules only (NotNull/InRange/" +
        "Matches/Predicate); use check() for Unique/ForeignKeyIn")
    requireDistinctNames(rules)
    val counters =
      count(lit(1)).as("__checked") +:
      row.zipWithIndex.map { case ((_, bad), i) =>
        sum(when(bad, 1L).otherwise(0L)).as(s"__v$i")
      }
    val agged =
      if (groupKeys.isEmpty) df.agg(counters.head, counters.tail: _*)
      else df.groupBy(groupKeys: _*).agg(counters.head, counters.tail: _*)
    val stacked = row.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(i).as("__i"), lit(name).as("rule"),
        col("__checked").as("checked"),
        coalesce(col(s"__v$i"), lit(0L)).as("violations"))
    }
    val keep = agged.columns
      .filterNot(c => c == "__checked" || c.startsWith("__v")).map(col)
    agged.select(keep :+ explode(array(stacked: _*)).as("__r"): _*)
      .select(keep ++ Seq(col("__r.__i").as("__i"),
        col("__r.rule").as("rule"), col("__r.checked").as("checked"),
        col("__r.violations").as("violations")): _*)
      .withColumn("pass", col("violations") === 0L)
  }

  private def requireDistinctNames(rules: Seq[Rule]): Unit = {
    val dup = rules.map(_.name).groupBy(identity)
      .collect { case (n, v) if v.size > 1 => n }
    require(dup.isEmpty,
      s"duplicate rule names: ${dup.mkString(", ")} — report rows and " +
        "failure messages would be indistinguishable")
  }

  /** Per-group row-rule report: (group, rule, checked, violations,
    * pass) — the per-source ingest gate ("which crawl feed broke the
    * contract"). Still ONE aggregate over one scan, keyed by the group
    * column; a null group is a REAL group (groupBy semantics). Group
    * cardinality bounds the report size, not the scan.
    */
  def checkRowRulesBy(
      df: DataFrame, groupCol: String, rules: Seq[Rule]): DataFrame =
    rowRuleReport(df, rules, Seq(col(groupCol).as("group")))
      .drop("__i")

  /** Full contract check: row rules in one pass, set rules as one
    * keyed job each, results unioned in rule-declaration order.
    * Output: (rule, checked, violations, pass).
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules given")
    requireDistinctNames(rules)
    val rowRules = rules.filter(rowViolation(_).isDefined)
    val rowPart =
      if (rowRules.nonEmpty) Seq(checkRowRules(df, rowRules)) else Nil
    val setParts = rules.flatMap {
      case u @ Unique(cols) =>
        Some(df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__n"))
          .agg(coalesce(sum(col("__n")), lit(0L)).as("checked"),
            coalesce(sum(when(col("__n") > 1, col("__n")).otherwise(0L)),
              lit(0L)).as("violations"))
          .select(lit(u.name).as("rule"), col("checked"),
            col("violations"), (col("violations") === 0L).as("pass")))
      case f @ ForeignKeyIn(c, ref, rc) =>
        val keys = ref.select(col(rc).as("__fk")).distinct()
          .withColumn("__hit", lit(1))
        Some(df.select(col(c).as("__fk")).join(keys, Seq("__fk"), "left")
          .agg(count(lit(1)).as("checked"),
            coalesce(sum(when(col("__hit").isNull, 1L).otherwise(0L)),
              lit(0L)).as("violations"))
          .select(lit(f.name).as("rule"), col("checked"),
            col("violations"), (col("violations") === 0L).as("pass")))
      case _ => None
    }
    // reassemble in rule-declaration order via a name→index literal map
    val order = typedLit(rules.map(_.name).zipWithIndex.toMap)
    (rowPart ++ setParts).reduce(_ unionByName _)
      .withColumn("__ord", element_at(order, col("rule")))
      .orderBy(col("__ord")).drop("__ord")
  }

  /** Hard gate: throw if any rule fails — the publish-blocking form.
    * The report is small (|rules| rows), so the collect is bounded.
    */
  def requireContract(df: DataFrame, rules: Seq[Rule]): Unit = {
    val bad = check(df, rules).filter(!col("pass"))
      .select(col("rule"), col("violations")).collect()
    require(bad.isEmpty, "contract violated: " + bad.map(r =>
      s"${r.getString(0)} (${r.getLong(1)} rows)").mkString("; "))
  }
}
