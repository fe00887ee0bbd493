package graft.compile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.spec._

/** Compiles a [[graft.spec.TableSpec]] into Catalyst expressions.
  *
  * Every rule becomes `when(!pred, struct(violation-fields))`; all rules of a
  * table are fused into ONE `select` over the scan, collected with
  * `array_compact(array(...))` and fanned out with `posexplode` — i.e. the
  * whole row-level rule set of the reference
  * (hepdata_validator/data_file_validator.py + jsonschema keyword checks) runs
  * as a single whole-stage-codegen pass, no UDFs, no second scan.
  *
  * Violation message grammar mirrors the reference's formatter
  * (hepdata_validator/__init__.py:159-182): `<jsonschema-style message> in
  * '<location>'`.
  */
object ConstraintCompiler {

  /** Render any column as a display string the way jsonschema reprs scalars:
    * strings quoted, null → None, numbers bare. */
  private def disp(c: Column): Column =
    when(c.isNull, lit("None")).otherwise(concat(lit("'"), c.cast("string"), lit("'")))

  private def dispNum(c: Column): Column =
    when(c.isNull, lit("None")).otherwise(c.cast("string"))

  /** Predicate that is TRUE when the rule passes (null-safe per rule). */
  def predicate(r: Rule): Column = r match {
    case NotNull(c, _)        => col(c).isNotNull
    case MatchesRegex(c, p)   => col(c).isNull || col(c).rlike(p)
    case InSet(c, vs)         => col(c).isNull || col(c).isin(vs: _*)
    case MaxLen(c, n)         => col(c).isNull || length(col(c)) <= n
    case MinValue(c, m)       => col(c).isNull || col(c) >= m
    case NumericString(c, allowPct) =>
      val stripped = if (allowPct) regexp_replace(col(c), "%$", "") else col(c)
      col(c).isNull || col(c) === "" || stripped.try_cast("double").isNotNull
    case EqualsExpr(c, e, _)  => col(c).isNull || col(c) === expr(e)
    case Between(c, lo, hi)   => col(c).isNull || (col(c) >= expr(lo) && col(c) <= expr(hi))
    case NotContains(c, n)    => col(c).isNull || !col(c).contains(n)
    case ExprRule(_, _, p, _, _) => expr(p)
  }

  /** Message expression, evaluated only on violating rows. */
  def message(r: Rule): Column = r match {
    case NotNull(c, t) =>
      concat(lit(s"None is not of type '$t' in '"), lit(c), lit("'"))
    case MatchesRegex(c, p) =>
      concat(disp(col(c)), lit(s" does not match '$p' in '$c'"))
    case InSet(c, vs) =>
      val set = vs.map(v => s"'$v'").mkString("[", ", ", "]")
      concat(disp(col(c)), lit(s" is not one of $set in '$c'"))
    case MaxLen(c, n) =>
      concat(disp(col(c)), lit(s" is too long (maxLength: $n) in '$c'"))
    case MinValue(c, m) =>
      val mStr = if (m == m.floor && m.abs < 1e15) m.toLong.toString else m.toString
      concat(dispNum(col(c)), lit(s" is less than the minimum of $mStr in '$c'"))
    case NumericString(c, _) =>
      concat(lit("Invalid value "), dispNum(col(c)),
        lit(s": value must be a number (possibly ending in %) in '$c'"))
    case EqualsExpr(c, _, label) =>
      concat(disp(col(c)), lit(s" does not equal $label in '$c'"))
    case Between(c, lo, hi) =>
      concat(disp(col(c)), lit(s" is not in range [$lo, $hi] in '$c'"))
    case NotContains(c, n) =>
      concat(disp(col(c)), lit(s" should not contain '$n' in '$c'"))
    case ExprRule(_, _, _, m, _) => expr(m)
  }

  /** One struct-or-null column per rule. */
  def violationColumns(spec: TableSpec): Seq[Column] =
    spec.rules.zipWithIndex.map { case (r, i) =>
      when(!coalesce(predicate(r), lit(false)), struct(
        lit(i).as("rule_seq"),
        lit(r.id).as("rule_id"),
        lit(r.column).as("column"),
        lit(r.level).as("level"),
        message(r).as("message")))
    }

  /** Row-level violations: one output row per (input row, failed rule).
    * Output: partition, key columns, rule_seq, rule_id, column, level,
    * message. Single scan; rows with no violations are filtered before the
    * explode so the fan-out only touches dirty rows. */
  def violations(spec: TableSpec, df: DataFrame): DataFrame = {
    val keep = (spec.partitionColumn +: spec.keyColumns).distinct.map(col)
    val packed = df
      .select(keep :+ array_compact(array(violationColumns(spec): _*)).as("_v"): _*)
      .where(size(col("_v")) > 0)
    packed
      .select(keep :+ explode(col("_v")).as("v"): _*)
      .select(keep ++ Seq(
        col("v.rule_seq"), col("v.rule_id"), col("v.column"),
        col("v.level"), col("v.message")): _*)
  }

  /** Per-row pass flag without materializing messages — used by the verdict
    * aggregation when the violation rows themselves aren't needed. */
  def rowPasses(spec: TableSpec): Column =
    spec.rules.map(r => coalesce(predicate(r), lit(false)))
      .reduceOption(_ && _).getOrElse(lit(true))

  /** Per-row count of FAILED error-level rules, without materializing
    * messages or exploding — the single-scan verdict input: aggregating
    * this by partition yields the universe AND the totals in ONE scan of
    * the fact table (see Passes.verdictsSingleScan). */
  def errorCount(spec: TableSpec): Column =
    spec.rules.filter(_.level == "error")
      .map(r => (!coalesce(predicate(r), lit(false))).cast("long"))
      .reduceOption(_ + _).getOrElse(lit(0L))
}
