package graft.spec

/** Declarative constraint spec — the engine's replacement for the JSON Schema
  * subset the reference actually exercises (see SURVEY.md §2.2/2.3).
  *
  * Each rule is compiled by [[graft.compile.ConstraintCompiler]] into a single
  * Catalyst predicate + message expression; all rules of a table evaluate in
  * ONE distributed scan (whole-stage codegen, no UDFs). This deliberately does
  * NOT re-implement jsonschema's interpreter loop
  * (reference: hepdata_validator/__init__.py:97-122) — the spec is the IR.
  */
sealed trait Rule {
  /** stable rule identifier, used in violation rows and ordering */
  def id: String
  /** column the rule targets (for the violation's `column` field) */
  def column: String
  /** reference levels: error | hint (hepdata_validator/__init__.py:66) */
  def level: String = "error"
}

/** P2/P11 — `required` / null rejection.
  * ref: data_schema.json required lists; golden msg
  * "None is not of type 'string'" (test_submission_validator.py:186-188). */
final case class NotNull(column: String, typeName: String = "string")
    extends Rule { def id = s"not_null:$column" }

/** P6 — `pattern`: value must match an (unanchored, re-style) regex.
  * ref: submission_schema.json:51 DOI pattern. */
final case class MatchesRegex(column: String, pattern: String) extends Rule {
  def id = s"regex:$column"
}

/** P5 — `enum` membership. ref: submission_schema.json:16. */
final case class InSet(column: String, values: Seq[String]) extends Rule {
  def id = s"enum:$column"
}

/** P4 — `maxLength`. ref: submission_schema.json:8,16,19. */
final case class MaxLen(column: String, n: Int) extends Rule {
  def id = s"max_length:$column"
}

/** P7 — `minimum` on a numeric column. ref: additional_info_schema.json:59. */
final case class MinValue(column: String, min: Double) extends Rule {
  def id = s"minimum:$column"
}

/** P1/F1 — union string|number carrier must parse as a number once a '%'
  * suffix is stripped; empty string allowed.
  * ref: data_file_validator.py:312-332 (convert_to_float). */
final case class NumericString(column: String, allowPercent: Boolean = true)
    extends Rule { def id = s"numeric:$column" }

/** Column value must equal another column's derived value — used for the
  * n_chars == length(text) style consistency checks. */
final case class EqualsExpr(column: String, sqlExpr: String, exprLabel: String)
    extends Rule { def id = s"equals:$column" }

/** Timestamp/numeric range check (warc_ts within crawl window). */
final case class Between(column: String, lo: String, hi: String) extends Rule {
  def id = s"between:$column"
}

/** F7 — string must not contain a character ('/' in data_file names).
  * ref: full_submission_validator.py:296-301. */
final case class NotContains(column: String, needle: String) extends Rule {
  def id = s"not_contains:$column"
}

/** Escape hatch: arbitrary SQL predicate over the row; violation when the
  * predicate is FALSE. `messageSql` is a SQL expression producing the
  * message string (may reference row columns). */
final case class ExprRule(
    id: String,
    column: String,
    predicateSql: String,
    messageSql: String,
    override val level: String = "error")
    extends Rule

/** A table's row-level spec. Aggregate-shaped checks (uniqueness,
  * referential, stats, drift) are separate passes — see graft.engine. */
final case class TableSpec(
    table: String,
    /** column identifying the verdict granularity (reference: per-file
      * message map, __init__.py:203-219); here: partition id column. */
    partitionColumn: String,
    /** column(s) identifying a row in violation output (e.g. url). */
    keyColumns: Seq[String],
    rules: Seq[Rule])
