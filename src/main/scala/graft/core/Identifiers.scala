package graft.core

/** Identifier sanitation, ported behavior of the reference's
  * `_label_character_replacement` (`puffbird/frame.py:1113-1168`) and the
  * string branches of `_enforce_identifier_column_types`
  * (`puffbird/frame.py:1240-1325`). The tuple/Number branches don't apply
  * on Spark — column names are always strings.
  */
object Identifiers {

  /** Ordered replacement chain — order matters and matches the reference
    * exactly (e.g. `*` → `_X_` before `,` → `_COMMA_`).
    */
  private val Replacements: Seq[(String, String)] = Seq(
    "#" -> "_HASH_", "-" -> "_MINUS_", "+" -> "_PLUS_", "@" -> "_AT_",
    "(" -> "_OPEN_", ")" -> "_CLOSE_", " " -> "_", "\"" -> "", "'" -> "",
    "`" -> "", "%" -> "_PERCENT_", "$" -> "_DOLLAR_", "&" -> "_AND_",
    "*" -> "_X_", "," -> "_COMMA_", ";" -> "_SEMICOLON_", ":" -> "_COLON_",
    "." -> "_DOT_", "?" -> "_QUESTION_", "|" -> "_OR_", "~" -> "_CIRCA_",
    "[" -> "_OPEN_", "]" -> "_CLOSE_", "{" -> "_OPEN_", "}" -> "_CLOSE_",
    "!" -> "_EXCLAIM_")

  /** Note: the reference calls `label.strip('')` (`frame.py:1114-1116`),
    * which strips NOTHING (empty char set) — leading/trailing spaces
    * survive and become underscores via the `' '→'_'` rule below, so
    * `" a"` sanitizes to `"_a"`, not `"a"`.
    */
  def replaceCharacters(label: String): String =
    Replacements.foldLeft(label) { case (s, (from, to)) =>
      s.replace(from, to)
    }

  /** Sanitize a data column name: digit-only names get a `data_col_`
    * prefix (`puffbird/frame.py:1261-1265`), everything else goes through
    * the replacement chain.
    */
  def sanitizeDatacol(name: String): String =
    if (name.nonEmpty && name.forall(_.isDigit)) s"data_col_$name"
    else replaceCharacters(name)

  /** Sanitize an index column name (`index_col_` prefix for digit-only,
    * `puffbird/frame.py:1300-1304`).
    */
  def sanitizeIndexcol(name: String): String =
    if (name.nonEmpty && name.forall(_.isDigit)) s"index_col_$name"
    else replaceCharacters(name)
}
