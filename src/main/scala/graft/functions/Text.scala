package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The canonical word tokenizer shared by every text operator AND their
  * DuckDB oracles (q29/q30/q33, q52, q59-q64, decontamination). One
  * definition: the pattern's semantics are identical in Java regex (Spark)
  * and RE2 (DuckDB), which is what keeps the operators oracle-checkable —
  * and having it in one place means a tokenizer change moves the Spark
  * side, the SQL oracles (interpolated from [[wordPat]]), and the dedup
  * kernels together. (SimHash deliberately uses its own `[a-z0-9]+`
  * alphanumeric tokenizer — fingerprints want digits; that is a different
  * tokenizer, not a drifted copy of this one.)
  */
object Text {

  /** Lowercase word pattern — interpolate into oracle SQL as
    * `regexp_extract_all(lower(x), '$wordPat')`. */
  val wordPat: String = "[a-z]+"

  /** Lowercase word tokens of `c` as `array<string>` — the codegen
    * [[TokenizeWords]] scanner, bit-identical to
    * `regexp_extract_all(lower(c), '[a-z]+')` (pure-ASCII fast path;
    * literal lower+regex fallback on any non-ASCII string), which remains
    * what the interpolated DuckDB oracles compute. */
  def tokens(c: Column): Column = TokenizeWords(c)

  /** The regex form [[tokens]] replaces — kept as the differential
    * reference for TokenizeSpec. */
  def tokensRegex(c: Column): Column =
    regexp_extract_all(lower(c), lit(wordPat), lit(0))
}
