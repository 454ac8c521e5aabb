package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by the text-analysis and dedup
  * operators. Everything here is built from codegen'd Catalyst
  * expressions (split / higher-order functions / md5) — no Scala UDFs —
  * so the hot path stays inside whole-stage codegen.
  *
  * Cross-engine determinism notes (these functions are mirrored 1:1 in
  * the DuckDB oracle SQL):
  *  - `tokens`: split on whitespace runs, drop empties — the reference's
  *    `cin >>` / `str.split()` tokenization
  *    (`/root/reference/exampleCodes/word_count/mapper.cpp:23`).
  *  - `md5Int`: first 8 hex digits of md5 as a non-negative int64 —
  *    a portable 32-bit string hash both engines compute identically
  *    (Spark `conv(substring(md5 …))` ≡ DuckDB `('0x' || substr(md5 …))::BIGINT`).
  *  - `polyHash`: left-fold polynomial rolling hash; Spark `aggregate`
  *    and DuckDB `list_reduce` both fold left-to-right, so the result is
  *    bit-identical.
  */
object TextFns {

  /** Explicit ASCII whitespace class used for ALL tokenization, in Spark,
    * the generated-code tokenizers, the python pipe mapper, and the DuckDB
    * oracle SQL. Java's \s and RE2's \s disagree on \x0B (vertical tab)
    * and Python's str.split() adds Unicode spaces — an explicit class is
    * the only way all four agree. Matches C's isspace() set, i.e. the
    * reference's `cin >>` tokenization (word_count/mapper.cpp:23). */
  val WhitespaceRegex = "[ \\t\\n\\x0B\\f\\r]+"

  /** The DuckDB restatement of [[tokens]] over a column named `text` —
    * the ONE definition every oracle file derives its `tokSql` from
    * (six verbatim copies previously had to stay bit-identical by
    * hand). Must track [[WhitespaceRegex]] exactly. */
  val duckTokSql: String =
    """list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'), x -> x <> '')"""

  /** Whitespace tokenization with empty-token removal. */
  def tokens(text: Column): Column =
    filter(split(text, WhitespaceRegex), t => t =!= lit(""))

  /** Distinct word n-gram shingles (space-joined), for Jaccard/MinHash. */
  def shingles(toks: Column, n: Int): Column =
    array_distinct(
      when(size(toks) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n))))))

  /** Portable 32-bit string hash as int64: first 8 md5 hex digits. */
  def md5Int(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Polynomial rolling hash over the characters of `text`, mod 1e9+7.
    * Deterministic document fingerprint (same shape as Rabin-Karp).
    * Backed by the codegen'd PolyHash expression — the HOF formulation
    * (split('') + aggregate) builds a one-char-string array per row and
    * was the whole cost of the fingerprint query. */
  def polyHash(text: Column): Column =
    graft.plans.VectorFunctions.poly_hash(text)
}
