package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared columnar text/hash primitives for the LLM-pipeline operators.
  *
  * All pure `org.apache.spark.sql.functions` compositions (codegen'd, no
  * UDFs) so they stay inside WholeStageCodegen at 100 TB scale. The
  * tokenizer is the engine-wide port of the reference's map-UDF tokenizer
  * (yamr map_libs/word_count.py:16-20: regex `\w+` findall → strip `,.` →
  * lower → drop empty; the strip is a no-op after `\w+`).
  */
object TextFunctions {

  /** Lowercased word tokens; empty strings (from leading separators)
    * removed. ASCII `\W` split — identical semantics in Java regex (Spark)
    * and RE2 (DuckDB oracle). `array_remove` rather than a filter lambda:
    * same result (split yields no nulls, so dropping ""-equal elements IS
    * the filter), but ArrayRemove is a native codegen'd expression while
    * HigherOrderFunction lambdas are interpreted per row.
    */
  def tokens(text: Column): Column =
    array_remove(split(lower(text), "\\W+"), "")

  /** Whitespace-normalized text: lower, collapse runs, trim. */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Dedup-canonical normalization (the CCNet-shaped pre-dedup
    * transform): lower → ALL whitespace to single spaces (a tab/newline
    * between words must not glue them together when punctuation is
    * stripped) → drop everything but Unicode letters and spaces
    * (`[^\p{L} ]`) → collapse space runs → trim. Case, punctuation,
    * digit and whitespace variants of the same content map to one
    * canonical string. Keeping `\p{L}` (not `[a-z]`) matters on a
    * multilingual corpus: an ASCII-only class canonicalizes every
    * non-Latin document to the EMPTY string and a downstream dedup
    * would collapse them all into one group (ADVICE r10). `\p{L}` is
    * the Unicode letter category in both Java regex (Spark) and
    * DuckDB's RE2 (oracles pass the 'g' flag; Spark replaces all
    * matches by default).
    */
  def dedupNormalized(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(regexp_replace(lower(text), "\\s+", " "), "[^\\p{L} ]", ""),
      " +", " "))

  /** Stable 60-bit content hash derived from md5 (identical hex in every
    * engine): the top 60 bits of the digest == the first 15 hex chars
    * parsed base-16. Native codegen'd expression ([[Md5Hash60]]); the
    * column-function form `conv(substring(md5(s),1,15),16,10)` is kept in
    * [[hash60Reference]] and asserted equal in tests — DuckDB oracles
    * reproduce the value via the hex form.
    */
  def hash60(s: Column): Column = Md5Hash60(s)

  /** Pure-builtin form of [[hash60]] (equivalence oracle for tests). */
  def hash60Reference(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** Seeded variant: family of hash functions h_i(s) = hash60(i || ':' || s). */
  def hash60Seeded(seed: Column, s: Column): Column =
    hash60(concat(seed.cast("string"), lit(":"), s))

  /** Distinct word w-shingles (default w=3) of the token array, or empty
    * array when the document has fewer than w tokens. Native codegen'd
    * expression ([[WordShingles]]) — the sequence/transform/concat_ws/
    * array_distinct composition it replaced evaluated three interpreted
    * lambdas per shingle per row on the dedup hot path; the reference
    * composition is kept in [[shinglesReference]] and asserted
    * bit-identical in tests.
    */
  def shingles(toks: Column, w: Int = 3): Column = WordShingles(toks, w)

  /** Pure-builtin form of [[shingles]] (equivalence oracle for tests). */
  def shinglesReference(toks: Column, w: Int = 3): Column = {
    val idx = sequence(lit(1), size(toks) - lit(w - 1))
    val grams = transform(idx, j =>
      concat_ws(" ", (0 until w).map(o => element_at(toks, j + lit(o))): _*))
    when(size(toks) >= w, array_distinct(grams)).otherwise(array().cast("array<string>"))
  }

  /** Number of word tokens. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword token estimate: letter runs, digit runs, and single
    * punctuation marks each count as one token (a cheap deterministic
    * stand-in for a real BPE vocab; same regex semantics in RE2).
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Polynomial rolling hash over the characters of the normalized text:
    * fold(chars, 0, (a, ch) => (a*31 + codepoint(ch)) mod 1e9+7).
    * Mirrors DuckDB `list_reduce(list_prepend(0, codes), ...)`.
    */
  def rollingFingerprint(text: Column): Column = {
    val chars = filter(split(normalized(text), ""), c => c =!= "")
    aggregate(chars, lit(0L),
      (acc, ch) => (acc * lit(31L) + ascii(ch).cast("long")) % lit(1000000007L))
  }
}
