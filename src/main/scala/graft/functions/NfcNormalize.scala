package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonical normalization as a native codegen'd expression.
  *
  * Why it exists: every hash-keyed stage in this engine (exact dedup
  * q35/q133, URL dedup q167, decontamination grams, MinHash shingles)
  * keys on BYTES of text — and the same visible string arrives from real
  * crawls in composed (`é` U+00E9) and decomposed (`e`+U+0301) forms,
  * which hash differently and silently survive dedup as "distinct"
  * documents. CCNet/RefinedWeb normalize before hashing for exactly this
  * reason. Spark has no built-in normalizer, and a Scala UDF here would
  * sit on the hottest path in the engine (upstream of every text hash),
  * so this is a proper `UnaryExpression` with `doGenCode` — codegen'd
  * like the other custom functions, SQL-registered as `nfc_normalize`
  * (matching DuckDB's built-in of the same name, which the oracles
  * replay).
  *
  * Fast path: `Normalizer.isNormalized` is a scan without allocation —
  * ASCII (the overwhelming majority of crawl bytes) returns the INPUT
  * UTF8String untouched, so the common case costs one pass and zero
  * copies. Only strings that actually need composing pay the
  * String round-trip.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** NFC form of `s`; returns `s` itself (no copy) when already NFC. */
  def compute(s: UTF8String): UTF8String = {
    // pure-ASCII fast path WITHOUT the String round-trip: numBytes ==
    // numChars iff every code point is single-byte UTF-8 (ASCII), and
    // ASCII is always NFC — the overwhelmingly common crawl row pays one
    // byte scan and zero allocation (code-review r14: the toString-first
    // version allocated a String per row before isNormalized ran)
    if (s.numBytes == s.numChars) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  def apply(c: Column): Column = columnOf(new NfcNormalize(expressionOf(c)))
}
