package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, regexp_extract_all, size, split, udf}

/** THE TOKENIZER BOUNDARY — the [[graft.multimodal.Decoder]] seam for
  * token-counting operators: everything that prices text in tokens
  * (t1's counts, t11's packing bins, a12's budget admission, ST28's
  * live gate) consumes a `Tokenizer`, so a deployment swaps in its real
  * BPE (vocab + merges as a JVM function) without touching the
  * operators — batching, windows, budget arithmetic, and exactly-once
  * state are owned by the operators, never by the tokenizer.
  *
  * The shipped tokenizers override [[tokenizeCol]] with NATIVE
  * expressions (codegen'd, no UDF in the hot path); [[FnTokenizer]] is
  * the arbitrary-kernel escape hatch and the only UDF-paying form —
  * exactly the Decoder contract (`TokenizerSpec` proves an injected
  * kernel flows through packing and budget admission end to end).
  * Must be Serializable: instances ship to executors inside closures.
  */
trait Tokenizer extends Serializable {
  /** Token array of a text column — override with native expressions
    * when the tokenization is expression-expressible.
    */
  def tokenizeCol(text: Column): Column

  /** Token count (long) of a text column — what the budget/packing
    * operators consume; the default counts [[tokenizeCol]].
    */
  def countCol(text: Column): Column = size(tokenizeCol(text)).cast("long")
}

/** Whitespace tokens (the corpus is single-space separated) — the
  * default everywhere, identical to the pre-seam behavior.
  */
object WhitespaceTokenizer extends Tokenizer {
  override def tokenizeCol(text: Column): Column = split(text, " ")
}

/** The BPE-ish regex pre-tokenizer (runs/digits/punct — t1's
  * `n_bpe_tokens` family), still fully native.
  */
object RegexBpeTokenizer extends Tokenizer {
  override def tokenizeCol(text: Column): Column =
    regexp_extract_all(text, lit("([a-z]+|[0-9]+|[^a-z0-9 ])"), lit(1))
}

/** Arbitrary JVM tokenizer kernel (a real BPE: vocab + merges) wrapped
  * for the operators. Pays one scala-UDF call per row — the price of an
  * arbitrary kernel; production BPEs are exactly this shape.
  */
final class FnTokenizer(f: String => Seq[String]) extends Tokenizer {
  override def tokenizeCol(text: Column): Column = {
    val u = udf((s: String) => if (s == null) Seq.empty[String] else f(s))
    u(text)
  }
}
