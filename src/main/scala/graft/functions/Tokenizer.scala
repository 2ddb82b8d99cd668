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

/** A REAL BPE behind the seam — the byte-pair-encoding algorithm of
  * Sennrich et al. 2016 (the GPT-2-family shape): a word starts as its
  * character sequence and the highest-priority adjacent pair (lowest
  * merge rank) merges everywhere, repeatedly, until no ranked pair
  * remains; the merges table IS the model. This is the deployable form
  * of the seam: load a standard `merges.txt` (one `left right` pair per
  * line, priority = line order), BROADCAST the ranks once, and every
  * token-pricing operator (t1 counts, t11 packing, a12 budget
  * admission, ST28's live gate) prices with the real vocabulary —
  * executors hold ONE shared copy of the table, not one per task
  * closure.
  *
  * Pre-tokenization is whitespace by default (the corpus contract);
  * merges are word-internal. Unknown characters pass through as
  * single-character tokens (count-stable — a pricing tokenizer must
  * never drop text). `byteLevel = true` switches to the GPT-2-family
  * deployment shape instead: the standard GPT-2 pre-tokenizer regex
  * (contractions, letter/number runs with ONE attached leading space,
  * punctuation runs, trailing-whitespace splitting) followed by the
  * byte→unicode alphabet remap, so a real released `merges.txt`
  * (whose symbols live in that remapped alphabet — `Ġ` for space, `Ċ`
  * for newline) prices text exactly as the deployment it came from.
  */
final class BpeTokenizer(
    ranks: org.apache.spark.broadcast.Broadcast[Map[(String, String), Int]],
    byteLevel: Boolean = false)
    extends Tokenizer {
  override def tokenizeCol(text: Column): Column = {
    val u = udf((s: String) =>
      if (s == null) Seq.empty[String]
      else if (byteLevel) BpeTokenizer.encodeGpt2(s, ranks.value)
      else BpeTokenizer.encode(s, ranks.value))
    u(text)
  }
}

object BpeTokenizer {
  /** Build from merge lines (`left right` per line, priority = order;
    * `#`-prefixed header lines and blanks skipped — the merges.txt
    * convention).
    */
  def fromMerges(spark: org.apache.spark.sql.SparkSession,
      lines: Seq[String], byteLevel: Boolean = false): BpeTokenizer = {
    val ranks = lines.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .zipWithIndex.flatMap { case (l, i) =>
        l.split("\\s+") match {
          case Array(a, b) => Some((a, b) -> i)
          case _ => None
        }
      }.toMap
    require(ranks.nonEmpty, "empty merges table")
    new BpeTokenizer(spark.sparkContext.broadcast(ranks), byteLevel)
  }

  /** Load a merges file from any Hadoop-visible path. A released
    * GPT-2-family `merges.txt` wants `byteLevel = true` (its symbols
    * live in the byte→unicode alphabet).
    */
  def fromMergesFile(spark: org.apache.spark.sql.SparkSession,
      path: String, byteLevel: Boolean = false): BpeTokenizer = {
    val p = new org.apache.hadoop.fs.Path(path)
    val in = p.getFileSystem(spark.sparkContext.hadoopConfiguration).open(p)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    fromMerges(spark, lines, byteLevel)
  }

  // precompiled: encode runs once per ROW in the pricing UDFs — a
  // per-call Pattern.compile would be pure hot-path overhead
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** Whitespace pre-tokenize (ALL whitespace, not just spaces — a
    * tab/newline embedded in a "word" would skew every token price),
    * then BPE each word.
    */
  def encode(text: String, ranks: Map[(String, String), Int]): Seq[String] =
    Ws.split(text).toSeq.filter(_.nonEmpty)
      .flatMap(encodeWord(_, ranks))

  // The standard GPT-2 pre-tokenizer (radford et al. 2019 / the
  // huggingface ByteLevel pre-tokenizer): contractions bind to the
  // apostrophe, a letter/number/punct run carries AT MOST ONE leading
  // space, and `\s+(?!\S)` peels inter-token whitespace runs so the
  // last whitespace char stays attached to the following word.
  // UNICODE_CHARACTER_CLASS: \s/\p{L}/\p{N} must be unicode-aware like
  // the python `regex` module the deployment tokenizers use.
  private val Gpt2Pre = java.util.regex.Pattern.compile(
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+" +
      "|\\s+(?!\\S)|\\s+",
    java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  /** GPT-2's byte→unicode remap: the 188 printable latin-1 bytes map to
    * themselves; the other 68 (controls, space, DEL, 0xAD, …) map to
    * U+0100+n in discovery order — a bijection onto printable chars so
    * every byte sequence round-trips through `merges.txt`'s string
    * alphabet (space → `Ġ` U+0120, newline → `Ċ` U+010A).
    */
  private[functions] val byteToUnicode: Array[Char] = {
    val out = new Array[Char](256)
    val printable = (('!' to '~') ++ ('¡' to '¬') ++
      ('®' to 'ÿ')).map(_.toInt).toSet
    var next = 256
    var b = 0
    while (b < 256) {
      if (printable(b)) out(b) = b.toChar
      else { out(b) = next.toChar; next += 1 }
      b += 1
    }
    out
  }

  /** GPT-2 byte-level encode: regex pre-tokenize, UTF-8 each piece,
    * remap every byte into the merges alphabet, BPE the remapped
    * string. Whitespace is DATA here (priced as `Ġ`/`Ċ` symbols), so
    * token counts match the released deployments that published the
    * merges table — the whole point of byte-level pricing.
    */
  def encodeGpt2(text: String,
      ranks: Map[(String, String), Int]): Seq[String] = {
    val m = Gpt2Pre.matcher(text)
    val out = Seq.newBuilder[String]
    while (m.find()) {
      val bytes = m.group().getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val mapped = new Array[Char](bytes.length)
      var i = 0
      while (i < bytes.length) {
        mapped(i) = byteToUnicode(bytes(i) & 0xff)
        i += 1
      }
      out ++= encodeWord(new String(mapped), ranks)
    }
    out.result()
  }

  /** The pre-tokenizer split alone (pre-remap) — what the spec pins
    * against hand-computed GPT-2 splits, and a calibration hook for
    * anyone validating a vocab pack against a known tokenization.
    */
  def gpt2Pieces(text: String): Seq[String] = {
    val m = Gpt2Pre.matcher(text)
    val out = Seq.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  /** Greedy rank-order merging: repeatedly find the adjacent pair with
    * the LOWEST rank and merge every occurrence, until no pair ranks.
    * Words are short; the quadratic-worst-case loop is fine per word.
    */
  private[functions] def encodeWord(word: String,
      ranks: Map[(String, String), Int]): Seq[String] = {
    if (word.isEmpty) return Nil
    var symbols: Vector[String] = word.map(_.toString).toVector
    while (symbols.length > 1) {
      var bestRank = Int.MaxValue
      var best: (String, String) = null
      var i = 0
      while (i < symbols.length - 1) {
        val r = ranks.getOrElse((symbols(i), symbols(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (symbols(i), symbols(i + 1)) }
        i += 1
      }
      if (best == null) return symbols
      val out = Vector.newBuilder[String]
      var j = 0
      while (j < symbols.length) {
        if (j < symbols.length - 1 &&
            symbols(j) == best._1 && symbols(j + 1) == best._2) {
          out += best._1 + best._2
          j += 2
        } else {
          out += symbols(j)
          j += 1
        }
      }
      symbols = out.result()
    }
    symbols
  }
}
