package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._

/** Shared column builders for the LLM-pipeline operators, plus the DuckDB
  * SQL spellings of the same arithmetic.
  *
  * Everything here follows one rule: the math must be *portable* — exactly
  * re-expressible in DuckDB SQL so the driver's oracle can recompute it.
  * That means pure integer arithmetic (no engine hash functions, no float
  * accumulation ambiguity) on a prime field mod P = 2^31 - 1. Products stay
  * under 2^63 (P² ≈ 4.6e18), so everything fits in BIGINT on both engines.
  *
  * Hot-path builders delegate to the native expressions in
  * Expressions.scala ([[graft.functions.MinHashSigExpr]],
  * [[graft.functions.DotProductExpr]], …) — identical arithmetic, ~50×
  * faster than the interpreted higher-order-function formulation; the
  * lightweight token-level helpers stay as Catalyst HOFs.
  */
package object functions {

  /** Prime modulus for all portable hashing (2^31 - 1, Mersenne). */
  val P: Long = PortableHash.P

  /** Word-level combine base for shingles. */
  val ShingleBase: Long = PortableHash.ShingleBase

  private def native(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    GraftColumnBridge.column(e)
  private def ex(c: Column) = GraftColumnBridge.expression(c)

  /** Session-conf-driven scale knob with a pinned default. The DuckDB
    * oracles are static SQL built from the DEFAULTS, so the driver's
    * correctness gate always runs the default geometry; a deployment
    * re-tunes via conf (e.g. `spark.graft.lsh.planes` ≈ log₂(n/bucket
    * target) at production corpus sizes) without touching operator code.
    */
  def confInt(spark: org.apache.spark.sql.SparkSession, key: String,
      dflt: Int): Int =
    try spark.conf.get(key, dflt.toString).toInt
    catch { case _: Exception => dflt }

  /** [[confInt]] for long-valued knobs (row-count bounds). */
  def confLong(spark: org.apache.spark.sql.SparkSession, key: String,
      dflt: Long): Long =
    try spark.conf.get(key, dflt.toString).toLong
    catch { case _: Exception => dflt }

  /** WIDEN-BEFORE-AMPLIFY (round 18; optimization guide §2.2/§2.5): a
    * CPU-amplifying stage — a generator exploding ×10²–10³ rows per input
    * row (edit-dedup variant neighborhoods, LSH band/bucket explodes,
    * bigram windows) or a per-row compute doing 10³+ ops per input byte
    * (128-perm MinHash, hyperplane dot products, payload decoders) —
    * inherits its task count from its INPUT's partitioning. A compact
    * frame scanned from a few parquet splits therefore runs the whole
    * amplification on a handful of cores regardless of cluster width
    * (measured at sf0.1: d17's ~1.4k-row/doc variant explode was ONE
    * 12.6 s task in a 14 s query; the same mechanism is the sf10 "join
    * stage collapsed to 3–4 cores" straggler class — scan width tracks
    * input BYTES, which amplification makes a lie).
    *
    * Fix: round-robin repartition the compact frame to the session
    * shuffle width first. No-op when the frame is already at least that
    * wide — at big inputs scan width grows with the data, so this never
    * adds a shuffle at scale; when it does fire, it moves only the
    * PRE-amplification rows (≤ 1/amplification of the bytes the next
    * exchange moves anyway). Call it only on exchange-free frames
    * (scan/projection/pinned): `.rdd` on a plan that already contains
    * exchanges would trigger AQE stage execution at plan time.
    */
  def widen(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions >= n) df else df.repartition(n)
  }

  // ------------------------------------------------------------ Spark side

  /** Epoch microseconds of a TIMESTAMP or TIMESTAMP_NTZ column. Spark 4
    * infers parquet micros written with isAdjustedToUTC=false (pandas/
    * pyarrow's default) as TIMESTAMP_NTZ, which `unix_micros` rejects with
    * DATATYPE_MISMATCH; the cast localizes NTZ in the session timezone
    * (pinned UTC in every graft session) — the same reading DuckDB's
    * epoch_us applies to the identical naive micros — and is a no-op for
    * an already-LTZ column, so the helper is type-agnostic.
    */
  def epochUs(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** Epoch milliseconds; see [[epochUs]] for the NTZ contract. */
  def epochMs(c: Column): Column = unix_millis(c.cast("timestamp"))

  /** Polynomial char-fold hash of a string column: fold(h*31 + code(c)) mod P. */
  def charFoldHash(c: Column): Column = native(CharFoldExpr(ex(c)))

  /** Whitespace tokens (the corpus is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Per-token portable hashes, order-preserving (with multiplicity). */
  def tokenHashes(text: Column): Column =
    transform(tokens(text), t => charFoldHash(t))

  /** Distinct word-3-gram shingle hashes (combine consecutive token hashes
    * in the prime field).
    */
  def shingleHashes(text: Column): Column = native(ShingleHashesExpr(ex(text)))

  /** Distinct word-3-gram shingles as strings ("w1 w2 w3"). */
  def stringShingles(text: Column): Column = native(StringShinglesExpr(ex(text)))

  /** MinHash signature: for perm i, min over shingles s of (a_i·s+b_i) mod P. */
  def minHashSignature(shingles: Column, n: Int): Column =
    native(MinHashSigExpr(ex(shingles), n))

  /** SimHash bit vector over token hashes with multiplicity. */
  def simHashBits(text: Column, nBits: Int): Column =
    native(SimHashBitsExpr(ex(text), nBits))

  /** Hamming distance between two equal-length long arrays. */
  def hamming(a: Column, b: Column): Column = native(HammingExpr(ex(a), ex(b)))

  /** Sequential-fold dot product (index order — matches DuckDB bitwise). */
  def dot(a: Column, b: Column): Column = native(DotProductExpr(ex(a), ex(b)))

  /** size(array_intersect(a, b)) for SORTED distinct bigint arrays — one
    * codegen'd merge scan, no per-row hash set.
    */
  def sortedIntersectCount(a: Column, b: Column): Column =
    native(SortedIntersectCountExpr(ex(a), ex(b)))

  /** element_at(array_intersect(a, b), 1) for SORTED distinct bigint
    * arrays (null when disjoint) — first hit of the merge scan.
    */
  def sortedIntersectHead(a: Column, b: Column): Column =
    native(SortedIntersectHeadExpr(ex(a), ex(b)))

  /** Any pairwise collision among the first n entries of two bigint
    * arrays — the LSH first-colliding-table check, one codegen'd loop.
    */
  def prefixCollide(a: Column, b: Column, n: Column): Column =
    native(PrefixCollideExpr(ex(a), ex(b), ex(n)))

  /** Σ bit_count(a[i] xor b[i]) — bit-level hamming over long arrays. */
  def bitHamming(a: Column, b: Column): Column =
    native(BitHammingExpr(ex(a), ex(b)))

  /** Cosine similarity of two double-array columns. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))

  /** Random-hyperplane LSH bucket: Σ_j [dot(plane_{off+j}, v) ≥ 0] · 2^j
    * with plane(g,i) = ((g·dim+i)·2654435761 mod 2^32) / 2^31 − 1.
    */
  def hyperplaneBucket(v: Column, nPlanes: Int, dim: Int, planeOffset: Int = 0,
      scrambled: Boolean = false): Column =
    native(HyperplaneBucketExpr(ex(v), nPlanes, dim, planeOffset, scrambled))

  /** Interleaved-bit z-value (Morton code) of long-valued columns already
    * scaled to [0, 2^bits) — see [[ZValueExpr]].
    */
  def zvalue(bits: Int, cols: Column*): Column =
    native(ZValueExpr(cols.map(c => ex(c.cast("long"))), bits))

  /** Deterministic SAMPLING bucket in [0, buckets): charFold then Knuth
    * multiplicative scrambling before the modulo. The raw polynomial fold
    * is fine as an identity hash but badly non-uniform mod small bases
    * when inputs share a prefix and differ in a few trailing digits
    * (consecutive ids land in consecutive residues) — the scramble
    * decorrelates it, measured within ~2% of the target rate on the
    * corpus keys. Product < 2^62, exact in BIGINT on both engines.
    */
  def hashBucket(c: Column, buckets: Int): Column =
    (charFoldHash(c) * lit(2654435761L)) % lit(4294967296L) % buckets

  // ------------------------------------------------------------ DuckDB side

  /** DuckDB spelling of [[charFoldHash]] applied to SQL expression `e`. */
  def sqlCharFold(e: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($e, ''), c -> CAST(unicode(c) AS BIGINT))), " +
      s"(h, c) -> (h * 31 + c) % $P)"

  /** DuckDB spelling of [[zvalue]] over SQL expressions (bit i of expr k →
    * position i·n + k, same mapping as ZValueExpr).
    */
  def sqlZValue(bits: Int, cols: Seq[String]): String = {
    val n = cols.size
    val terms = cols.zipWithIndex.map { case (c, k) =>
      s"list_sum([((($c) >> i) & 1) << (i*$n + $k) for i in range($bits)])"
    }
    s"CAST(${terms.mkString(" + ")} AS BIGINT)"
  }

  /** DuckDB spelling of [[hashBucket]]. */
  def sqlHashBucket(e: String, buckets: Int): String =
    s"${sqlCharFold(e)} * 2654435761 % 4294967296 % $buckets"

  /** DuckDB: list of portable token hashes of text expression `e`. */
  def sqlTokenHashes(e: String): String =
    s"list_transform(string_split($e, ' '), t -> ${sqlCharFold("t")})"

  /** DuckDB: distinct shingle hashes from a token-hash list expression. */
  def sqlShingles(ths: String): String =
    s"list_distinct([(($ths[k+1] * $ShingleBase + $ths[k+2]) % $P * $ShingleBase " +
      s"+ $ths[k+3]) % $P for k in range(len($ths) - 2)])"

  /** DuckDB spelling of the multi-table [[hyperplaneBucket]] family: a list
    * whose entry t is the bucket of planes [base+t·k, base+(t+1)·k) of a
    * DOUBLE[] expression `v` (plane index = base + t·k + jj — same
    * arithmetic as HyperplaneBucketExpr with planeOffset = base + t·k).
    */
  def sqlHyperplaneBuckets(v: String, nTables: Int, planesPerTable: Int, dim: Int,
      planeBase: Int = 0, scrambled: Boolean = false): String = {
    val lin = s"(($planeBase+t*$planesPerTable+jj)*$dim + i) * 2654435761 % 4294967296"
    val s1 = s"xor($lin, ($lin) >> 13) * 40503 % 4294967296"
    val plane =
      if (!scrambled) lin
      else s"xor($s1, ($s1) >> 17)"
    s"""[list_reduce(list_prepend(CAST(0 AS BIGINT), [CASE WHEN
       | list_sum([$v[i+1] * (CAST($plane AS DOUBLE)
       |   / 2147483648.0 - 1.0) for i in range($dim)]) >= 0
       | THEN CAST(2 ** jj AS BIGINT) ELSE 0 END for jj in range($planesPerTable)]),
       | (a, x) -> a + x) for t in range($nTables)]""".stripMargin.replaceAll("\n", " ")
  }
}
