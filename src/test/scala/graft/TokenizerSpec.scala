package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{BpeTokenizer, FnTokenizer, RegexBpeTokenizer,
  WhitespaceTokenizer}

/** The Tokenizer boundary (the Decoder seam for token-priced operators):
  * default ≡ pre-seam behavior, a kernel-function tokenizer matches its
  * native twin, and injected counts flow through t11 packing and
  * a12/ST28 budget admission end to end.
  */
class TokenizerSpec extends GraftSuite {

  test("default tokenizer reproduces the oracle-pinned surface; FnTokenizer kernel ≡ native twin") {
    val t11Default = text.TextOps.t11SeqPacking(spark, sf)
    val t11Seam = text.TextOps.t11SeqPackingWith(spark, sf, WhitespaceTokenizer)
    assert(t11Default.exceptAll(t11Seam).isEmpty &&
      t11Seam.exceptAll(t11Default).isEmpty)
    // an arbitrary JVM kernel computing the same tokenization must agree
    // exactly with the native expression path (UDF seam ≡ codegen seam)
    val kernel = new FnTokenizer(s => s.split(" ", -1).toSeq)
    val viaKernel = text.TextOps.t11SeqPackingWith(spark, sf, kernel)
    assert(t11Default.exceptAll(viaKernel).isEmpty &&
      viaKernel.exceptAll(t11Default).isEmpty,
      "FnTokenizer(whitespace) must equal the native WhitespaceTokenizer")
    val a12Default = ops.Sampling.a12TokenBudgetMix(spark, sf)
    val a12Kernel = ops.Sampling.a12TokenBudgetMixWith(spark, sf, kernel)
    assert(a12Default.exceptAll(a12Kernel).isEmpty &&
      a12Kernel.exceptAll(a12Default).isEmpty)
  }

  test("injected tokenizer counts flow through t11 packing bins") {
    // a 'BPE' pricing text ~per-4-chars: different counts => different
    // bins, recomputed independently here from the injected counts
    val bpe = new FnTokenizer(s => s.grouped(4).toSeq)
    val got = text.TextOps.t11SeqPackingWith(spark, sf, bpe)
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val want = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("source"),
        // grouped(4) yields ceil(len/4) groups; zero for the empty string
        when(length(col("text")) === 0, 0L)
          .otherwise(ceil(length(col("text")).cast("double") / 4)
            .cast("long")).as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        floor((col("cum") - col("n_tokens")).cast("double") /
          text.TextOps.PackBudget).cast("bigint").as("bin"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "packing bins must be driven by the injected tokenizer's counts")
    // and they genuinely differ from the whitespace packing
    assert(got.exceptAll(text.TextOps.t11SeqPacking(spark, sf)).count() > 0)
  }

  test("BpeTokenizer: merge ranks apply in priority order; vocab pack loads, broadcasts, and drives t11 + a12") {
    // the classic BPE walkthrough: with merges (l,o) < (lo,w) < (e,r),
    // "lower" → l o w e r → lo w e r → low e r → low er
    val merges = Seq("# version: test", "l o", "lo w", "e r")
    val ranks = Seq(("l", "o") -> 0, ("lo", "w") -> 1, ("e", "r") -> 2).toMap
    assert(BpeTokenizer.encode("lower lowest low", ranks) ==
      Seq("low", "er", "low", "e", "s", "t", "low"),
      "rank order decides the merge sequence")
    assert(BpeTokenizer.encode("", ranks).isEmpty)
    assert(BpeTokenizer.encode("xyz", ranks) == Seq("x", "y", "z"),
      "unranked characters pass through — pricing never drops text")
    assert(BpeTokenizer.encode("low\nlow\tlow", ranks) ==
      Seq("low", "low", "low"),
      "ALL whitespace pre-tokenizes — a tab/newline embedded in a " +
        "'word' would skew every token price")
    // load the pack from a file, broadcast, and run the real operators
    val mf = java.nio.file.Files.createTempFile("graft-merges", ".txt")
    java.nio.file.Files.write(mf, merges.mkString("\n").getBytes("UTF-8"))
    val bpe = BpeTokenizer.fromMergesFile(spark, mf.toString)
    // the UDF path must agree exactly with driver-side encode
    val kernelTwin = new FnTokenizer(s =>
      BpeTokenizer.encode(s, ranks))
    val viaPack = text.TextOps.t11SeqPackingWith(spark, sf, bpe)
    val viaTwin = text.TextOps.t11SeqPackingWith(spark, sf, kernelTwin)
    assert(viaPack.exceptAll(viaTwin).isEmpty &&
      viaTwin.exceptAll(viaPack).isEmpty,
      "broadcast-pack tokenization ≡ driver-side encode through packing")
    // and it genuinely re-prices vs whitespace (different bins)
    assert(viaPack.exceptAll(text.TextOps.t11SeqPacking(spark, sf))
      .count() > 0)
    val a12Pack = ops.Sampling.a12TokenBudgetMixWith(spark, sf, bpe)
    val a12Twin = ops.Sampling.a12TokenBudgetMixWith(spark, sf, kernelTwin)
    assert(a12Pack.exceptAll(a12Twin).isEmpty &&
      a12Twin.exceptAll(a12Pack).isEmpty,
      "budget admission under the vocab pack ≡ the same kernel inline")
  }

  test("GPT-2 byte-level mode: pre-tokenizer splits match hand-computed GPT-2; byte remap prices whitespace and non-ASCII") {
    // hand-computed against the published GPT-2 pre-tokenizer regex
    // (contraction suffixes; ONE leading space binds to a run; the
    // (?!\S) alternative peels whitespace runs so the LAST whitespace
    // char stays attached to the following word)
    assert(BpeTokenizer.gpt2Pieces("don't stop") ==
      Seq("don", "'t", " stop"))
    assert(BpeTokenizer.gpt2Pieces("I'll pay 42 dollars!!") ==
      Seq("I", "'ll", " pay", " 42", " dollars", "!!"))
    assert(BpeTokenizer.gpt2Pieces("x  y") == Seq("x", " ", " y"),
      "double space: run peels, last space binds forward")
    assert(BpeTokenizer.gpt2Pieces("a\n b") == Seq("a", "\n", " b"))
    assert(BpeTokenizer.gpt2Pieces("hi ") == Seq("hi", " "),
      "trailing whitespace is its own piece")
    // byte remap: space → Ġ (U+0120), newline → Ċ (U+010A); merges
    // written in the remapped alphabet apply exactly as released
    // merges.txt files do. "hello world" → hello | Ġworld; with
    // (Ġ,w) < (Ġw,o) < (l,d):
    val ranks = Seq(("Ġ", "w") -> 0, ("Ġw", "o") -> 1,
      ("l", "d") -> 2).toMap
    assert(BpeTokenizer.encodeGpt2("hello world", ranks) ==
      Seq("h", "e", "l", "l", "o", "Ġwo", "r", "ld"))
    assert(BpeTokenizer.encodeGpt2("a\nb", Map.empty[(String, String), Int])
      == Seq("a", "Ċ", "b"),
      "whitespace is DATA in byte-level mode — priced, never dropped")
    // é is UTF-8 C3 A9; both bytes are latin-1-printable → map to
    // themselves → two unmerged symbols (byte-level counts bytes)
    assert(BpeTokenizer.encodeGpt2("é", Map.empty[(String, String), Int])
      == Seq("Ã", "©"))
    // the byteLevel pack drives the operators through the same seam
    val mf = java.nio.file.Files.createTempFile("graft-merges-g2", ".txt")
    java.nio.file.Files.write(mf,
      "Ġ w\nĠw o\nl d".getBytes("UTF-8"))
    val bpe = BpeTokenizer.fromMergesFile(spark, mf.toString,
      byteLevel = true)
    val twin = new FnTokenizer(s => BpeTokenizer.encodeGpt2(s, ranks))
    val viaPack = text.TextOps.t11SeqPackingWith(spark, sf, bpe)
    val viaTwin = text.TextOps.t11SeqPackingWith(spark, sf, twin)
    assert(viaPack.exceptAll(viaTwin).isEmpty &&
      viaTwin.exceptAll(viaPack).isEmpty,
      "byte-level broadcast pack ≡ driver-side encodeGpt2 through packing")
  }

  test("ST28 admission gate prices batches with the injected tokenizer") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-tokgate").toString
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .filter(col("doc_id") % 7 === 0)
    val admitted = ops.Sampling.st28AdmitBatch(
      spark, docs, root, 0L, RegexBpeTokenizer)
    // recompute the admission prefix from the injected counts
    val priced = docs.select(col("doc_id"), col("source"),
      RegexBpeTokenizer.countCol(col("text")).as("n_tokens"),
      graft.functions.hashBucket(concat(col("source"), lit("@"),
        col("doc_id").cast("string")), 1000000).as("pos"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("pos"), col("doc_id"))
    val budget = lit(ops.Sampling.A12BudgetBase) *
      (lit(1L) + substring(col("source"), 4, 10).cast("long") % 3)
    val want = priced.withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("start_tokens", col("cum") - col("n_tokens"))
      .filter(col("start_tokens") < budget)
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("start_tokens"))
    assert(admitted.exceptAll(want).isEmpty &&
      want.exceptAll(admitted).isEmpty,
      "ST28 admission must follow the injected tokenizer's pricing")
  }
}
