package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.PortableHash

/** Property-based checks over scalacheck-generated inputs (deterministic
  * seeds; the scalatest↔scalacheck bridge artifact isn't vendored, so
  * sampling is driven manually).
  */
class PropertySpec extends GraftSuite {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => gen.pureApply(Gen.Parameters.default, Seed(42L + i)))

  private val asciiWord: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val sentence: Gen[String] =
    Gen.listOfN(8, asciiWord).map(_.mkString(" "))

  test("charFold: native Catalyst expression equals the reference fold") {
    import spark.implicits._
    val texts = samples(sentence, 60)
    val df = texts.toDF("text")
    val got = df.select(graft.functions.charFoldHash(col("text")))
      .collect().map(_.getLong(0)).toSeq
    val expect = texts.map(PortableHash.charFold)
    assert(got === expect)
  }

  test("charFold stays in the prime field; distinct sentences hash apart") {
    val words = samples(asciiWord, 200)
    words.foreach { w =>
      val h = PortableHash.charFold(w)
      assert(h >= 0 && h < PortableHash.P)
    }
    val distinct = words.distinct
    assert(distinct.map(PortableHash.charFold).distinct.size === distinct.size,
      "hash collision among short ascii words would be a structural bug")
  }

  test("asof join equals the naive argmax join on generated data") {
    import spark.implicits._
    val pairGen = for {
      n <- Gen.choose(5, 40)
      rows <- Gen.listOfN(n, for {
        k <- Gen.choose(0L, 4L); t <- Gen.choose(0L, 1000L)
      } yield (k, t))
    } yield rows
    for (i <- 0 until 5) {
      val left = samples(pairGen, 10)(i * 2)
      val right = samples(pairGen, 10)(i * 2 + 1)
      val l = left.zipWithIndex.map { case ((k, t), idx) => (idx.toLong, k, t) }
        .toDF("lid", "k", "t")
      // dedupe right per (k,t) like the operator requires (keep max rid)
      val rRows = right.distinct.zipWithIndex
        .map { case ((k, t), idx) => (idx.toLong, k, t) }
        .groupBy(x => (x._2, x._3)).map(_._2.maxBy(_._1)).toSeq
      val r = rRows.toDF("rid", "rk", "rt")
      val got = ops.AsOfJoin.asof(l, r, "k", "rk", "t", "rt", Seq("rid", "rt"))
        .select(col("lid"), col("rid")).collect()
        .map(row => row.getLong(0) -> row.getLong(1)).toMap
      val gotNative = plans.AsOfJoinNative.asof(l, r, "k", "rk", "t", "rt", Seq("rid", "rt"))
        .select(col("lid"), col("rid")).collect()
        .map(row => row.getLong(0) -> row.getLong(1)).toMap
      val expect = left.zipWithIndex.flatMap { case ((k, t), idx) =>
        val cands = rRows.filter(x => x._2 == k && x._3 <= t)
        if (cands.isEmpty) None
        else Some(idx.toLong -> cands.maxBy(x => (x._3, x._1))._1)
      }.toMap
      assert(got === expect, s"iteration $i (composed)")
      assert(gotNative === expect, s"iteration $i (native operator)")
    }
  }

  test("forward as-of with tolerance equals the naive next-match join on generated data") {
    import spark.implicits._
    val pairGen = for {
      n <- Gen.choose(5, 40)
      rows <- Gen.listOfN(n, for {
        k <- Gen.choose(0L, 4L); t <- Gen.choose(0L, 1000L)
      } yield (k, t))
    } yield rows
    val tol = 100L
    for (i <- 0 until 5) {
      val left = samples(pairGen, 10)(i * 2)
      val right = samples(pairGen, 10)(i * 2 + 1)
      val l = left.zipWithIndex.map { case ((k, t), idx) => (idx.toLong, k, t) }
        .toDF("lid", "k", "t0")
        .select(col("lid"), col("k"), timestamp_micros(col("t0")).as("t"))
      val rRows = right.distinct.zipWithIndex
        .map { case ((k, t), idx) => (idx.toLong, k, t) }
        .groupBy(x => (x._2, x._3)).map(_._2.maxBy(_._1)).toSeq
      val r = rRows.toDF("rid", "rk", "rt0")
        .select(col("rid"), col("rk"), timestamp_micros(col("rt0")).as("rt"))
      val got = ops.AsOfJoin.asof(l, r, "k", "rk", "t", "rt", Seq("rid"),
        direction = "forward", toleranceUs = Some(tol))
        .select(col("lid"), col("rid")).collect()
        .map(row => row.getLong(0) -> row.getLong(1)).toMap
      val expect = left.zipWithIndex.flatMap { case ((k, t), idx) =>
        val cands = rRows.filter(x => x._2 == k && x._3 >= t)
        if (cands.isEmpty) None
        else {
          val best = cands.minBy(_._3) // rt unique per key after the dedupe
          if (best._3 - t <= tol) Some(idx.toLong -> best._1) else None
        }
      }.toMap
      assert(got === expect, s"iteration $i (forward+tolerance)")
    }
  }
}

/** Additional generated-input parity checks for the native expressions. */
class HashExprFuzzSpec extends GraftSuite {
  import org.apache.spark.sql.functions._
  import org.scalacheck.Gen
  import org.scalacheck.rng.Seed

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => gen.pureApply(Gen.Parameters.default, Seed(77L + i)))

  test("minhash signature: native expression equals a reference fold") {
    import spark.implicits._
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    val sentence = Gen.choose(4, 30)
      .flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val texts = samples(sentence, 25)
    val got = texts.toDF("text")
      .select(graft.functions.minHashSignature(
        graft.functions.shingleHashes(col("text")), 16))
      .collect().map(_.getSeq[Long](0).toArray)
    val P = PortableHash.P
    texts.zip(got).foreach { case (text, sig) =>
      val sh = PortableHash.shingles(text)
      (0 until 16).foreach { i =>
        val a = (i * 2654435761L + 1L) % P
        val b = (i * 40503L + 7L) % P
        val expect = if (sh.isEmpty) 0L else sh.map(s => (a * s + b) % P).min
        assert(sig(i) === expect, s"perm $i of '$text'")
      }
    }
  }

  test("oracleSql keys are a subset of queries (no orphan oracles)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }

  test("t6 repetition fractions equal a reference computation on generated text") {
    import spark.implicits._
    import graft.functions.{P, ShingleBase}
    // small vocab → guaranteed repeats
    val word = Gen.oneOf("aa", "bb", "cc", "dd")
    val doc = Gen.choose(3, 30).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val texts = samples(doc, 40)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val th = graft.functions.tokenHashes(col("text"))
    val gram2 = transform(sequence(lit(0), size(th) - 2), k =>
      (element_at(th, k + 1) * ShingleBase + element_at(th, k + 2)) % P)
    val got = df.select(col("doc_id"),
        round(lit(1.0) - size(array_distinct(gram2)).cast("double")
          / size(gram2).cast("double"), 6).as("rep2"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val hs = t.split(" ").map(PortableHash.charFold)
      val g2 = hs.sliding(2).map { case Array(a, b) => (a * ShingleBase + b) % P }.toSeq
      val expect = BigDecimal(1.0 - g2.distinct.size.toDouble / g2.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(got(i.toLong) - expect) < 1e-9, s"doc $i: $t")
    }
  }

  test("bucket±1 range blocking is lossless on generated values") {
    // the q47 claim: |a−b| ≤ δ ⟹ floor(a/δ) ∈ {floor(b/δ)−1, floor(b/δ), floor(b/δ)+1}
    // and each true pair meets in EXACTLY one exploded bucket
    val δ = 1.0
    val vals = samples(Gen.choose(0.0, 50.0), 200).zipWithIndex
      .map { case (v, i) => (i.toLong, math.rint(v * 100) / 100) }
    val brute = (for {
      (i, a) <- vals; (j, b) <- vals if i < j && math.abs(a - b) <= δ
    } yield (i, j)).toSet
    val blocked = (for {
      (i, a) <- vals; (j, b) <- vals if i < j
      nb <- Seq(-1L, 0L, 1L)
      if math.floor(a / δ).toLong == math.floor(b / δ).toLong + nb
      if math.abs(a - b) <= δ
    } yield (i, j)).toSet
    assert(blocked === brute, "bucket±1 blocking must be lossless")
    // exactly-once: count multiplicity of bucket meetings per true pair
    for { (i, a) <- vals; (j, b) <- vals if i < j && math.abs(a - b) <= δ } {
      val meetings = Seq(-1L, 0L, 1L).count(nb =>
        math.floor(a / δ).toLong == math.floor(b / δ).toLong + nb)
      assert(meetings === 1, s"pair ($a,$b) meets in $meetings buckets")
    }
  }

  test("q48 salted join equals the plain join") {
    val salted = ops.Relational.q48SaltedJoin(spark, sf)
    val plain = Tables(spark, sf, "events")
      .join(Tables(spark, sf, "orders"), col("user_id") === col("o_custkey"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice").cast("decimal(18,2)")), 2)
          .cast("double").as("sum_price"))
      .orderBy(col("event_type"))
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
  }

  test("a4 sampling keep-decision equals a reference hash computation") {
    val out = ops.Sampling.a4StratifiedSample(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = docs.filter { case (id, src) =>
      val rate = 20 + 3 * src.drop(3).toInt
      PortableHash.charFold(s"$src#$id") * 2654435761L % 4294967296L % 100 < rate
    }.map { case (id, src) => (id, src, 20 + 3 * src.drop(3).toInt) }.toSet
    assert(out.toSet === expect)
  }
}

/** KMV sketch algebra over generated multisets (pure scalar — no Spark
  * job needed for the algebraic laws; KmvSpec covers the distributed
  * build).
  */
class KmvPropertySpec extends GraftSuite {
  import org.scalacheck.Gen
  import org.scalacheck.rng.Seed
  import graft.functions.KmvAggregator

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => gen.pureApply(Gen.Parameters.default, Seed(7L + i)))

  private val word: Gen[String] =
    Gen.listOfN(4, Gen.alphaLowerChar).map(_.mkString)
  private val bag: Gen[List[String]] =
    Gen.choose(0, 400).flatMap(n => Gen.listOfN(n, word))

  private def build(agg: KmvAggregator, items: Seq[String]): Array[Long] =
    items.foldLeft(agg.zero)(agg.reduce)

  test("KMV: merge is commutative, associative, idempotent, and equals the one-pass build") {
    val agg = new KmvAggregator(16) // small k so saturation is exercised
    for (i <- 0 until 20) {
      val a = samples(bag, 60)(i * 3)
      val b = samples(bag, 60)(i * 3 + 1)
      val c = samples(bag, 60)(i * 3 + 2)
      val (sa, sb, sc) = (build(agg, a), build(agg, b), build(agg, c))
      def m(x: Array[Long], y: Array[Long]) = agg.merge(x.clone, y.clone)
      assert(java.util.Arrays.equals(m(sa, sb), m(sb, sa)), "commutative")
      assert(java.util.Arrays.equals(m(m(sa, sb), sc), m(sa, m(sb, sc))),
        "associative")
      assert(java.util.Arrays.equals(m(sa, sa), sa), "idempotent")
      assert(java.util.Arrays.equals(m(sa, sb), build(agg, a ++ b)),
        "merge of partials equals the one-pass sketch")
      // the sketch is always sorted, distinct, and at most k long
      val merged = m(sa, sb)
      assert(merged.length <= 16)
      assert(merged.sameElements(merged.distinct.sorted))
    }
  }

  test("bandedRank equals the global sort rank on generated keys, clamp range included") {
    import spark.implicits._
    val gGen = Gen.frequency(
      3 -> Gen.choose(-40.0, 40.0), // beyond the clamp range on both sides
      3 -> Gen.choose(-1.0, 1.0), // dense ties near the band boundaries
      1 -> Gen.oneOf(0.0, -0.0, 31.999999, -31.999999))
    val rowGen = for {
      id <- Gen.choose(0L, 500L)
      g <- gGen
    } yield (id, math.rint(g * 1e6) / 1e6 + 0.0)
    // + 0.0 normalizes −0.0 like the operator's own keys do: Scala's
    // driver-side Double ordering puts −0.0 < 0.0 while Spark's sort
    // treats them equal — the contract is normalized keys
    for (trial <- 0 until 3) {
      val rows = samples(Gen.listOfN(300, rowGen), 5)(trial)
        .distinctBy(_._1) // unique ids: the tie-break key must be unique
      val df = rows.toDF("id", "g").repartition(7)
      val got = ops.Sampling.bandedRank(df, col("g"), col("id"))
        .select(col("id"), col("rank"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = rows.sortBy { case (id, g) => (-g, id) }
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
      assert(got === want, s"trial $trial: banded rank diverged from global sort")
    }
  }
}
