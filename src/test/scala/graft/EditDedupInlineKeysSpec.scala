package graft

import org.apache.spark.sql.functions._

/** The edit-dedup family's >10 M-doc form: with the keys BROADCAST
  * disabled (`spark.graft.editDedup.broadcastKeysMaxRows` = 0) the d15 and
  * d17 verify tails switch to the INLINE-CARRY shape — each exploded side
  * rides its own 60-char key on the candidate join stream and the banded
  * levenshtein evaluates there directly, with no broadcast anywhere in the
  * plan. The contract: output identical to the broadcast form bit for bit
  * (the switch is a memory-safety decision, never a semantic one), and the
  * inline plan genuinely free of BroadcastExchange (the `broadcast()` hint
  * the small form uses bypasses `autoBroadcastJoinThreshold`, so past the
  * bound it was a silent driver-memory cliff — the gate replaces that
  * cliff with this proven-equivalent shape).
  */
class EditDedupInlineKeysSpec extends GraftSuite {

  private def corpus = {
    import spark.implicits._
    val rnd = new scala.util.Random(1717)
    val alpha = "abcdefghijklmnopqrstuvwxyz "
    def randText(n: Int) =
      (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    def edit(s: String): String = rnd.nextInt(3) match {
      case 0 if s.nonEmpty =>
        val i = rnd.nextInt(s.length)
        s.updated(i, alpha(rnd.nextInt(alpha.length)))
      case 1 if s.nonEmpty =>
        val i = rnd.nextInt(s.length); s.take(i) + s.drop(i + 1)
      case _ =>
        val i = rnd.nextInt(s.length + 1)
        s.take(i) + alpha(rnd.nextInt(alpha.length)) + s.drop(i)
    }
    (0 until 30).flatMap { g =>
      val base = randText(60 + rnd.nextInt(40))
      val e = g % (dedup.Dedup.D15K + 3)
      val mutated = (0 until e).foldLeft(base)((s, _) => edit(s))
      Seq((g * 2L, base), (g * 2L + 1, mutated))
    }.toDF("doc_id", "text")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("d15/d17 inline-carry form is bit-identical with the broadcast disabled") {
    val docs = corpus
    val (b15, b17) =
      (rows(dedup.Dedup.d15Pairs(docs)), rows(dedup.Dedup.d17Pairs(docs)))
    spark.conf.set(dedup.Dedup.EditKeysBroadcastMaxRowsConf, "0")
    try {
      val i15 = dedup.Dedup.d15Pairs(docs)
      val i17 = dedup.Dedup.d17Pairs(docs)
      assert(rows(i15) === b15, "d15 inline form must equal broadcast form")
      assert(rows(i17) === b17, "d17 inline form must equal broadcast form")
      assert(b15 === b17, "both blockings still agree")
      assert(b15.nonEmpty, "fixture must exercise non-trivial pairs")
      // the inline plan must not broadcast ANYTHING — that is its point
      for ((df, name) <- Seq((i15, "d15"), (i17, "d17"))) {
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastExchange"),
          s"$name inline plan must be broadcast-free:\n$plan")
      }
    } finally spark.conf.unset(dedup.Dedup.EditKeysBroadcastMaxRowsConf)
  }

  test("the broadcast gate switches on corpus size, not only on conf 0") {
    val docs = corpus
    val expect = rows(dedup.Dedup.d15Pairs(docs))
    // bound BELOW the corpus size: same inline arm via the count() gate
    spark.conf.set(dedup.Dedup.EditKeysBroadcastMaxRowsConf, "10")
    try {
      val inline = dedup.Dedup.d15Pairs(docs)
      assert(!inline.queryExecution.executedPlan.toString
        .contains("BroadcastExchange"))
      assert(rows(inline) === expect)
    } finally spark.conf.unset(dedup.Dedup.EditKeysBroadcastMaxRowsConf)
  }
}
