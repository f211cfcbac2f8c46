package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.{SparkSuite, Tables}

/** Batch/stream equivalence for sequence-pattern matching: the DFA fold
  * over any micro-batch split of the real events table must mark exactly
  * the users whose full event-initial string the batch regexes match —
  * the same discipline FunnelSpec applies to the funnel recurrence.
  */
class PatternMatchSpec extends SparkSuite {

  /** The batch `window_pattern_match` internals: per-user sequence string,
    * then each pattern's java-regex match set.
    */
  private def batchMatchSets(): Map[String, Set[Long]] = {
    val seqs = Tables.events(spark, sfDir)
      .select(col("user_id"),
        struct(expr("unix_micros(ts)").as("t"), col("event_id"),
          substring(col("event_type"), 1, 1).as("ch")).as("x"))
      .groupBy("user_id")
      .agg(concat_ws("",
        transform(array_sort(collect_list(col("x"))),
          x => x.getField("ch"))).as("seq"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    PatternMatch.Dfas.map { d =>
      val re = d.pattern.r
      d.pattern -> seqs.collect {
        case (u, s) if re.findFirstIn(s).isDefined => u
      }.toSet
    }.toMap
  }

  test("streamed DFA matches equal the batch regexes under micro-batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val expected = batchMatchSets()

    val all = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .as[PatternMatch.Event]
      .collect().sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))

    val mem = MemoryStream[PatternMatch.Event]
    val latest = new ConcurrentHashMap[Long, Seq[String]]()
    val ooo = new ConcurrentHashMap[Long, Long]()
    val q = PatternMatch.matches(mem.toDS())
      .writeStream.outputMode(OutputMode.Update())
      .trigger(Trigger.ProcessingTime(50))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[PatternMatch.UserMatches], _: Long) =>
        batch.collect().foreach { m =>
          latest.put(m.user_id, m.matched)
          ooo.put(m.user_id, m.out_of_order)
        }
        ()
      }
      .start()
    try {
      val splits = Seq(all.length / 7, all.length / 3, all.length / 2,
        all.length * 9 / 10, all.length)
      var from = 0
      splits.foreach { to =>
        mem.addData(all.slice(from, to).toSeq: _*)
        from = to
        q.processAllAvailable()
      }
    } finally q.stop()

    import scala.jdk.CollectionConverters._
    val got = latest.asScala.toMap
    PatternMatch.Dfas.foreach { d =>
      val streamed = got.collect { case (u, ms) if ms.contains(d.pattern) => u }.toSet
      assert(streamed == expected(d.pattern),
        s"'${d.pattern}': stream ${streamed.size} vs batch ${expected(d.pattern).size}; " +
          s"only-stream=${(streamed -- expected(d.pattern)).take(5)} " +
          s"only-batch=${(expected(d.pattern) -- streamed).take(5)}")
    }
    // the fixture must exercise every pattern (≥1 match each) and at least
    // one pattern must also have non-matching users, or the equivalence is
    // vacuous (at spec SF every user's long history matches the
    // subsequence patterns — the anchor pattern provides the split)
    PatternMatch.Dfas.foreach { d =>
      assert(expected(d.pattern).nonEmpty, s"'${d.pattern}' never matches")
    }
    assert(PatternMatch.Dfas.exists(d => expected(d.pattern).size < got.size),
      s"every pattern matches every user — vacuous fixture: " +
        expected.view.mapValues(_.size).toMap.toString)
    // the feed above is globally event-time-ordered, so the order-contract
    // counter must read zero for every user — a nonzero here would mean
    // the tracker itself mis-fires on legal input
    val violated = ooo.asScala.filter(_._2 != 0L)
    assert(violated.isEmpty, s"in-order feed flagged out-of-order: ${violated.take(5)}")
  }

  test("a late-arriving event is counted as an order-contract violation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, tMillis: Long, ty: String) =
      PatternMatch.Event(7L, id, new java.sql.Timestamp(tMillis), ty)
    val mem = MemoryStream[PatternMatch.Event]
    val seen = new ConcurrentHashMap[Long, Long]()
    val q = PatternMatch.matches(mem.toDS())
      .writeStream.outputMode(OutputMode.Update())
      .trigger(Trigger.ProcessingTime(50))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[PatternMatch.UserMatches], _: Long) =>
        batch.collect().foreach(m => seen.put(m.user_id, m.out_of_order))
        ()
      }
      .start()
    try {
      mem.addData(ev(1, 1000, "view"), ev(2, 2000, "cart"))
      q.processAllAvailable()
      assert(seen.get(7L) == 0L)
      // arrives BEHIND the folded frontier (t=1500 < 2000): folds, flagged
      mem.addData(ev(3, 1500, "purchase"))
      q.processAllAvailable()
      assert(seen.get(7L) == 1L, s"late event not counted: ${seen.get(7L)}")
      // exact duplicate redelivery (same id, same ts as the frontier event)
      // double-folds the DFA — an at-least-once replay must count too
      mem.addData(ev(2, 2000, "cart"))
      q.processAllAvailable()
      assert(seen.get(7L) == 2L, s"duplicate redelivery not counted: ${seen.get(7L)}")
    } finally q.stop()
  }

  test("the DFA tables themselves: per-pattern fold semantics") {
    import PatternMatch._
    def fold(s: String): Seq[String] = {
      val st = s.foldLeft(initial)((acc, ch) => stepAll(acc, ch))
      Dfas.zip(st.states).collect { case (d, x) if d.matched(x) => d.pattern }
    }
    assert(fold("svcp") == Seq("^s", "v.*c.*p", "v[^p]*p", "vc"))
    // anchor: only a signup-first stream matches, and it never un-matches
    assert(fold("s").contains("^s") && !fold("vs").contains("^s"))
    assert(fold("svvv").contains("^s"))
    // adjacency: intervening event breaks it, later pair still matches
    assert(!fold("vsc").contains("vc") && fold("vsvc").contains("vc"))
    // exclusion: purchase must be the first p after the view
    assert(fold("vscp").contains("v[^p]*p"))
    assert(!fold("pvs").contains("v[^p]*p") && fold("pvsp").contains("v[^p]*p"))
    // order-only: any interleaving works, order violations don't
    assert(fold("vescp").contains("v.*c.*p") && !fold("pcv").contains("v.*c.*p"))
    // matches absorb: more events never revoke membership
    assert(fold("svcpeee") == fold("svcp"))
  }
}
