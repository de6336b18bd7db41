package graft

import graft.domain._
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based invariants (SURVEY §5.2 item 4) over the pure domain
  * operators — cheap fuzzing of the rule surfaces the example-based specs
  * pin pointwise.
  */
object DomainProperties extends Properties("graft.domain") {

  private val pct = Gen.choose(-200.0, 200.0)

  property("penalty is clamped to [0,100] for any metric/delta") =
    forAll(Gen.oneOf("gct", "vo", "vr", "cadence"), pct) { (m, d) =>
      val p = FormBaseline.penalty(m, d)
      p >= 0.0 && p <= 100.0
    }

  property("score is clamped and consistency-bounded") =
    forAll(pct, pct, pct) { (g, v, r) =>
      val s = FormBaseline.score(g, v, r)
      s.score >= 0.0 && s.score <= 100.0
    }

  property("star rating total: every penalty maps to exactly one band") =
    forAll(Gen.choose(0.0, 100.0)) { p =>
      val r = FormBaseline.starRating(p)
      Set("excellent", "good", "average", "below_average", "poor")(r.category) &&
        r.stars.length == 5
    }

  property("acwr risk is monotone and in [0,1]") =
    forAll(Gen.choose(0.0, 5.0), Gen.choose(0.0, 5.0)) { (a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      val (ra, rb) = (InjuryRisk.acwrRisk(lo), InjuryRisk.acwrRisk(hi))
      ra >= 0.0 && rb <= 1.0 && ra <= rb
    }

  property("injury fusion score in [0,100] with a defined band") =
    forAll(Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0)) { (a, w) =>
      InjuryRisk.assess(Map("acwr" -> Some(a), "wellness" -> Some(w))).exists { r =>
        r.score >= 0.0 && r.score <= 100.0 &&
          Set("low", "moderate", "high")(r.band)
      }
    }

  property("intensity estimation: total, label-closed, anchored ends") = {
    val lapGen = Gen.zip(
      Gen.option(Gen.choose(80.0, 200.0)), Gen.option(Gen.choose(150.0, 700.0)))
    forAll(Gen.listOfN(12, lapGen).flatMap(l => Gen.choose(0, 12).map(l.take))) { laps =>
      val out = graft.ingest.SplitsEnrich.estimateIntensity(laps)
      val labels = Set("WARMUP", "COOLDOWN", "INTERVAL", "RECOVERY", "ACTIVE")
      out.length == laps.length && out.forall(labels)
    }
  }

  property("vdot race-time round trip within binary-search tolerance") =
    forAll(Gen.choose(3.0, 21.0), Gen.choose(900L, 7200L)) { (km, secs) =>
      val vdot = Vdot.vdotFromRace(km, secs)
      // only physiologically sane fits invert cleanly
      (vdot < 20 || vdot > 85) || {
        val t = Vdot.predictRaceTime(vdot, km)
        math.abs(t - secs) <= math.max(2L, secs / 200)
      }
    }

  property("hrv streak never exceeds available nights; >=2 iff under-recovery") =
    forAll(Gen.listOf(Gen.option(Gen.choose(20.0, 80.0)))) { ms =>
      val nights = ms.map(m => (m, Some(45.0)))
      val (streak, under) = Recovery.hrvStreak(nights)
      streak <= nights.length && (under == (streak >= 2))
    }

  property("wellness band: adverse only with a low/high flag; z None iff insufficient") =
    forAll(Gen.listOfN(12, Gen.option(Gen.choose(30.0, 70.0))),
      Gen.option(Gen.choose(30.0, 70.0))) { (series, today) =>
      val mb = Wellness.metricBaseline(series, today, "hrv")
      val insufficient = mb.flag == "insufficient"
      (mb.z.isEmpty == insufficient) &&
        (!mb.adverse || mb.flag == "low")
    }

  // ---- round 3 surfaces ----

  property("week start lands on the configured day, within 6 days back") =
    forAll(Gen.choose(0L, 20000L), Gen.choose(0, 6)) { (epochDay, start) =>
      val d = java.time.LocalDate.ofEpochDay(epochDay)
      // scalar mirror of Aggregates.weekStartCol's arithmetic
      val weekday = d.getDayOfWeek.getValue - 1 // Monday=0..Sunday=6
      val offset = ((weekday - start) % 7 + 7) % 7
      val ws = d.minusDays(offset.toLong)
      (ws.getDayOfWeek.getValue - 1) == start &&
        !ws.isAfter(d) && !d.isAfter(ws.plusDays(6))
    }

  property("training-type matrix is symmetric with values in (0,1]") = {
    val lvl = Gen.oneOf(graft.operators.Joins.TrainingTypes :+ "unknown")
    forAll(lvl, lvl) { (a, b) =>
      val m = graft.operators.Joins.TrainingTypeSimilarity
      def look(x: String, y: String) =
        m.getOrElse(Seq(x, y).sorted.mkString("|"), 0.3)
      val s = look(a, b)
      // symmetric, bounded, and every self-pair scores exactly 1.0
      s == look(b, a) && s > 0.0 && s <= 1.0 && (a != b || s == 1.0)
    }
  }

  property("goal progress status matches the gap thresholds exactly") =
    forAll(Gen.choose(-600, 600), Gen.choose(5.0, 42.195)) { (delta, km) =>
      val today = java.time.LocalDate.of(2026, 8, 12)
      val predicted = Vdot.predictRaceTime(50.0, km)
      RaceGoal.progress(50.0,
        RaceGoal.Goal(Some("r"), None, Some(km),
          Some((predicted - delta).toInt)), today).exists { p =>
        p.gapSeconds == delta.toLong &&
          (p.status match {
            case "ahead" => delta <= -60
            case "on_track" => math.abs(delta) < 60
            case "behind" => delta >= 60
            case _ => false
          })
      }
    }

  property("heat hinge is non-negative, zero below ref, slope-1 above") =
    forAll(Gen.choose(-30.0, 45.0)) { t =>
      val h = math.max(t - 15.0, 0.0) // scalar mirror of Stats.heatHinge
      h >= 0.0 && (t <= 15.0 || math.abs(h - (t - 15.0)) < 1e-12) &&
        (t > 15.0 || h == 0.0)
    }
}

/** Adversarial-shape fuzzing of the distributed connected-components
  * operator against an in-memory union-find referee — CC is load-bearing
  * for three oracle queries plus the split assignment, and the example
  * specs only cover paths/chains. Case count is small (each case is a
  * full iterative Spark job) but shapes are random: multi-edges,
  * self-loops, several components, isolated-free by construction.
  */
object GraphProperties extends Properties("graft.operators.GraphOps") {

  // each case runs an iterative Spark job — 8 random shapes + the fixed
  // star cases below give shape coverage without minutes of wall-clock
  override def overrideParameters(
      p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = {
    val s = TestSession.spark
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Min-rooted union-find: the root of every tree is the component's
    * minimum label, so `find` agrees with GraphOps' min-label contract.
    */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.flatMap(e => Seq(e._1, e._2)).distinct.map(v => v -> find(v)).toMap
  }

  private def ccOf(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    graft.operators.GraphOps
      .connectedComponents(edges.toDF("a_id", "b_id"), "a_id", "b_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private val edgeGen: Gen[List[(Long, Long)]] =
    Gen.choose(2, 30).flatMap { n =>
      Gen.choose(1, 50).flatMap { m =>
        Gen.listOfN(m,
          Gen.zip(Gen.choose(0L, n.toLong), Gen.choose(0L, n.toLong)))
      }
    }

  property("matches the union-find referee on random edge sets") =
    forAll(edgeGen) { edges => ccOf(edges) == unionFind(edges) }

  property("star graph: 200-leaf max-degree hub labels everything 0") = {
    val edges = (1L to 200L).map(i => (i, 0L))
    ccOf(edges) == edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(_ -> 0L).toMap
  }

  property("inverted star: min label crosses the high-id hub") = {
    // leaves 0..199 meet only through hub 500 — the min label must travel
    // leaf -> hub -> every other leaf
    val edges = (0L until 200L).map(i => (i, 500L))
    val got = ccOf(edges)
    got.size == 201 && got.values.forall(_ == 0L)
  }

  /** Driver-side replica of the fixed-point PageRank arithmetic — the
    * distributed operator's claim is BIT-exactness, so the referee
    * comparison is `==` on the scaled longs, no tolerance.
    */
  private def prReferee(edges: Seq[(Long, Long)], iters: Int = 6,
      scale: Long = 1000000000000L): Map[Long, Long] = {
    val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = und.groupBy(_._1).map { case (u, es) => u -> es.size.toLong }
    val n = deg.size.toLong
    val base = (15L * scale) / (100L * n)
    var r = deg.keys.map(_ -> scale / n).toMap
    (1 to iters).foreach { _ =>
      r = und.groupBy(_._2).map { case (v, es) =>
        v -> (base + (85L * es.map { case (u, _) => r(u) / deg(u) }.sum) / 100L)
      }
    }
    r
  }

  private def prOf(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    graft.operators.GraphOps
      .pageRank(edges.toDF("a_id", "b_id"), "a_id", "b_id")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
  }

  property("fixed-point pagerank matches the integer referee bit-for-bit") =
    forAll(edgeGen) { edges => prOf(edges) == prReferee(edges) }

  property("pagerank: star hub outranks leaves; teleport floor holds") = {
    val edges = (1L to 50L).map(i => (i, 0L))
    val pr = prOf(edges)
    val base = (15L * 1000000000000L) / (100L * 51L)
    pr.size == 51 && pr(0L) > pr(1L) && pr.values.forall(_ >= base)
  }

  property("pagerank: empty edge list yields an empty frame, not a crash") = {
    prOf(Seq.empty).isEmpty
  }
}

/** Fuzz the STATEFUL streaming funnel against a driver-side replay
  * referee: random event streams (shared timestamps, shuffled arrival
  * order, random micro-batch split points) must produce exactly the
  * advances a sequential (ts, event_id)-ordered walk produces — the
  * stream's sort-inside-the-batch plus carried (stage, last-micros)
  * state may not diverge from the batch total order at any boundary.
  */
object FunnelProperties extends Properties("graft.streaming.funnel") {

  // each case runs a full streaming query lifecycle
  override def overrideParameters(
      p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = {
    val s = TestSession.spark
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private val stages = Seq("view", "click", "purchase")
  private val types = stages ++ Seq("error", "signup")

  private val caseGen: Gen[(List[(Long, Long, Long, String)], Int)] =
    for {
      n <- Gen.choose(5, 40)
      evs <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 4L)
        // coarse timestamps force equal-ts collisions (event_id breaks them)
        t <- Gen.choose(0L, 9L)
        ty <- Gen.oneOf(types)
      } yield (u, t, ty))
      split <- Gen.choose(0, n)
    } yield (evs.zipWithIndex.map { case ((u, t, ty), i) =>
      (u, i.toLong, t, ty)
    }, split)

  /** Sequential replay of the funnel contract over the full stream. */
  private def referee(evs: Seq[(Long, Long, Long, String)])
      : Map[Long, Int] =
    evs.groupBy(_._1).map { case (u, es) =>
      var stage = 0
      var last = Long.MinValue
      es.sortBy(e => (e._3, e._2)).foreach { case (_, id, t, ty) =>
        if (stage < stages.length && ty == stages(stage) &&
            (stage == 0 || t > last)) { stage += 1; last = t }
      }
      u -> stage
    }

  property("stream advances == sequential replay across random batch splits") =
    forAll(caseGen) { case (evs, split) =>
      import spark.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
      def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000L)
      val mem = MemoryStream[(Long, Long, java.sql.Timestamp, String)]
      val name = s"funnelprop${System.nanoTime()}"
      val q = graft.streaming.Streams.funnelStream(
        mem.toDF.toDF("user_id", "event_id", "ts", "event_type")
          .as[graft.streaming.Streams.FunnelEvent])
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        // in-order delivery across batches (the no-late-data contract the
        // batch-parity claim is scoped to): WITHIN a batch order is
        // shuffled — the operator's own sort must fix it
        val rows = evs.sortBy(e => (e._3, e._2))
          .map { case (u, id, t, ty) => (u, id, ts(t), ty) }
        val (h, t2) = rows.splitAt(split)
        // reversed insertion inside each batch: the operator's own
        // (ts, event_id) sort must restore the order
        if (h.nonEmpty) { mem.addData(h.reverse); q.processAllAvailable() }
        if (t2.nonEmpty) { mem.addData(t2.reverse); q.processAllAvailable() }
        val got = spark.table(name).collect()
          .map(r => (r.getLong(0), r.getInt(1))).groupBy(_._1)
          .map { case (u, rs) => u -> rs.map(_._2).max }
        val want = referee(evs).filter(_._2 > 0)
        got == want
      } finally q.stop()
    }
}

/** Fuzz the STATEFUL transition stream the same way the funnel property
  * does: random event streams (shared timestamps, shuffled within-batch
  * arrival, random micro-batch split) must emit exactly the (prev → cur)
  * pairs a sequential (ts, event_id)-ordered walk emits — the carried
  * one-triple-per-user state may not drop or duplicate a pair at any
  * batch boundary.
  */
object TransitionProperties extends Properties("graft.streaming.transition") {

  override def overrideParameters(
      p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = {
    val s = TestSession.spark
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private val types = Seq("view", "click", "purchase", "error", "signup")

  private val caseGen: Gen[(List[(Long, Long, Long, String)], Int)] =
    for {
      n <- Gen.choose(5, 40)
      evs <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 4L)
        t <- Gen.choose(0L, 9L) // coarse → equal-ts collisions
        ty <- Gen.oneOf(types)
      } yield (u, t, ty))
      split <- Gen.choose(0, n)
    } yield (evs.zipWithIndex.map { case ((u, t, ty), i) =>
      (u, i.toLong, t, ty)
    }, split)

  /** Sequential (ts, event_id) replay: each event emits (prev → cur). */
  private def referee(evs: Seq[(Long, Long, Long, String)])
      : Set[(Long, String, String, Long)] =
    evs.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      es.sortBy(e => (e._3, e._2)).sliding(2).collect {
        case Seq((_, _, _, prevTy), (_, id, _, curTy)) =>
          (u, prevTy, curTy, id)
      }
    }.toSet

  property("stream pairs == sequential replay across random batch splits") =
    forAll(caseGen) { case (evs, split) =>
      import spark.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
      def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000L)
      val mem = MemoryStream[(Long, Long, java.sql.Timestamp, String)]
      val name = s"transprop${System.nanoTime()}"
      val q = graft.streaming.Streams.transitionStream(
        mem.toDF.toDF("user_id", "event_id", "ts", "event_type")
          .as[graft.streaming.Streams.TransEvent])
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        // in-order delivery ACROSS batches (the stream's documented
        // contract); reversed insertion INSIDE each batch — the
        // operator's own (ts, event_id) sort must restore the order
        val rows = evs.sortBy(e => (e._3, e._2))
          .map { case (u, id, t, ty) => (u, id, ts(t), ty) }
        val (h, t2) = rows.splitAt(split)
        if (h.nonEmpty) { mem.addData(h.reverse); q.processAllAvailable() }
        if (t2.nonEmpty) { mem.addData(t2.reverse); q.processAllAvailable() }
        val got = spark.table(name).collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2),
            r.getLong(3))).toSet
        got == referee(evs)
      } finally q.stop()
    }
}

/** Fuzz the STATEFUL last-touch attribution stream against a sequential
  * replay referee, including the same-micros edge the round-7 fix pinned:
  * a click sharing a purchase's timestamp IS attributable (batch matches
  * c_us <= p_us), so the stream's (ts, is-purchase, event_id) in-batch
  * order — and the carried latest-click state across random batch splits
  * — must reproduce exactly the referee's attribution set, max-click-id
  * tiebreak included.
  */
object AttributionProperties
    extends Properties("graft.streaming.attribution") {

  override def overrideParameters(
      p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = {
    val s = TestSession.spark
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  // click/purchase heavy so attributions actually fire; window 3 s over
  // t in 0..9 exercises both inside- and outside-window purchases
  private val WindowS = 3L
  private val types = Seq("click", "purchase", "click", "purchase", "view")

  private val caseGen: Gen[(List[(Long, Long, Long, String)], Int)] =
    for {
      n <- Gen.choose(5, 40)
      evs <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 3L)
        t <- Gen.choose(0L, 9L) // coarse → same-ts click/purchase pairs
        ty <- Gen.oneOf(types)
      } yield (u, t, ty))
      split <- Gen.choose(0, n)
    } yield (evs.zipWithIndex.map { case ((u, t, ty), i) =>
      (u, i.toLong, t, ty)
    }, split)

  /** Sequential replay in the operator's total order: clicks overwrite
    * state (same-ts clicks in id order → max id wins), a purchase at the
    * same instant as a click sees that click (clicks sort first).
    */
  private def referee(evs: Seq[(Long, Long, Long, String)])
      : Set[(Long, Long, Long, Long)] =
    evs.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      var click: Option[(Long, Long)] = None // (id, t)
      val out = Seq.newBuilder[(Long, Long, Long, Long)]
      es.sortBy(e => (e._3, if (e._4 == "purchase") 1 else 0, e._2))
        .foreach { case (_, id, t, ty) =>
          ty match {
            case "click" => click = Some((id, t))
            case "purchase" => click.foreach { case (cid, ct) =>
              if (ct <= t && t - ct <= WindowS)
                out += ((u, id, cid, t - ct))
            }
            case _ => ()
          }
        }
      out.result()
    }.toSet

  property("stream attributions == sequential replay across batch splits") =
    forAll(caseGen) { case (evs, split) =>
      import spark.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
      def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000L)
      val mem = MemoryStream[(Long, Long, java.sql.Timestamp, String)]
      val name = s"attrprop${System.nanoTime()}"
      val q = graft.streaming.Streams.attributionStream(
        mem.toDF.toDF("user_id", "event_id", "ts", "event_type")
          .as[graft.streaming.Streams.AttrEvent], WindowS)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        // cross-batch delivery follows the operator's total order (a
        // same-micros click must not land in the batch AFTER its
        // purchase — that violates the ts-monotone contract); within a
        // batch the insertion is reversed
        val rows = evs
          .sortBy(e => (e._3, if (e._4 == "purchase") 1 else 0, e._2))
          .map { case (u, id, t, ty) => (u, id, ts(t), ty) }
        val (h, t2) = rows.splitAt(split)
        if (h.nonEmpty) { mem.addData(h.reverse); q.processAllAvailable() }
        if (t2.nonEmpty) { mem.addData(t2.reverse); q.processAllAvailable() }
        val got = spark.table(name).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3))).toSet
        got == referee(evs)
      } finally q.stop()
    }
}

/** Fuzz the WATERMARKED session-window stream against a driver-side
  * sessionization referee — completes the keyed-stream replay net
  * (funnel / transition / attribution above are custom flatMapGroups
  * state; this one is the built-in session_window + watermark, whose
  * merge rule and append-mode emission discipline deserve the same
  * cross-batch-boundary fuzzing). Events arrive ts-ordered across a
  * random batch split; a far-future flush event per user advances the
  * watermark past every real session so append mode emits them all
  * (the flush sessions themselves stay open and unEmitted).
  */
object SessionizeStreamProperties extends Properties("graft.streaming.sessionize") {

  override def overrideParameters(
      p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = {
    val s = TestSession.spark
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private val GapSec = 3L

  private val caseGen: Gen[(List[(Long, Long)], Int)] =
    for {
      n <- Gen.choose(4, 30)
      evs <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 3L)
        t <- Gen.choose(0L, 25L) // dense → merges AND gap breaks
      } yield (u, t))
      split <- Gen.choose(0, n)
    } yield (evs, split)

  /** session_window semantics: consecutive events merge iff
    * diff <= gap (adjacent [t, t+gap) windows DO merge — falsified the
    * strict-< referee at diff == gap), i.e. split on diff > gap — the
    * SAME rule as the batch twin Windows.sessionize, so the property
    * also pins batch/stream gap-contract agreement. Session end =
    * last event + gap.
    */
  private def referee(evs: Seq[(Long, Long)])
      : Set[(Long, Long, Long, Long)] =
    evs.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val ts = es.map(_._2).sorted
      val sessions = ts.tail.foldLeft(List(List(ts.head))) {
        case (cur :: done, t) =>
          if (t - cur.head <= GapSec) (t :: cur) :: done
          else List(t) :: cur :: done
        case (Nil, t) => List(List(t))
      }
      sessions.map(s => (u, s.last, s.head + GapSec, s.length.toLong))
    }.toSet

  property("emitted sessions == batch sessionization across batch splits") =
    forAll(caseGen) { case (evs, split) =>
      import spark.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
      val base = 1700000000L
      def ts(s: Long) = new java.sql.Timestamp((base + s) * 1000L)
      val mem = MemoryStream[(Long, java.sql.Timestamp)]
      val name = s"sessprop${System.nanoTime()}"
      val q = graft.streaming.Streams.sessionizeStream(
          mem.toDF.toDF("user_id", "ts"), "user_id", "ts",
          gap = s"$GapSec seconds", watermark = "30 seconds")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        val rows = evs.sortBy(_._2).map { case (u, t) => (u, ts(t)) }
        val (h, t2) = rows.splitAt(split)
        if (h.nonEmpty) { mem.addData(h.reverse); q.processAllAvailable() }
        if (t2.nonEmpty) { mem.addData(t2.reverse); q.processAllAvailable() }
        // flush: one far-future event per user closes every real session
        mem.addData((1L to 3L).map(u => (u, ts(100000L))))
        q.processAllAvailable()
        val got = spark.table(name).collect().map { r =>
          (r.getLong(0),
            r.getTimestamp(1).getTime / 1000L - base,
            r.getTimestamp(2).getTime / 1000L - base,
            r.getLong(3))
        }.toSet
        got == referee(evs)
      } finally q.stop()
    }
}

object BloomProperties extends Properties("graft.functions.Bloom") {

  // each case runs two small Spark jobs (build + probe)
  override def overrideParameters(
      p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = {
    val s = TestSession.spark
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private val keysGen: Gen[List[Long]] =
    Gen.choose(0, 300).flatMap(n => Gen.listOfN(n, Gen.long))

  property("no false negatives for ANY key set; empty set yields no filter") =
    forAll(keysGen) { keys =>
      import spark.implicits._
      val df = keys.toDF("k")
      graft.functions.Bloom.buildFilter(df, 1024, 1L << 14) match {
        case None => keys.isEmpty // NULL aggregate exactly on zero rows
        case Some(bf) =>
          keys.nonEmpty && df.where(
            !graft.functions.Bloom.mightContain(bf, org.apache.spark.sql.functions.col("k")))
            .count() == 0L
      }
    }
}

/** Fuzz the BMP codec (functions/Bmp.scala) — the newest parser of
  * untrusted bytes in the tree, and parsers are where fuzzing pays
  * (VERDICT r8 punch item 4). Pure JVM, no Spark jobs: full default
  * 100-case budget per property.
  */
object BmpProperties extends Properties("graft.functions.Bmp") {
  import graft.functions.Bmp

  /** (w, h, pixels): dims span every padding class (w mod 4 ∈ {0,1,2,3})
    * and pixel bytes are arbitrary — including 'B'/'M'-valued bytes, so
    * the decoder is exercised on payloads that mimic header magic.
    */
  private val imgGen: Gen[(Int, Int, Array[Byte])] = for {
    w <- Gen.choose(1, 64)
    h <- Gen.choose(1, 64)
    px <- Gen.containerOfN[Array, Byte](w * h * 3,
      Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield (w, h, px)

  property("decode24(encode24(img)) is the identity on dims and pixels") =
    forAll(imgGen) { case (w, h, px) =>
      val (dw, dh, rgb) = Bmp.decode24(Bmp.encode24(w, h, px))
      dw == w && dh == h && java.util.Arrays.equals(rgb, px)
    }

  property("every stored row is padded to a 4-byte boundary") =
    forAll(imgGen) { case (w, h, px) =>
      val bytes = Bmp.encode24(w, h, px)
      (bytes.length - 54) % 4 == 0 &&
        bytes.length == 54 + (w * 3 + Bmp.rowPad(w)) * h &&
        (w * 3 + Bmp.rowPad(w)) % 4 == 0
    }

  property("any single corrupted header byte is rejected or dims-preserving") =
    forAll(imgGen, Gen.choose(0, 53), Gen.choose(1, 255)) {
      case ((w, h, px), off, delta) =>
        val bytes = Bmp.encode24(w, h, px)
        bytes(off) = (bytes(off) ^ delta).toByte // guaranteed != original
        // a header flip must either fail fast with a TYPED reject (the
        // corruption classes the decoder checks: magic, pixel offset,
        // dims, planes, bpp, compression, truncation) or decode to the
        // SAME pixels (bytes the format legitimately ignores here:
        // file-size field, reserved words, resolutions, palette counts,
        // image-size field) — never garbage, never a raw index error
        try {
          val (dw, dh, rgb) = Bmp.decode24(bytes)
          dw == w && dh == h && java.util.Arrays.equals(rgb, px)
        } catch {
          case _: IllegalArgumentException => true
        }
    }

  property("truncating the file below the pixel payload is rejected") =
    forAll(imgGen, Gen.choose(0.0, 1.0)) { case ((w, h, px), frac) =>
      val bytes = Bmp.encode24(w, h, px)
      val cut = (bytes.length * frac).toInt.min(bytes.length - 1)
      try { Bmp.decode24(java.util.Arrays.copyOf(bytes, cut)); false }
      catch { case _: IllegalArgumentException => true }
    }
}
