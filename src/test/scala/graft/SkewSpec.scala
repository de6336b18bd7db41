package graft

import org.apache.spark.sql.functions._

/** Adversarial-skew hardening: synthetic fixtures where one shingle / one
  * user / one join key carries ~10-30 % of all rows — the shape that melts
  * a 1000-executor job if a hot path is quadratic in the hot key. Each
  * test pins the MECHANISM that keeps the path bounded (df-cap dropping
  * the hot shingle, per-user window partitioning, AQE's runtime skew-join
  * split), not just the small-data answer.
  */
class SkewSpec extends SparkSpec {

  /** ~120 docs: 30 share one boilerplate sentence (a shingle hot in 25 %
    * of the corpus), every doc also has unique filler; 2 true near-dups.
    */
  private lazy val skewDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-skew").toString
    val boiler = "all rights reserved contact support for assistance today"
    val docs = (1L to 120L).map { i =>
      val unique = (1 to 12).map(k => f"body$i%03d word$k%02d term${i * 7 + k}").mkString(" ")
      val text =
        if (i <= 30) s"$boiler $unique" // hot-shingle block
        else if (i == 40 || i == 41)
          "identical twin payload repeated verbatim for the dedup check " * 3
        else unique
      (i, text, "en", s"src${i % 3}", text.length.toLong)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("df-cap drops the hot shingle: candidate pairs stay bounded under skew") {
    import graft.operators.Dedup
    val base = Tables.documents(spark, skewDir)
      .select(col("doc_id"),
        expr(graft.functions.TextHash.tokensSpark("text")).as("toks"))
      .withColumn("th", expr(graft.functions.TextHash.hashArraySpark("toks")))
      .withColumn("hs", expr(graft.functions.TextHash.shingleHashesSpark("th")))
      .select("doc_id", "hs")
    // uncapped: the hot shingles alone force >= C(30,2) = 435 candidate
    // pairs through the inverted-index join — the quadratic blowup
    val uncapped = base.select(col("doc_id"), explode(col("hs")).as("hsh"))
    val uncappedPairs = uncapped.select(col("doc_id").as("a_id"), col("hsh"))
      .join(uncapped.select(col("doc_id").as("b_id"), col("hsh")), Seq("hsh"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct().count()
    assert(uncappedPairs >= 435L, s"fixture not skewed enough: $uncappedPairs")
    // capped (df > 5 = boilerplate): the hot block's shingles are gone
    // from the postings, so candidates collapse to the true near-dups
    val capped = Dedup.cappedPostings(base, maxDf = 5L)
    val hotLeft = capped.groupBy("hsh").count()
      .where(col("count") > 5).count()
    assert(hotLeft === 0L, "a >5-df shingle survived the cap")
    val cappedPairs = capped.select(col("doc_id").as("a_id"), col("hsh"))
      .join(capped.select(col("doc_id").as("b_id"), col("hsh")), Seq("hsh"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct().count()
    assert(cappedPairs < 50L,
      s"capped candidates not bounded: $cappedPairs (uncapped $uncappedPairs)")
    // and the threshold-verified pairs still find the planted twins
    val pairs = Dedup.ngramJaccardPairsCapped(base, maxDf = 5L).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
    assert(pairs.contains((40L, 41L)), s"lost the true near-dup: ${pairs.toSeq}")
    // fractional form agrees at this corpus size (ceil(0.05 * 120) = 6)
    val fcapped = Dedup.cappedPostingsByFrac(base, 0.05)
    assert(fcapped.groupBy("hsh").count().where(col("count") > 6).count() === 0L)
  }

  test("sessionize under a hot user: per-user partitioning, referee-exact") {
    import spark.implicits._
    // one user carries 30% of all events (hot), 20 users share the rest
    val rows = (1 to 300).map { i =>
      val u = if (i <= 90) 1L else (2L + i % 20).toLong
      val ts = new java.sql.Timestamp(1700000000000L + i.toLong * 1000L *
        (if (i % 7 == 0) 4000L else 10L)) // occasional >1h gaps
      (u, i.toLong, ts)
    }
    val df = rows.toDF("user_id", "event_id", "ts")
    val sess = graft.operators.Windows
      .sessionize(df, "user_id", "ts", "event_id", 3600L)
    // scale guard: every window in the plan is partitioned (per-user
    // tasks — the hot user bounds one task, never the whole stage)
    val globalWins = sess.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    assert(globalWins.isEmpty, "sessionize has an unpartitioned window")
    // correctness under skew: driver-side referee replay
    val got = sess.select("user_id", "event_id", "session_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = rows.groupBy(_._1).flatMap { case (u, es) =>
      var last = Long.MinValue
      var sid = 0L
      es.sortBy(e => (e._3.getTime, e._2)).map { case (_, id, ts) =>
        val sec = ts.getTime / 1000L
        if (last == Long.MinValue || sec - last > 3600L) sid += 1
        last = sec
        (u, id) -> sid
      }
    }
    assert(got === want)
  }

  test("AQE splits the skewed join partition at runtime (skew=true in plan)") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> util.Try(conf.get(k)).toOption.filter(_ != null)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      // force a sort-merge join (no broadcast escape hatch) and shrink the
      // skew thresholds to test scale: a partition is "skewed" at >32 KB
      // and 2x the median — exactly the shape the hot key produces
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32k")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // 200k fact rows, 30% on one hot key; dim side flat across keys
      val fact = spark.range(0, 200000)
        .select((when(col("id") % 10 < 3, 7L).otherwise(col("id") % 97))
          .as("k"), col("id").as("payload"))
      val dim = spark.range(0, 97 * 50)
        .select((col("id") % 97).as("k"), (col("id") * 3).as("attr"))
      // inspect the SAME QueryExecution the action runs (count() spawns
      // its own), and only after the action — AQE finalizes at runtime
      val agg = fact.join(dim, Seq("k")).groupBy().count()
      assert(agg.collect().head.getLong(0) > 0L)
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew split did not trigger; plan:\n${plan.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
