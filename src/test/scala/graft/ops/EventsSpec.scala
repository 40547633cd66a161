package graft.ops

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Pins the sequence semantics of the attribution and transition-bigram
  * operators on planted per-user streams (the oracle gate only sees the
  * synthetic corpus; these fixtures exercise the edge rules directly:
  * organic purchases, same-timestamp tie-breaks, per-user isolation).
  */
class EventsSpec extends SparkFunSuite {

  private val ts0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
  private def at(s: Long) = new java.sql.Timestamp(ts0.getTime + s * 1000)

  private def ev(rows: Seq[(Long, Long, String)]) = {
    import spark.implicits._
    rows.map { case (id, sec, tpe) => (id, at(sec), id % 1000, tpe) }
      .toDF("event_id", "ts", "user_id", "event_type")
  }

  test("last-touch attribution credits the nearest prior non-purchase") {
    import spark.implicits._
    val df = Seq(
      // user 1: view → click → purchase  ⇒ click credited
      (1L, at(10), 1L, "view"), (2L, at(20), 1L, "click"), (3L, at(30), 1L, "purchase"),
      // user 2: purchase with no prior events ⇒ organic
      (4L, at(5), 2L, "purchase"),
      // user 2 again: a later view then purchase ⇒ view credited
      (5L, at(6), 2L, "view"), (6L, at(7), 2L, "purchase"),
      // user 3: purchase then purchase — prior purchase is NOT a touch,
      // the view before both is ⇒ both credited to view
      (7L, at(1), 3L, "view"), (8L, at(2), 3L, "purchase"), (9L, at(3), 3L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    df.createOrReplaceTempView("planted_events")
    val wPrior = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val got = df.select(col("event_type"),
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(wPrior).as("touch"))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("touch"), lit("organic")).as("touch"))
      .agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got === Map("click" -> 1L, "organic" -> 1L, "view" -> 3L))
  }

  test("bigram transitions are per-user and ordered by (ts, event_id)") {
    import spark.implicits._
    val df = Seq(
      (1L, at(10), 1L, "a"), (2L, at(20), 1L, "b"), (3L, at(30), 1L, "c"),
      // same timestamp: event_id breaks the tie ⇒ d before e
      (4L, at(40), 1L, "d"), (5L, at(40), 1L, "e"),
      // user 2's stream never chains into user 1's
      (6L, at(1), 2L, "x"), (7L, at(2), 2L, "a"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val got = df.select(col("event_type").as("next"),
        lag(col("event_type"), 1).over(w).as("prev"))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("next")).agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got === Map(("a", "b") -> 1L, ("b", "c") -> 1L, ("c", "d") -> 1L,
      ("d", "e") -> 1L, ("x", "a") -> 1L))
  }

  test("rolling anomaly flags a planted spike and nothing in a flat series") {
    import spark.implicits._
    // Per-type hourly series are built from one event per count unit.
    // Type "flat": 30 hours of x=10 — zero variance after warmup, no
    // flags... except z² is undefined at var=0; the division-free test
    // `(n·x−s)² > n·(n·q−s²)` becomes `0 > 0` = false, so constant
    // series are correctly quiet. Type "spiky": x=10 for 29 h then 20.
    val rows = scala.collection.mutable.ArrayBuffer[(Long, java.sql.Timestamp, Long, String)]()
    var id = 0L
    for (tpe <- Seq("flat", "spiky"); hr <- 0 until 30) {
      val x = if (tpe == "spiky" && hr == 29) 20 else 10
      for (_ <- 0 until x) {
        id += 1
        rows += ((id, new java.sql.Timestamp(ts0.getTime + hr * 3600L * 1000), id, tpe))
      }
    }
    val df = rows.toSeq.toDF("event_id", "ts", "user_id", "event_type")
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("hour")).rowsBetween(-24, -1)
    val flagged = df
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("x"))
      .select(col("event_type"), col("hour"), col("x"),
        count(lit(1)).over(win).as("n"),
        sum(col("x")).over(win).as("s"),
        sum(col("x") * col("x")).over(win).as("q"))
      .filter(col("n") >= 12)
      .filter((col("n") * col("x") - col("s")) * (col("n") * col("x") - col("s"))
        > col("n") * (col("n") * col("q") - col("s") * col("s")))
      .select(col("event_type")).as[String].collect().toSeq
    assert(flagged === Seq("spiky"))
  }

  test("purchase gaps: planted exact microsecond differences") {
    import spark.implicits._
    // user 10 (cohort 0): purchases at +0s, +90s, +210s → gaps 90s, 120s
    // user 11 (cohort 1): one purchase → no gap row
    val df = Seq(
      (1L, at(0), 10L, "purchase"), (2L, at(90), 10L, "purchase"),
      (3L, at(210), 10L, "purchase"), (4L, at(50), 11L, "purchase"),
      (5L, at(60), 10L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gaps = df.filter(col("event_type") === "purchase")
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("user_id"),
        (unix_micros(col("ts")) - unix_micros(col("prev"))).as("gap"))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(gaps === Seq((10L, 90000000L), (10L, 120000000L)))
  }

  test("trend forecast: exact slope on a planted linear series") {
    import spark.implicits._
    // type "up": y = 2x exactly (x = 1..5 hours, 2,4,6,8,10 events/hour)
    // → slope 2, forecast at x=6 is 12. type "flat": constant 3 → slope 0.
    val rows = scala.collection.mutable.ArrayBuffer[(Long, java.sql.Timestamp, Long, String)]()
    var id = 0L
    for (hr <- 1 to 5; tpe <- Seq("up", "flat")) {
      val y = if (tpe == "up") 2 * hr else 3
      for (_ <- 0 until y) {
        id += 1
        rows += ((id, new java.sql.Timestamp(ts0.getTime + hr * 3600L * 1000), id, tpe))
      }
    }
    val dir = tmpDir("trend")
    rows.toSeq.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .withColumn("ts", expr("CAST(unix_micros(ts) * 1000 AS LONG)"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Events.qTrendForecast(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(got("up") === ((2.0, 12.0)))
    assert(got("flat") === ((0.0, 3.0)))
  }

  test("markov stationary: hand-computed 5-round masses on a planted 2-state chain") {
    import spark.implicits._
    // one user: a a a a b a → transitions a→a x3, a→b x1, b→a x1
    // P(a→a)=3/4, P(a→b)=1/4, P(b→a)=1; replaying the integer recurrence
    // by hand from (1000000, 1000000) gives (1600585, 399414) at round 5
    val seq0 = Seq("a", "a", "a", "a", "b", "a")
    val df = seq0.zipWithIndex.map { case (tpe, i) => (i.toLong, at(i * 10L), 1L, tpe) }
      .toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val dir = tmpDir("markov")
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Events.qMarkovStationary(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === Map("a" -> 1600585L, "b" -> 399414L))
  }

  test("decay attribution: hand-computed half-life credits, window excludes stale touches") {
    import spark.implicits._
    val h = 3600L
    val df = Seq(
      // user 1: view 14h before purchase (1 half-life) → 500; click 1h
      // before (0 half-lives) → 1000; a view AFTER the purchase → nothing
      (1L, at(0), 1L, "view"), (2L, at(13 * h), 1L, "click"),
      (3L, at(14 * h), 1L, "purchase"), (4L, at(15 * h), 1L, "view"),
      // user 2: view 49h before purchase → outside the 48h window
      (5L, at(0), 2L, "view"), (6L, at(49 * h), 2L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val dir = tmpDir("decay")
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Events.qAttributionDecay(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map("view" -> ((1L, 500L)), "click" -> ((1L, 1000L))))
  }

  test("rfm segments: four users with aligned metrics land in the four diagonal cells") {
    import spark.implicits._
    val h = 3600L
    // user k purchases k times, later and larger as k grows — so recency,
    // frequency, and monetary quartiles all align: user k → quartile k
    val rows = for (u <- 1L to 4L; i <- 1L to u)
      yield ((u * 10 + i), at(u * 24 * h + i), u, "purchase")
    val df = rows.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(0.0) + col("user_id") * 10.0)
      .withColumn("props", lit("{}"))
    val dir = tmpDir("rfm")
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Events.qRfmSegments(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3))).toMap
    assert(got === (1L to 4L).map(k => ((k, k, k), 1L)).toMap)
  }

  test("sequence match: planted journeys count non-overlapping browse-to-buy runs") {
    import spark.implicits._
    def ev(uid: Long, i: Int, t: String) =
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:${i}%02d"), uid, t)
    // user 1: v c c p v p  -> 2 matches; user 2: v c e p -> 0 (error breaks
    // the run); user 3: c p v -> 0 (no view before purchase)
    val rows =
      Seq("view", "click", "click", "purchase", "view", "purchase").zipWithIndex
        .map { case (t, i) => ev(1L, i, t) } ++
      Seq("view", "click", "error", "purchase").zipWithIndex
        .map { case (t, i) => ev(2L, i, t) } ++
      Seq("click", "purchase", "view").zipWithIndex
        .map { case (t, i) => ev(3L, i, t) }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type")
    val got = Events.sequenceMatches(df, Events.JourneyPattern)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 6L, 2L)))
  }

  test("interpolation: filled values are bracketed, grid complete, obs preserved") {
    val sf = "/root/testdata/sf0.001"
    val rows = Events.qInterpolate(spark, sf).collect()
    assert(rows.nonEmpty && rows.forall(!_.isNullAt(2)), "grid must be fully filled")
    rows.groupBy(_.getString(1)).foreach { case (_, series) =>
      val s = series.sortBy(_.getString(0))
      // every type covers the identical full hourly grid
      assert(s.map(_.getString(0)).distinct.length === s.length)
      // interpolated points lie within [min, max] of the bracketing obs:
      // walk the series and check each interp against its neighbors
      var prevObs: Option[Long] = None
      val pending = scala.collection.mutable.ArrayBuffer.empty[Long]
      s.foreach { r =>
        val v = r.getAs[Long]("value_cents")
        r.getAs[String]("kind") match {
          case "obs" =>
            prevObs.foreach { p =>
              pending.foreach(x =>
                assert(x >= math.min(p, v) && x <= math.max(p, v),
                  s"interp $x outside [$p, $v]"))
            }
            pending.clear(); prevObs = Some(v)
          case "interp" => pending += v
          case "edge" => // flat extrapolation checked below
        }
      }
      // edges equal the nearest observation
      val obsVals = s.filter(_.getAs[String]("kind") == "obs")
        .map(_.getAs[Long]("value_cents"))
      s.takeWhile(_.getAs[String]("kind") == "edge")
        .foreach(r => assert(r.getAs[Long]("value_cents") === obsVals.head))
      s.reverse.takeWhile(_.getAs[String]("kind") == "edge")
        .foreach(r => assert(r.getAs[Long]("value_cents") === obsVals.last))
    }
  }

  test("m4 downsample keeps exactly the first/last/min/max of every bucket") {
    val sf = "/root/testdata/sf0.001"
    val raw = graft.ops.Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"),
        (graft.ops.Tables.dec(col("value")) * 100).cast("long").as("cents"),
        expr("unix_timestamp(ts) DIV 86400").as("b"),
        expr("unix_timestamp(ts) * 10000000 + event_id").as("o"))
      .collect()
      .groupBy(r => (r.getString(0), r.getAs[Long]("b")))
    val m4 = Events.qM4Downsample(spark, sf).collect()
    assert(m4.length === raw.size)
    m4.foreach { r =>
      val pts = raw((r.getString(0), r.getAs[Long]("b")))
      val vals = pts.map(_.getAs[Long]("cents"))
      assert(r.getAs[Long]("n") === pts.length.toLong)
      assert(r.getAs[Long]("v_min") === vals.min)
      assert(r.getAs[Long]("v_max") === vals.max)
      val byO = pts.sortBy(_.getAs[Long]("o"))
      assert(r.getAs[Long]("v_first") === byO.head.getAs[Long]("cents"))
      assert(r.getAs[Long]("v_last") === byO.last.getAs[Long]("cents"))
    }
  }

  test("session patterns: a session break prevents a cross-session match") {
    import spark.implicits._
    // user 1: view at t0, purchase 45 min later -> separate 30-min-gap
    // sessions, no match; user 2: view then purchase 1 min later -> match
    val rows = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "view"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:45:00"), 1L, "purchase"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 2L, "view"),
      (4L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 2L, "purchase")
    ).toDF("event_id", "ts", "user_id", "event_type")
    // whole-user journeys match for BOTH users...
    val whole = Events.sequenceMatches(rows, Events.JourneyPattern)
      .collect().map(_.getLong(0)).toSet
    assert(whole == Set(1L, 2L))
    // ...but the session-windowed variant must reject user 1. Reuse the
    // registered query by writing the planted frame as an events table.
    val dir = tmpDir("session-patterns-fixture")
    rows.withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val sessioned = Events.qSessionPatterns(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(sessioned.toSeq == Seq((2L, 1L)))
  }

  test("cusum: planted level shift peaks exactly at the boundary") {
    import spark.implicits._
    // 5 events at 10.00 then 5 at 20.00: C_k = -5000k up to the boundary,
    // then recovers — peak |C| at k=5 with C = 10*5000 - 5*15000 = -25000
    val rows = (1 to 10).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:${i - 1}%02d"),
        1L, "a", if (i <= 5) 10.0 else 20.0, "{}")
    }
    val dir = tmpDir("cusum-fixture")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Events.qCusumShift(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("a", "2024-01-01 00:00:04", 5L, -25000L)))
  }

  test("attribution query totals purchases exactly on real data") {
    val dir = "/root/testdata/sf0.001"
    val total = Events.qAttributionLastTouch(spark, dir)
      .agg(sum(col("n_purchases"))).head().getLong(0)
    val purchases = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase").count()
    assert(total === purchases)
  }
}
