package graft.ops

import graft.SparkFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Pins the properties of the SQL-surface pack the oracle gate can't see:
  * the window queries stay PARTITIONED (no single-partition global-window
  * exchange — the shape that dies at scale), grouping-set flags are
  * internally consistent, and the dow/ISO-week conventions match Spark's
  * documented semantics (the oracle mirrors them with +1 / week()).
  */
class SqlSurfaceSpec extends SparkFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("ntile/dist windows are partitioned: no SinglePartition exchange") {
    for (q <- Seq(SqlSurface.qWindowNtile(spark, sf), SqlSurface.qWindowDist(spark, sf))) {
      val p = plan(q)
      assert(p.contains("Window"), p)
      assert(!p.contains("Exchange SinglePartition"), p)
    }
  }

  test("ntile deciles per nation are 1..10 and sized within one row of each other") {
    val rows = SqlSurface.qWindowNtile(spark, sf).collect()
    val byNation = rows.groupBy(_.get(0))
    byNation.foreach { case (_, rs) =>
      val deciles = rs.map(_.getInt(1)).sorted
      assert(deciles.head >= 1 && deciles.last <= 10)
      val counts = rs.map(_.getLong(2))
      assert(counts.max - counts.min <= 1, s"ntile buckets uneven: ${counts.mkString(",")}")
    }
  }

  test("grouping-set flags partition the output into the three declared sets") {
    val rows = SqlSurface.qGroupingSets(spark, sf).collect()
    // (g_flag, g_status) must be one of (0,0) detail, (0,1) per-flag, (1,1) grand total
    val byFlags = rows.groupBy(r => (r.getLong(2), r.getLong(3)))
    assert(byFlags.keySet.subsetOf(Set((0L, 0L), (0L, 1L), (1L, 1L))), byFlags.keySet)
    assert(byFlags((1L, 1L)).length === 1)
    // every aggregation level must total the same row count
    val detailN = byFlags((0L, 0L)).map(_.getLong(4)).sum
    val perFlagN = byFlags((0L, 1L)).map(_.getLong(4)).sum
    assert(detailN === perFlagN && detailN === byFlags((1L, 1L)).head.getLong(4))
  }

  test("dayofweek is 1=Sunday and weekofyear is ISO (Jan 1 2023 -> week 52)") {
    import spark.implicits._
    val d = Seq("2023-01-01").toDF("s").select(to_date($"s").as("d"))
    val r = d.select(dayofweek($"d"), weekofyear($"d")).head()
    assert(r.getInt(0) === 1) // Sunday
    assert(r.getInt(1) === 52) // ISO week of previous year
  }

  test("rolling RANGE frame is value-based: calendar gaps shrink the window") {
    val rows = SqlSurface.qRollingRange(spark, sf).collect()
    // replay the frame definition directly: for every output row, rolling_7d
    // must equal the sum of day_rev over rows of the same priority whose day
    // falls within [day-6, day] — a ROWS-based frame would disagree wherever
    // the daily series has a gap.
    val byPrio = rows.groupBy(_.getString(0))
    var gapChecked = false
    byPrio.foreach { case (_, rs) =>
      val series = rs.map(r => (r.getDate(1).toLocalDate, r.getDouble(2), r.getDouble(3)))
      series.foreach { case (day, _, roll) =>
        val expect = series.collect {
          case (d, rev, _) if !d.isAfter(day) && !d.isBefore(day.minusDays(6)) => rev
        }.sum
        assert(math.abs(roll - expect) < 1e-6, s"$day: $roll vs $expect")
      }
      val sorted = series.map(_._1).sorted.toSeq
      gapChecked ||= sorted.lazyZip(sorted.drop(1)).exists((a, b) => a.plusDays(1) != b)
    }
    assert(gapChecked, "fixture has no calendar gap — the RANGE/ROWS distinction is untested")
  }

  test("full outer join populates BOTH unmatched sides") {
    val rows = SqlSurface.qFullOuter(spark, sf).collect()
    // left-dangling: machinery customers with no urgent orders
    assert(rows.exists(r => r.getString(1) != "<no-customer>" && r.getLong(2) == 0L),
      "expected a segment customer with no urgent orders")
    // right-dangling: urgent-order customers outside the segment
    assert(rows.exists(r => r.getString(1) == "<no-customer>" && r.getLong(2) > 0L),
      "expected an urgent-order customer outside the segment")
    // coalesced key is never null and strictly increasing (deterministic order)
    assert(rows.forall(!_.isNullAt(0)))
    assert(rows.map(_.getLong(0)).toSeq == rows.map(_.getLong(0)).toSeq.sorted)
  }

  test("array funcs agree with direct computation on a known row") {
    import spark.implicits._
    val df = Seq((1L, "The data the DATA x")).toDF("doc_id", "text")
    val out = df.transform { in =>
      // same projection as qArrayFuncs, inlined over a controlled row
      in.select($"doc_id", TextOps.tokens($"text").as("t"))
        .select($"doc_id",
          size($"t").as("n_tokens"),
          size(array_distinct($"t")).as("n_distinct"),
          array_contains($"t", "data").as("has_data"),
          concat_ws(" ", slice($"t", 1, 2)).as("first2"))
    }.head()
    assert(out.getInt(1) === 5)
    assert(out.getInt(2) === 3) // {the, data, x}
    assert(out.getBoolean(3))
    assert(out.getString(4) === "the data")
  }
}
