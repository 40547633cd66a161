package graft.ops

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Pins the constraint-report mechanics on controlled data (the oracle
  * gate sees only the clean corpus, where every check passes) and the
  * one-scan plan shape of the row-check pass.
  */
class ChecksSpec extends SparkFunSuite {

  test("audit reports degrade gracefully on empty tables (no ANSI divide-by-zero)") {
    val sf = "/root/testdata/sf0.001"
    val d = tmpDir("empty-tables")
    Tables.table(spark, sf, "lineitem").limit(0)
      .write.parquet(s"$d/lineitem.parquet")
    Tables.table(spark, sf, "documents").limit(0)
      .write.parquet(s"$d/documents.parquet")
    // encoding audit: one row per audited column, zeros — not an abort
    val enc = Checks.qEncodingStats(spark, d).collect()
    assert(enc.length === Checks.EncodingCols.length)
    enc.foreach { r =>
      assert(r.getAs[Long]("n") === 0L)
      assert(r.getAs[Long]("dict_bp") === 0L)
    }
    // dedup savings report: both strategy rows at 0 removed — not an abort
    val sav = Dedup.qDedupSavings(spark, d).collect()
    assert(sav.length === 2)
    sav.foreach(r => assert(r.getAs[Long]("removed_bp") === 0L))
  }

  test("row checks count planted violations exactly") {
    import spark.implicits._
    val df = Seq((1, 10.0), (2, -3.0), (3, 200.0), (4, 50.0)).toDF("id", "v")
    val rep = Checks.report(df, Seq(
      Checks.RowCheck("v_in_0_100", col("v") < 0 || col("v") > 100),
      Checks.RowCheck("v_not_null", col("v").isNull)))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(rep("v_in_0_100") === ((2L, false)))
    assert(rep("v_not_null") === ((0L, true)))
  }

  test("duplicate-key and orphan checks find planted problems") {
    import spark.implicits._
    val child = Seq((1, 1), (1, 1), (2, 7)).toDF("k", "sub")
    val parent = Seq(1).toDF("pk")
    val dup = Checks.duplicateKeys(child, Seq(col("k"), col("sub")), "pk").head()
    assert(dup.getLong(1) === 1L && !dup.getBoolean(2))
    val orph = Checks.orphans(child, col("k"), parent, col("pk"), "fk").head()
    assert(orph.getLong(1) === 1L && !orph.getBoolean(2))
  }

  test("MAD outliers: planted median/MAD and the robustness property") {
    val dir = "/root/testdata/sf0.001"
    val out = Checks.qOutlierMad(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, k, med, mad) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(k >= 0 && k <= n)
      assert(med > 0 && mad >= 0)
      // robust flag rate: 1.5·MAD on unimodal data flags a minority
      assert(k.toDouble / n < 0.5, s"flagged $k of $n")
    }
    // hand-computed fixture: odd count → exact middle; MAD of
    // {1,2,3,4,100} is median{2,1,0,1,97} = 1; devs 2 (x=1) and 97
    // (x=100) exceed 1.5·MAD = 1.5
    import spark.implicits._
    val df = Seq(1L, 2L, 3L, 4L, 100L).toDF("x")
    val med = df.agg(expr("percentile(x, 0.5)")).head().getDouble(0)
    assert(med === 3.0)
    val mad = df.select(abs(col("x") - lit(med)).as("d"))
      .agg(expr("percentile(d, 0.5)")).head().getDouble(0)
    assert(mad === 1.0)
    val flagged = df.filter(abs(col("x") - lit(med)) * 2 > lit(mad) * 3).count()
    assert(flagged === 2L)
  }

  test("k-anonymity: no released group is smaller than k, totals preserved") {
    val dir = "/root/testdata/sf0.001"
    val out = Checks.qKAnonymity(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val released = out.filter(r => r._1 != "*" && r._2 != "*")
    assert(released.nonEmpty && released.forall(_._3 >= 5L))
    val total = out.map(_._3).sum
    assert(total === Tables.table(spark, dir, "orders").count())
    // suppression is all-or-nothing: a row is fully starred or not at all
    assert(out.forall(r => (r._1 == "*") == (r._2 == "*")))
  }

  test("equi-depth histogram buckets are balanced within one row") {
    val out = Checks.qHistogramEquiDepth(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.map(_._1).toSeq === Seq(0, 1, 2, 3))
    val ns = out.map(_._2)
    assert(ns.max - ns.min <= 1, s"unbalanced buckets: ${ns.toSeq}")
    // bucket ranges are disjoint and ordered
    out.sliding(2).foreach { case Array(a, b) => assert(a._4 <= b._3) }
  }

  test("reconciliation: orphan headers counted, totals cover every order") {
    val dir = "/root/testdata/sf0.001"
    val out = Checks.qReconciliation(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    assert(out.map(_._2).sum === Tables.table(spark, dir, "orders").count())
    // the synthetic generator enforces NO header-detail invariant: every
    // non-orphan order mismatches, and the 27 detail-less orders surface
    // as orphans (counts pinned by the DuckDB cross-check)
    assert(out.map(_._3).sum === 27L)
    out.foreach { case (_, n, orphans, mismatched) =>
      assert(orphans + mismatched === n)
    }
  }

  test("the row-check suite is one scan: a single aggregate over one file scan") {
    val df = Checks.report(
      Tables.table(spark, "/root/testdata/sf0.001", "lineitem"),
      Seq(Checks.RowCheck("a", col("l_quantity") < 0),
        Checks.RowCheck("b", col("l_discount") > 1)))
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.linesIterator.count(_.matches("\\(\\d+\\) Scan parquet.*")) === 1, p)
    assert(!p.contains("Join"), p)
  }

  test("benford: hand-computed digit shares and deviations on planted amounts") {
    import spark.implicits._
    // 5 amounts starting with 1, 3 with 2, 2 with 9 → obs 5000/3000/2000
    // bp; deviations vs the authored Benford table 3010/1760/457
    val prices = Seq(101.5, 150.0, 199.99, 1234.0, 10.0,
      201.0, 250.5, 29999.0, 900.0, 987.65)
    val dir = tmpDir("benford")
    prices.toDF("o_totalprice").write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Checks.qBenford(spark, dir).collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet === Set(1, 2, 9))
    assert(got(1) === ((5L, 5000L, 3010L, 1990L)))
    assert(got(2) === ((3L, 3000L, 1760L, 1240L)))
    assert(got(9) === ((2L, 2000L, 457L, 1543L)))
  }

  test("fd check: a holding dependency reports zero violations, a broken one counts them") {
    import spark.implicits._
    // holds: k → v on {1→a, 1→a, 2→b}; broken: {1→a, 1→b, 2→c}
    val holds = Seq((1, "a"), (1, "a"), (2, "b")).toDF("k", "v")
    val broken = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "v")
    val g1 = Checks.fdCheck(holds, "holds", "k", "v").collect().head
    assert((g1.getLong(1), g1.getLong(2), g1.getLong(3), g1.getLong(4))
      === ((2L, 0L, 0L, 1L)))
    val g2 = Checks.fdCheck(broken, "broken", "k", "v").collect().head
    assert((g2.getLong(1), g2.getLong(2), g2.getLong(3), g2.getLong(4))
      === ((2L, 1L, 5000L, 2L)))
    // the authored profile: nation→region must hold on real data
    val prof = Checks.qFdCheck(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    assert(prof("nation_to_region") === 0L)
    assert(prof("cust_nation_to_segment") > 0L)
  }

  test("encoding profile: runs scoped within orders, exact dict/rle bp") {
    import spark.implicits._
    // order 1: A A B B → 2 runs; order 2: A B → 2 runs; 8 rows total for
    // col y: all identical → 2 runs (one per order), 1 distinct
    val rows = Seq(
      (1L, 1L, "A", "k"), (1L, 2L, "A", "k"), (1L, 3L, "B", "k"), (1L, 4L, "B", "k"),
      (2L, 1L, "A", "k"), (2L, 2L, "B", "k"), (2L, 3L, "B", "k"), (2L, 4L, "B", "k"))
      .toDF("ok", "ln", "x", "y")
    val got = Checks.encodingProfile(rows, Seq("x", "y")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq(
      ("x", 8L, 2L, 4L, 2500L, 5000L),
      ("y", 8L, 1L, 2L, 1250L, 2500L)))
  }

  test("fk audit: planted orphan counted on its edge only; clean edges zero") {
    import spark.implicits._
    val dir = tmpDir("fk-audit-fixture")
    // minimal warehouse with one orphaned lineitem.orderkey (777)
    Seq((1L, 10L, 100L), (2L, 10L, 100L), (777L, 10L, 100L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, 5L), (2L, 5L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((5L, 3L)).toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((100L, 3L)).toDF("s_suppkey", "s_nationkey")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq(Tuple1(10L)).toDF("p_partkey")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq((3L, 1L)).toDF("n_nationkey", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq(Tuple1(1L)).toDF("r_regionkey")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    val got = Checks.qFkAudit(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got("lineitem.orderkey->orders") == ((3L, 1L, 3333L)))
    assert(got.collect { case (fk, v) if fk != "lineitem.orderkey->orders" => v._2 }
      .forall(_ == 0L))
  }
}
