package graft.ops

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Pins the constraint-report mechanics on controlled data (the oracle
  * gate sees only the clean corpus, where every check passes) and the
  * one-scan plan shape of the row-check pass.
  */
class ChecksSpec extends SparkFunSuite {

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
}
