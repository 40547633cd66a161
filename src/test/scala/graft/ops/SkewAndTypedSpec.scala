package graft.ops

import graft.SparkFunSuite
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

object SkewAndTypedSpec {
  case class Line(l_returnflag: String, l_quantity: Double, l_extendedprice: Double)

  /** Typed Aggregator: price-weighted average quantity. */
  object WeightedAvg extends Aggregator[Line, (Double, Double), Double] {
    def zero: (Double, Double) = (0.0, 0.0)
    def reduce(b: (Double, Double), l: Line): (Double, Double) =
      (b._1 + l.l_quantity * l.l_extendedprice, b._2 + l.l_extendedprice)
    def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
      (x._1 + y._1, x._2 + y._2)
    def finish(r: (Double, Double)): Double = if (r._2 == 0) 0.0 else r._1 / r._2
    def bufferEncoder = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaDouble, org.apache.spark.sql.Encoders.scalaDouble)
    def outputEncoder = org.apache.spark.sql.Encoders.scalaDouble
  }
}

/** Skew-salting equality + the typed Dataset/Aggregator surface. */
class SkewAndTypedSpec extends SparkFunSuite {
  import SkewAndTypedSpec._

  private val sf = "/root/testdata/sf0.001"

  test("salted join equals plain join and spreads the hot key") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val ord = spark.read.parquet(s"$sf/orders.parquet")
    val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    val salted = Skew.saltedJoin(li, ord, "l_orderkey", "o_orderkey", saltBuckets = 8)
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    val a = plain.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val b = salted.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(a == b)
  }

  test("AQE splits a skewed shuffle partition (the safety net behind manual salting)") {
    // SCALE.md's fact-fact story: manual salting handles KNOWN hot keys;
    // AQE's skew-join split is the runtime net for skew nobody predicted.
    // Plant a 90%-hot key, shrink the skew thresholds to test scale, force
    // a shuffled join, and assert the executed adaptive plan actually
    // split the skewed partition.
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // ~90% of 200k left rows share k=7; 64-byte payload makes the hot
      // partition ~14 MB >> threshold while the median partition is tiny
      val left = spark.range(0, 200000).select(
        when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
        lpad(col("id").cast("string"), 64, "0").as("pad"))
      val right = spark.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("v"))
      val joined = left.join(right, "k")
      // materialize through THIS QueryExecution (a write would clone the
      // plan into its own execution and leave this one un-finalized)
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), p)
      assert(p.contains("skew=true") || p.contains("skewed"),
        s"adaptive plan did not split the skewed partition\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("typed Dataset pipeline with a custom Aggregator") {
    import spark.implicits._
    val ds = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_returnflag", "l_quantity", "l_extendedprice")
      .as[Line]
    val typed = ds.groupByKey(_.l_returnflag)
      .agg(WeightedAvg.toColumn.name("wavg"))
      .collect().toMap
    // cross-check against the untyped formulation
    val untyped = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg((sum(col("l_quantity") * col("l_extendedprice")) / sum(col("l_extendedprice"))).as("wavg"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(typed.keySet == untyped.keySet)
    typed.foreach { case (k, v) =>
      assert(math.abs(v - untyped(k)) < 1e-9, s"$k: $v vs ${untyped(k)}")
    }
    // registered as a SQL-callable UDAF too
    spark.udf.register("wavg_qty", org.apache.spark.sql.functions.udaf(WeightedAvg))
    spark.read.parquet(s"$sf/lineitem.parquet").createOrReplaceTempView("li_typed")
    val viaSql = spark.sql(
      "SELECT l_returnflag, wavg_qty(l_returnflag, l_quantity, l_extendedprice) FROM li_typed GROUP BY l_returnflag")
    assert(viaSql.count() == typed.size)
  }
}
