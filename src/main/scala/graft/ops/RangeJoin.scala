package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join expressed as an equi join: point-in-interval
  * matching is a nested-loop at scale if written naively (`t >= start AND
  * t < end`), because Catalyst has no equi key to hash on. Bucketing the
  * time axis converts it: each interval explodes into the buckets it
  * covers, points map to one bucket, the join runs hash-partitioned on
  * (bucket [, key]) and an exact residual filter keeps semantics.
  *
  * Cost: interval replication × ceil(length/bucket); pick `bucketSeconds`
  * near the median interval length. This is the standard scalable
  * interval-join shape (used by every interval library on Spark).
  */
object RangeJoin {

  /** Join `points` (timestamp `pointTs`) to `intervals`
    * ([`start`, `end`) timestamps), optionally also equi-keyed, returning
    * point columns + interval columns for every containing interval.
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointTs: String,
      start: String,
      end: String,
      bucketSeconds: Long,
      pointKey: Option[String] = None,
      intervalKey: Option[String] = None): DataFrame = {
    require(pointKey.isDefined == intervalKey.isDefined)
    val b = lit(bucketSeconds)
    val pB = points.withColumn("_bucket", (unix_timestamp(col(pointTs)) / b).cast("long"))
    val iB = intervals.withColumn("_bucket",
      explode(sequence(
        (unix_timestamp(col(start)) / b).cast("long"),
        (unix_timestamp(col(end)) / b).cast("long"))))
    val joinCond = (pointKey, intervalKey) match {
      case (Some(pk), Some(ik)) => pB(pk) === iB(ik) && pB("_bucket") === iB("_bucket")
      case _                    => pB("_bucket") === iB("_bucket")
    }
    pB.join(iB, joinCond)
      .filter(col(pointTs) >= col(start) && col(pointTs) < col(end))
      .drop("_bucket")
  }

  /** Interval×interval OVERLAP self-join on closed integer intervals
    * `[s, e]` (units of days/seconds/… — any long axis), equi-keyed by
    * `key` with a totally-ordered interval `id` for canonical pairs.
    * Same bucketization trick as [[pointInInterval]], plus the standard
    * first-shared-bucket dedup: two overlapping intervals both cover
    * `max(s_a, s_b)`, so each pair is counted exactly once in the bucket
    * holding that point — no distinct pass over the pair stream. An exact
    * residual (`s_a <= e_b AND s_b <= e_a`) keeps semantics.
    *
    * Scale: replication is ceil(length/bucket) per interval; the join is
    * hash-partitioned on (key, bucket) — never a nested loop — and the
    * dedup predicate is evaluated map-side on the joined row.
    */
  def intervalOverlap(
      intervals: DataFrame, key: String, id: String,
      s: String, e: String, bucketSize: Long): DataFrame = {
    val iB = intervals.withColumn("_b",
      explode(sequence(expr(s"$s DIV $bucketSize"), expr(s"$e DIV $bucketSize"))))
    val a = iB.select(col(key).as("k"), col(id).as("id_a"),
      col(s).as("sa"), col(e).as("ea"), col("_b"))
    val b = iB.select(col(key).as("k"), col(id).as("id_b"),
      col(s).as("sb"), col(e).as("eb"), col("_b"))
    a.join(b, Seq("k", "_b"))
      .filter(col("id_a") < col("id_b"))
      .filter(col("sa") <= col("eb") && col("sb") <= col("ea"))
      .filter(col("_b") === expr(s"greatest(sa, sb) DIV $bucketSize"))
      .select(col("k"), col("id_a"), col("id_b"), col("sa"), col("ea"),
        col("sb"), col("eb"))
  }
}
