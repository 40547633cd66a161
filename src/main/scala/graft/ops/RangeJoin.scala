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
}
