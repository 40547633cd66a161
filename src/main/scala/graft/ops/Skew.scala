package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted equi-join for hot keys (SCALE.md). AQE's skew
  * handling covers sort-merge joins at runtime; explicit salting is the
  * deterministic fallback when one build-side key dominates (e.g. a dedup
  * bucket or a celebrity user) and for aggregations.
  *
  * Shape: fact rows get a random-but-deterministic salt in [0, n); the
  * (small or skewed-key) side is replicated n× so every (key, salt) pair
  * matches — the hot key's rows spread across n reducers.
  */
object Skew {

  /** Inner equi-join `fact ⨝ other ON factKey = otherKey`, salted n ways.
    * Result equals the plain join (row multiset), partitions balanced.
    */
  def saltedJoin(
      fact: DataFrame,
      other: DataFrame,
      factKey: String,
      otherKey: String,
      saltBuckets: Int = 16): DataFrame = {
    val salted = fact.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets.toLong)).cast("int"))
    val replicated = other.withColumn("_salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    salted
      .join(replicated, col(factKey) === col(otherKey) && salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }

  /** Two-phase salted aggregation: partial by (key, salt) then final by
    * key — for severely skewed group-by keys. `aggs` must be decomposable
    * (sum/count/min/max); the caller re-aggregates the partials.
    */
  def saltedPartials(
      df: DataFrame,
      key: Column,
      saltBuckets: Int,
      partials: Seq[Column]): DataFrame =
    df.withColumn("_salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets.toLong)).cast("int"))
      .groupBy(key.as("key"), col("_salt"))
      .agg(partials.head, partials.tail: _*)
      .drop("_salt")
}
