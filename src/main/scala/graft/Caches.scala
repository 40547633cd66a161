package graft

import org.apache.spark.sql.SparkSession

/** The engine's cache-release contract: operators that persist an
  * internal relation (the triangle edge list, the sparse-join tf
  * relation, …) return a LIVE plan and leave the cache for the CALLER to
  * release after materialization — eager in-operator cleanup would force
  * the whole computation at plan-construction time and truncate the
  * lineage callers (and the plan-shape specs) inspect.
  *
  * Bench and Verify call [[releaseAll]] between queries; a library user
  * composing many operator invocations should do the same at their own
  * sink boundaries. CacheHygieneSpec pins that one release empties the
  * block manager.
  */
object Caches {
  /** Unpersist every cached/localCheckpointed RDD in the session —
    * safe once the query's result has been fully materialized.
    *
    * `df.persist` entries live in the SQL CacheManager: `clearCache`
    * both unpersists their blocks AND drops the entries. An RDD-level
    * unpersist alone leaves the entry registered, so any identical later
    * plan "hits" a dead cache and silently recomputes uncached —
    * CacheHygieneSpec pins this. localCheckpoint RDDs persist directly
    * at the RDD level, hence the second sweep.
    */
  def releaseAll(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }
}
