package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Generic as-of join: for every left row, attach the payload of the
  * latest right row that is strictly earlier by (time, tiebreak) within the
  * same key.
  *
  * Spark-first shape: union the two sides, one partition-by-key sort, a
  * running `last(payload, ignoreNulls)` over rows up to (but excluding) the
  * current row — O(n log n), one shuffle, no per-row lookup or range cross
  * join. This is the plan a dedicated ASOF JOIN operator would produce;
  * composing built-ins keeps it AQE/codegen-friendly, so no custom
  * SparkStrategy is needed (SURVEY §7.3 preference order (a)).
  */
object AsOfJoin {

  /**
   * @param left      rows to enrich (all its columns are preserved)
   * @param right     rows providing the as-of payload
   * @param key       equality key column name (both sides)
   * @param time      event-time column name (both sides)
   * @param tiebreak  total-order tiebreak column name (both sides) —
   *                  defines "earlier" at equal timestamps
   * @param rightPayload right columns to carry; emitted as `asof_<name>`
   */
  def join(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      tiebreak: String,
      rightPayload: Seq[String]): DataFrame = {
    val payloadType = StructType(rightPayload.map(n => right.schema(n)))
    val leftCols = left.columns.toIndexedSeq

    val l = left
      .withColumn("_asof_side", lit(1))
      .withColumn("_asof_p", lit(null).cast(payloadType))
    val r = right.select(
      (Seq(col(key), col(time), col(tiebreak), lit(0).as("_asof_side")) :+
        struct(rightPayload.map(col): _*).as("_asof_p")): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col(tiebreak), col("_asof_side"))
      .rowsBetween(Window.unboundedPreceding, -1)

    l.unionByName(r, allowMissingColumns = true)
      .withColumn("_asof_last", last(col("_asof_p"), ignoreNulls = true).over(w))
      .filter(col("_asof_side") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(n => col(s"_asof_last.$n").as(s"asof_$n")): _*)
  }
}
