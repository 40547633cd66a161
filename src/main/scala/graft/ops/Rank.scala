package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types._

/** Distributed global ranking — the scale path for `row_number() OVER
  * (ORDER BY ...)`: Spark's window formulation funnels every row through
  * ONE partition; this version range-partitions on the sort key, sorts
  * within partitions, counts rows per partition (a control-plane array of
  * `numParts` longs), and attaches `offset + local index` in a second
  * pass. Two passes over the data, no single-reducer stage, exact same
  * ranks as the window (the range exchange preserves the total order
  * across partition boundaries; sampling only moves the BOUNDS, never the
  * order, so ranks are deterministic regardless of sampled splits).
  */
object Rank {

  def globalRank(df: DataFrame, sortCols: Seq[Column], numParts: Int,
      rankName: String = "rnk"): DataFrame = {
    val spark = df.sparkSession
    val arranged = df.repartitionByRange(numParts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = arranged.rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _) // offsets(i) = rows before partition i
    val ranked = arranged.rdd.mapPartitionsWithIndex { (i, it) =>
      var r = offsets(i)
      it.map { row => r += 1; Row.fromSeq(row.toSeq :+ r) }
    }
    val out = spark.createDataFrame(ranked,
      StructType(arranged.schema.fields :+ StructField(rankName, LongType, nullable = false)))
    arranged.unpersist(blocking = false)
    out
  }
}
