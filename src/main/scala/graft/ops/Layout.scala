package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-layout operators: Z-order (Morton) clustering for multi-column
  * locality.
  *
  * Why this matters at 100 TB: parquet prunes row groups / files with
  * min-max statistics, but sorting on ONE column destroys locality on every
  * other column. Interleaving the bits of two (or more) quantized sort keys
  * gives each file a small bounding BOX in key space, so selective filters
  * on EITHER column (or both) skip most files. This is the standard layout
  * technique behind Delta/Iceberg `ZORDER BY` — implemented here as plain
  * Catalyst bit arithmetic (fully codegen'd, no UDF) + a range-partitioned
  * sorted write, so it works on any Spark 4 session with no table format.
  *
  * Scale shape: one pass, one range exchange (sampled boundaries), sorted
  * files out. The z-key is computed per-row from constants; quantization
  * bounds should come from table statistics or a cheap `agg(min, max)`
  * pre-pass (control-plane scalars, broadcast into the expression).
  */
object Layout {

  /** Quantize a numeric column into `[0, 2^bits)` given inclusive bounds.
    * Values are clamped, so out-of-range rows land in the edge cells rather
    * than corrupting the interleave.
    */
  def quantize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(hi > lo, s"quantize bounds must satisfy hi > lo, got [$lo, $hi]")
    val cells = (1L << bits).toDouble
    val scaled = (c.cast(DoubleType) - lit(lo)) / lit(hi - lo) * lit(cells)
    least(greatest(floor(scaled).cast(LongType), lit(0L)), lit((1L << bits) - 1))
  }

  /** Morton interleave of two already-quantized `[0, 2^bits)` longs:
    * bit i of `a` lands at position 2i+1, bit i of `b` at 2i. Pure bit
    * arithmetic — whole-stage codegen keeps this in the scan projection.
    */
  def zkey2(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      val abit = shiftleft(shiftrightunsigned(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
      val bbit = shiftleft(shiftrightunsigned(b, i).bitwiseAND(lit(1L)), 2 * i)
      abit.bitwiseOR(bbit)
    }.reduce(_ bitwiseOR _)
  }

  /** Inverse of [[zkey2]] — extract the two quantized keys back out
    * (used by specs to prove the interleave is a bijection).
    */
  def unzkey2(z: Column, bits: Int): (Column, Column) = {
    val a = (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(z, 2 * i + 1).bitwiseAND(lit(1L)), i)
    }.reduce(_ bitwiseOR _)
    val b = (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(z, 2 * i).bitwiseAND(lit(1L)), i)
    }.reduce(_ bitwiseOR _)
    (a, b)
  }

  /** Oracle query: per-event z-key over (quantized user_id, masked epoch
    * second) — pins [[quantize]] + [[zkey2]] bit-for-bit against a DuckDB
    * replay of the same bit arithmetic. Every-7th event keeps the
    * presentation sort small.
    */
  def qZOrderKey(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.filter(col("event_id") % 7 === 0)
      .select(
        col("event_id"),
        quantize(col("user_id"), 0d, 256d, 8).as("qa"),
        unix_timestamp(col("ts")).bitwiseAND(lit(1023L)).as("qb"))
      .select(col("event_id"), col("qa"), col("qb"),
        zkey2(col("qa"), col("qb"), 10).as("zkey"))
      .orderBy(col("event_id"))
  }

  val qZOrderKeySql: String = {
    val terms = (0 until 10).flatMap { i =>
      Seq(s"(((qa >> $i) & 1) << ${2 * i + 1})", s"(((qb >> $i) & 1) << ${2 * i})")
    }.mkString(" | ")
    s"""WITH q AS (
       |  SELECT event_id,
       |    least(greatest(CAST(floor(CAST(user_id AS DOUBLE) / 256.0 * 256.0) AS BIGINT), 0), 255) AS qa,
       |    (epoch_us(ts) // 1000000) & 1023 AS qb
       |  FROM events WHERE event_id % 7 = 0
       |)
       |SELECT event_id, qa, qb, $terms AS zkey
       |FROM q ORDER BY event_id""".stripMargin
  }

  /** Simulated file granule size for [[qSkippingStats]]. */
  val RowsPerFile = 512

  /** FILE-SKIPPING EFFECTIVENESS audit — the payoff metric that justifies
    * Z-ordering: lay lineitem out under (a) a single-column sort on price
    * and (b) the Morton order over (quantity, price), carve each layout
    * into [[RowsPerFile]]-row granules, compute per-granule min-max zone
    * maps, and count how many granules a 2-D predicate
    * family can SKIP — for a price-band predicate, a quantity-band
    * predicate, and their conjunction. The matrix IS the Z-order sales
    * pitch made measurable: the price-sorted layout prunes price
    * predicates perfectly and quantity predicates not at all, while the
    * z-order gives every granule a bounding box in (quantity, price)
    * space and prunes RESPECTABLY ON BOTH — exactly the min-max pruning
    * parquet row groups / Delta-Iceberg data files do, in exact basis
    * points.
    *
    * Scale: each layout is one [[Rank.globalRank]] pass (range exchange +
    * two scans, no single-reducer window) into a granule-keyed partial
    * aggregate, checkpointed at granule-count size so the three predicate
    * verdicts re-read the tiny zone-map relation, not the table. Ordering
    * is totalized by (key, orderkey, linenumber) so ranks — and therefore
    * granule boundaries — are engine-identical.
    */
  def qSkippingStats(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val li = Tables.table(spark, dir, "lineitem").select(
      col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
      col("l_quantity").cast(LongType).as("qty"),
      (col("l_extendedprice") * 100).cast(LongType).as("pc"))
    val keyed = li.select(col("ok"), col("ln"), col("qty"), col("pc"),
      zkey2(
        quantize(col("qty"), 0d, 51d, 8),
        quantize(col("pc").cast(DoubleType) / 100d, 900d, 105000d, 8), 8).as("zk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def zoneMaps(sortCols: Seq[Column]): DataFrame =
      Rank.globalRank(keyed, sortCols, 32)
        .select(expr(s"(rnk - 1) DIV $RowsPerFile").as("f"), col("qty"), col("pc"))
        .groupBy(col("f"))
        .agg(min(col("qty")).as("qmin"), max(col("qty")).as("qmax"),
          min(col("pc")).as("pmin"), max(col("pc")).as("pmax"))
        .localCheckpoint() // granule-count-sized; frees the rank lineage
    val priceHit = col("pmin") <= 3000000L && col("pmax") >= 2000000L
    val qtyHit = col("qmin") <= 20L && col("qmax") >= 10L
    val preds = Seq(("both", priceHit && qtyHit), ("price", priceHit), ("qty", qtyHit))
    val layouts = Seq(
      ("linear_price", zoneMaps(Seq(col("pc"), col("ok"), col("ln")))),
      ("zorder", zoneMaps(Seq(col("zk"), col("ok"), col("ln")))))
    val out = (for ((lname, files) <- layouts; (pname, hit) <- preds) yield files
      .agg(count(lit(1)).as("n_files"),
        sum(when(hit, 1L).otherwise(0L)).as("files_kept"))
      .select(lit(lname).as("layout"), lit(pname).as("predicate"),
        col("n_files"), col("files_kept"),
        expr("(n_files - files_kept) * 10000 DIV n_files").as("skip_bp")))
      .reduce(_ union _)
      .orderBy(col("layout"), col("predicate"))
    TextDedup.materializeAndRelease(out, keyed)
  }

  val qSkippingStatsSql: String = {
    val zterms = (0 until 8).flatMap { i =>
      Seq(s"(((qa >> $i) & 1) << ${2 * i + 1})", s"(((qb >> $i) & 1) << ${2 * i})")
    }.mkString(" | ")
    def layoutCte(name: String, order: String): String =
      s"""$name AS (
         |  SELECT qty, pc, (row_number() OVER (ORDER BY $order) - 1) // $RowsPerFile AS f
         |  FROM k
         |), ${name}_files AS (
         |  SELECT f, min(qty) AS qmin, max(qty) AS qmax,
         |    min(pc) AS pmin, max(pc) AS pmax
         |  FROM $name GROUP BY f
         |)""".stripMargin
    val priceHit = "pmin <= 3000000 AND pmax >= 2000000"
    val qtyHit = "qmin <= 20 AND qmax >= 10"
    def branch(layout: String, files: String, pred: String, hit: String): String =
      s"""SELECT '$layout' AS layout, '$pred' AS predicate,
         |  CAST(count(*) AS BIGINT) AS n_files,
         |  CAST(sum(CASE WHEN $hit THEN 1 ELSE 0 END) AS BIGINT) AS files_kept,
         |  CAST((count(*) - sum(CASE WHEN $hit THEN 1 ELSE 0 END)) * 10000
         |       // count(*) AS BIGINT) AS skip_bp
         |FROM $files""".stripMargin
    val branches = for {
      (layout, files) <- Seq(("linear_price", "lin_files"), ("zorder", "zo_files"))
      (pred, hit) <- Seq(("both", s"$priceHit AND $qtyHit"),
        ("price", priceHit), ("qty", qtyHit))
    } yield branch(layout, files, pred, hit)
    s"""WITH li AS (
       |  SELECT l_orderkey AS ok, l_linenumber AS ln,
       |    CAST(l_quantity AS BIGINT) AS qty,
       |    CAST(l_extendedprice * 100 AS BIGINT) AS pc
       |  FROM lineitem
       |), q AS (
       |  SELECT ok, ln, qty, pc,
       |    least(greatest(CAST(floor(CAST(qty AS DOUBLE) / 51.0 * 256.0) AS BIGINT), 0), 255) AS qa,
       |    least(greatest(CAST(floor((CAST(pc AS DOUBLE) / 100.0 - 900.0) / 104100.0 * 256.0) AS BIGINT), 0), 255) AS qb
       |  FROM li
       |), k AS (
       |  SELECT ok, ln, qty, pc, $zterms AS zk FROM q
       |), ${layoutCte("lin", "pc, ok, ln")}, ${layoutCte("zo", "zk, ok, ln")}
       |${branches.mkString("\nUNION ALL\n")}
       |ORDER BY layout, predicate""".stripMargin
  }

  def queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] =
    Map("q_zorder_key" -> (qZOrderKey _), "q_skipping_stats" -> (qSkippingStats _))

  def oracle: Map[String, String] = Map(
    "q_zorder_key" -> qZOrderKeySql,
    "q_skipping_stats" -> qSkippingStatsSql)

  /** Compact a directory of (typically many small) parquet files into
    * ~`targetBytes` output files — the small-files problem: a 100 TB table
    * accreted from streaming micro-batches or per-event writes ends up as
    * millions of KB-sized files whose open/footer overhead dominates scan
    * time. Output file count is sized from the INPUT byte total (cheap
    * driver-side listing, no data pass); pass `sortCols` to restore a
    * clustering (e.g. the z-key) while compacting, otherwise a
    * round-robin `repartition` balances bytes evenly.
    *
    * At scale run this per partition-directory (compaction of a live table
    * is per-partition and incremental); writing to a NEW directory + atomic
    * swap is the caller's transaction boundary, mirroring how table formats
    * commit compactions.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, inDir: String, outDir: String,
      targetBytes: Long = 128L * 1024 * 1024, sortCols: Seq[Column] = Nil): Int = {
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.listStatus(path)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(inDir)
    val arranged =
      if (sortCols.isEmpty) df.repartition(nFiles)
      else df.repartitionByRange(nFiles, sortCols: _*).sortWithinPartitions(sortCols: _*)
    arranged.write.mode("overwrite").parquet(outDir)
    nFiles
  }

  /** Write `df` clustered by the Morton order of two quantized key columns:
    * range-partition on the z-key (sampled boundaries → balanced files),
    * sort within partitions, drop the helper column, write parquet. Each
    * output file then covers a compact box in (a, b) space and parquet
    * min-max pruning works for filters on either dimension.
    */
  def writeZOrdered(df: DataFrame, a: Column, b: Column, bits: Int,
      numFiles: Int, path: String): Unit = {
    val keyed = df.withColumn("__zkey", zkey2(a, b, bits))
    keyed
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
      .write.mode("overwrite").parquet(path)
  }
}
