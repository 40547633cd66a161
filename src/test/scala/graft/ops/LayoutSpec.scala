package graft.ops

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Pins the Z-order layout: the interleave is a bijection, the z-ordered
  * write produces files whose per-file (a, b) bounding boxes are tight on
  * BOTH dimensions — the property parquet min-max pruning needs — and a
  * box filter touches fewer files than a single-column sort layout.
  */
class LayoutSpec extends SparkFunSuite {

  private val sf = "/root/testdata/sf0.001"

  test("zkey2/unzkey2 round-trip is the identity over the full 8-bit grid") {
    import spark.implicits._
    val grid = spark.range(256 * 256)
      .select((col("id") / 256).cast("long").as("a"),
        (col("id") % 256).cast("long").as("b"))
    val (ra, rb) = Layout.unzkey2(Layout.zkey2(col("a"), col("b"), 8), 8)
    val bad = grid.select(col("a"), col("b"), ra.as("ra"), rb.as("rb"))
      .filter(col("a") =!= col("ra") || col("b") =!= col("rb"))
    assert(bad.count() === 0)
  }

  test("zkey2 is monotone in box granularity: equal high bits => same quadrant") {
    import spark.implicits._
    // the top 2 bits of the z-key are (a's msb, b's msb): rows in the same
    // half-plane on both dimensions share the same top-2-bit prefix
    val df = Seq((5L, 9L), (130L, 200L), (7L, 250L)).toDF("a", "b")
      .select(shiftrightunsigned(Layout.zkey2(col("a"), col("b"), 8), 14).as("quad"),
        (col("a") >= 128).cast("int") * 2 + (col("b") >= 128).cast("int"))
    df.collect().foreach(r => assert(r.getLong(0) === r.getInt(1).toLong, r))
  }

  test("compact bin-packs many small files into byte-sized outputs, content intact") {
    val ev = Tables.events(spark, sf).select(col("event_id"), col("user_id"))
    val smallDir = tmpDir("small")
    ev.repartition(64).write.mode("overwrite").parquet(smallDir) // 64 tiny files
    val outDir = tmpDir("compacted")
    def parquetFiles(d: String) =
      new java.io.File(d).listFiles().filter(_.getName.endsWith(".parquet"))
    val inBytes = parquetFiles(smallDir).map(_.length()).sum
    val n = Layout.compact(spark, smallDir, outDir, targetBytes = inBytes / 4)
    assert(n <= 5, s"expected ~4 output files, planned $n")
    assert(parquetFiles(outDir).length === n)
    // identical content (multiset)
    val a = spark.read.parquet(smallDir).collect().map(_.toSeq).sortBy(_.toString)
    val b = spark.read.parquet(outDir).collect().map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq === b.toSeq)
  }

  test("hilbert key is a bijection with unit-step adjacency over the full grid") {
    val grid = spark.range(256 * 256)
      .select((col("id") / 256).cast("long").as("a"),
        (col("id") % 256).cast("long").as("b"))
    val keyed = Layout.withHilbertKey(grid, col("a"), col("b"), 8, "hd")
      .localCheckpoint()
    // bijection: 65536 distinct values spanning exactly [0, 65536)
    val agg = keyed.agg(countDistinct("hd"), min("hd"), max("hd")).head()
    assert(agg.getLong(0) === 65536L)
    assert(agg.getLong(1) === 0L && agg.getLong(2) === 65535L)
    // the Hilbert property Morton lacks: CONSECUTIVE curve positions are
    // Manhattan-distance exactly 1 apart — no seams anywhere on the grid
    val succ = keyed.as("u").join(
      keyed.select((col("hd") - 1).as("hd"), col("a").as("a2"), col("b").as("b2")).as("v"), "hd")
    val badSteps = succ.filter(
      abs(col("a") - col("a2")) + abs(col("b") - col("b2")) =!= 1).count()
    assert(badSteps === 0L)
  }

  test("native hilbert_key expression equals the projection chain on the full grid") {
    val grid = spark.range(256 * 256)
      .select((col("id") / 256).cast("long").as("a"),
        (col("id") % 256).cast("long").as("b"))
    // localCheckpoint before filtering: predicate pushdown would otherwise
    // substitute the chain alias through all 8 projections (the 4^bits
    // re-expansion the scaladoc warns about)
    val both = Layout.withHilbertKey(grid, col("a"), col("b"), 8, "chain")
      .withColumn("native", graft.functions.HilbertKey(col("a"), col("b"), 8))
      .localCheckpoint()
    assert(both.filter(col("chain") =!= col("native")).count() === 0L)
    // and through the SQL registration: same frame, no join
    graft.GraftSession.registerFunctions(spark)
    grid.createOrReplaceTempView("hgrid")
    val sqlMismatch = spark.sql(
      "SELECT a, b, hilbert_key(a, b, 8) AS hd FROM hgrid")
      .withColumn("native", graft.functions.HilbertKey(col("a"), col("b"), 8))
      .filter(col("hd") =!= col("native")).count()
    assert(sqlMismatch === 0L)
  }

  test("hilbert layout dominates morton on worst-dimension box width") {
    val m = Layout.qClusteringHealth(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("avg_width_bp")).toMap
    val hWorst = math.max(m(("hilbert", "qty")), m(("hilbert", "price")))
    val zWorst = math.max(m(("zorder", "qty")), m(("zorder", "price")))
    assert(hWorst <= zWorst, m)
  }

  test("layout drift: an unclustered append degrades health on every dimension") {
    val rows = Layout.qLayoutDrift(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("avg_width_bp"), r.getAs[Long]("max_width_bp"))).toMap
    Seq("qty", "price").foreach { dim =>
      val (cAvg, cMax) = rows(("clustered", dim))
      val (aAvg, aMax) = rows(("after_append", dim))
      assert(aAvg > cAvg, s"$dim: append must widen average boxes")
      assert(aMax >= cMax, s"$dim: append must not tighten the worst box")
    }
    // the clustered state matches q_clustering_health's hilbert rows —
    // drift measures a delta off the SAME baseline
    val health = Layout.qClusteringHealth(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("avg_width_bp")).toMap
    Seq("qty", "price").foreach { dim =>
      assert(rows(("clustered", dim))._1 === health(("hilbert", dim)))
    }
  }

  test("compaction plan: next-fit groups are contiguous, byte-preserving, boundary-true") {
    val rows = Layout.qCompactionPlan(spark, sf).collect()
    val files = Tables.table(spark, sf, "documents")
      .select(col("source"), col("doc_id"), length(col("text")).cast("long").as("bytes"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (src, grps) =>
      val sorted = grps.sortBy(_.getLong(1))
      // group ids contiguous from 0
      assert(sorted.map(_.getLong(1)).toSeq === (0L until sorted.length).toSeq)
      // groups tile the doc_id order with no gaps or overlaps
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"))
        case _ =>
      }
      // byte-preserving per source
      val srcFiles = files.filter(_._1 == src).sortBy(_._2)
      assert(sorted.map(_.getAs[Long]("grp_bytes")).sum === srcFiles.map(_._3).sum)
      // boundary rule: a group's id IS its first file's preceding-bytes DIV target
      val cumBefore = srcFiles.scanLeft(0L)(_ + _._3).init
      val startOf = srcFiles.map(_._2).zip(cumBefore).toMap
      sorted.foreach { g =>
        assert(g.getLong(1) === startOf(g.getAs[Long]("first_doc")) / Layout.CompactTargetBytes)
      }
      // every interior group CROSSES the boundary (next-fit closes on crossing):
      // its end offset reaches the next multiple of target
      sorted.init.zipWithIndex.foreach { case (g, i) =>
        val end = cumBefore(srcFiles.indexWhere(_._2 == g.getAs[Long]("first_doc"))) +
          g.getAs[Long]("grp_bytes")
        assert(end >= (i + 1) * Layout.CompactTargetBytes, s"$src group $i under target")
      }
    }
  }

  test("clustering health separates the layouts exactly as the theory says") {
    val m = Layout.qClusteringHealth(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("avg_width_bp")).toMap
    // single-column sort: own dimension near-perfect, the other un-skippable
    // (every granule spans the full qty domain => exactly 10000 bp)
    assert(m(("linear_price", "qty")) === 10000L, m)
    assert(m(("linear_price", "price")) * 5 < m(("zorder", "price")), m)
    // minimax: the z-order's WORST dimension beats the sort's worst dimension
    // — the whole point of interleaving (holds at any granule count)
    val zWorst = math.max(m(("zorder", "qty")), m(("zorder", "price")))
    val lWorst = math.max(m(("linear_price", "qty")), m(("linear_price", "price")))
    assert(zWorst < lWorst, m)
    // and the neglected dimension specifically improves >1.5x under z-order
    assert(m(("zorder", "qty")) * 3 < m(("linear_price", "qty")) * 2, m)
  }

  test("z-ordered write gives tight per-file boxes and prunes a box filter") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("sec"))
    val zDir = tmpDir("zorder")
    val sDir = tmpDir("singlesort")
    // quantize BOTH dimensions over their actual ranges so the interleaved
    // bits carry equal information — the min/max pre-pass the scaladoc
    // prescribes (control-plane scalars)
    val Array(uLo, uHi, tLo, tHi) =
      ev.agg(min("user_id"), max("user_id"), min("sec"), max("sec"))
        .head().toSeq.map(_.asInstanceOf[Long].toDouble).toArray
    Layout.writeZOrdered(ev,
      Layout.quantize(col("user_id"), uLo, uHi + 1, 8),
      Layout.quantize(col("sec"), tLo, tHi + 1, 8), 8, numFiles = 8, path = zDir)
    // baseline: sorted by time only (the layout you get from ingest order)
    ev.repartitionByRange(8, col("sec")).sortWithinPartitions(col("sec"))
      .write.mode("overwrite").parquet(sDir)

    def filesTouched(dir: String): Int = {
      // which files contain rows in the (user, time) box?
      val hit = spark.read.parquet(dir)
        .filter(col("user_id").between(10, 20))
        .select(input_file_name()).distinct().count()
      hit.toInt
    }
    val zFiles = filesTouched(zDir)
    val sFiles = filesTouched(sDir)
    // time-sorted layout scatters every user over all files; z-order keeps
    // a narrow user range in a subset of files
    assert(zFiles < sFiles, s"z-order touched $zFiles files, time-sort $sFiles")

    // and the per-file user_id spans must be tighter on average under z-order
    def meanSpan(dir: String): Double = {
      val spans = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map { f =>
          val r = spark.read.parquet(f.getAbsolutePath)
            .agg(min("user_id"), max("user_id")).head()
          r.getLong(1) - r.getLong(0)
        }
      spans.sum.toDouble / spans.length
    }
    assert(meanSpan(zDir) < meanSpan(sDir),
      s"z=${meanSpan(zDir)} vs sort=${meanSpan(sDir)}")
  }
}
