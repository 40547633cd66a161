package graft

import org.apache.spark.sql.SparkSession

/** Second-decade scale probe (VERDICT r11 item 4): every 100× claim in
  * SCALE.md was extrapolated from one 10× measurement, so this main
  * measures the families most likely to break — graph (pagerank /
  * label_prop / triangles) and dedup pairs (threshold_sweep /
  * dedup_embedding) — at BOTH decades: sf1 (10×) and sf10 (100×),
  * synthesized by chaining [[ScaleProbe]] twice over only the tables the
  * probe queries read (lineitem, documents, embeddings — disk-bounded).
  *
  * Prints one JSON line
  * `{"metric":"sf10_probe","sf1_secs":{...},"sf10_secs":{...},
  *   "decade_ratios":{...}}` where decade_ratios = sf10/sf1 per query —
  * the second decade of each query's growth curve. Run manually:
  * `SPARK_GRAFT_CPUS=32 sbt "runMain graft.Sf10Probe"`.
  *
  * The probe runs at the same spark.sql.shuffle.partitions the bench
  * uses unless SPARK_GRAFT_SF10_PARTITIONS overrides it — at a real
  * 100×, partitions scale with input (AQE's initialPartitionNum); the
  * override exists to attribute a super-linear decade to partition
  * pressure vs plan shape.
  */
object Sf10Probe {

  val DefaultProbeQueries = Seq(
    "q_pagerank", "q_label_prop", "q_triangles",
    "q_dedup_threshold_sweep", "q_dedup_embedding")

  /** Override with SPARK_GRAFT_SF10_QUERIES=a,b,c — the probed queries
    * must read only the synthesized tables (lineitem, documents,
    * embeddings). */
  def probeQueries: Seq[String] =
    sys.env.get("SPARK_GRAFT_SF10_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty) // "" would silently run a zero-query probe
      .getOrElse(DefaultProbeQueries)

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val parts = sys.env.getOrElse("SPARK_GRAFT_SF10_PARTITIONS", cpus)
    val spark = GraftSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf01 = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sf1 = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft-sf1")
    val sf10 = sys.env.getOrElse("SPARK_GRAFT_SF10_DIR", "/tmp/graft-sf10")
    // extend with SPARK_GRAFT_SF10_TABLES when a probed query reads past
    // the default worst-family set (e.g. q_k_anonymity → orders)
    val tables = sys.env.get("SPARK_GRAFT_SF10_TABLES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set("lineitem", "documents", "embeddings"))
    if (!ScaleProbe.isSynthesized(sf01, sf1, ScaleProbe.AllTables))
      ScaleProbe.synthesize(spark, sf01, sf1)
    if (!ScaleProbe.isSynthesized(sf1, sf10, tables))
      ScaleProbe.synthesizeTables(spark, sf1, sf10, tables)

    // A failed run must NOT fold its elapsed wall time into the record
    // (ADVICE r12): a crash after 40 s would otherwise print as a real
    // 40 s timing and poison the decade ratio with no marker. Failures
    // return None and are listed under "failed" in the JSON line.
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    def time(name: String, dir: String): Option[Double] = {
      Caches.releaseAll(spark)
      System.gc()
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
        Some((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        System.err.println(s"[sf10] $name @ $dir failed: ${e.getMessage}")
        failed += s"$name@$dir"
        None
      }
    }

    def sec(v: Option[Double]): String = v match {
      case Some(d) => String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
      case None    => "null"
    }
    val rows = probeQueries.map { q =>
      val t1 = time(q, sf1)
      val t10 = time(q, sf10)
      val ratio = for (a <- t1; b <- t10) yield b / math.max(a, 1e-3)
      (q, t1, t10, ratio)
    }
    def m(f: ((String, Option[Double], Option[Double], Option[Double])) => String): String =
      rows.map(r => "\"" + r._1 + "\":" + f(r)).mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"sf10_probe","cpus":$cpus,"partitions":$parts""" +
      s""","sf1_secs":${m(r => sec(r._2))},"sf10_secs":${m(r => sec(r._3))}""" +
      s""","decade_ratios":${m(r => sec(r._4))},"failed":$failedJson}""")
    spark.stop()
  }
}
