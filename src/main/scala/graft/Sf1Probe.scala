package graft

/** FRESH-JVM sf1 scale probe (VERDICT r13 item 2): the in-suite probe
  * re-timed 10× data in the same JVM the whole 280-query suite had just
  * churned through — hundreds of dead broadcast/checkpoint blocks and an
  * aged heap that the contention sentinel cannot see (BASELINE.md
  * documents label_prop at 6× isolated vs 10.78× in-suite, and the r13
  * record carried q_lm_trigram_score at 12.78× on a QUIET sentinel for a
  * plan that measures ~4.7× clean). [[Bench]] now forks this main into
  * its own JVM — the same isolation [[Sf10Probe]] already gives the
  * decade measurements — so the standing BENCH_r{N}.json sf1 block
  * agrees with SCALE.md's isolated measures instead of disagreeing with
  * them every round.
  *
  * Contract with the parent (all via env):
  *  - SPARK_GRAFT_SF1_BASE: file of `name<TAB>suiteBestSec` lines, in
  *    probe order (the ratio denominators);
  *  - SPARK_GRAFT_SF1_DIR / SPARK_GRAFT_SF_DIR: probe corpus target /
  *    sf0.1 source (synthesized here if missing — in the fresh JVM, so
  *    the synth cost doesn't ride any measurement);
  *  - SPARK_GRAFT_SF1_BUDGET: seconds for the measured attempts;
  *  - SPARK_GRAFT_SF1_QUIETBAR: the suite-derived quiet sentinel bar
  *    (seconds) for the `sf1_contended` flag;
  *  - SPARK_GRAFT_SF1_OUT: where to write the JSON fragment the parent
  *    splices into the bench line (also printed to stdout).
  *
  * Attempt discipline matches the suite leg: best-of-2 per entry
  * (budget-guarded — in a cold JVM the first attempt carries codegen
  * compile + file-footer reads, exactly the asymmetry the r13c symmetry
  * fix addressed), a fixed-work calibration sentinel timed before every
  * attempt, failed runs dropped (listed `:failed`), never timed.
  */
object Sf1Probe {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf01 = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dst = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft-sf1")
    if (!ScaleProbe.isSynthesized(sf01, dst, ScaleProbe.AllTables))
      ScaleProbe.synthesize(spark, sf01, dst)
    val budget = sys.env.getOrElse("SPARK_GRAFT_SF1_BUDGET", "2000").toDouble
    val quietBar = sys.env.getOrElse("SPARK_GRAFT_SF1_QUIETBAR", "0.15").toDouble
    val base: Seq[(String, Double)] =
      scala.io.Source.fromFile(sys.env("SPARK_GRAFT_SF1_BASE")).getLines()
        .filter(_.nonEmpty).map { l =>
          val Array(n, s) = l.split("\t"); (n, s.toDouble)
        }.toSeq
    // Warm the session once so the first target isn't charged bring-up.
    spark.range(1 << 20).selectExpr("sum(id) AS s")
      .write.format("noop").mode("overwrite").save()
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      spark.range(1L << 22).selectExpr("sum(id * 2 + 1) AS s")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val deadline = System.nanoTime() + (budget * 1e9).toLong
    val done = scala.collection.mutable.ArrayBuffer.empty[(String, Double, Double, Double, Boolean)]
    val skipped = scala.collection.mutable.ArrayBuffer.empty[String]
    base.foreach { case (name, suiteBest) =>
      if (System.nanoTime() > deadline) skipped += name
      else {
        def attempt(): Option[(Double, Double)] = {
          val calib = calibrate()
          val t0 = System.nanoTime()
          val ok =
            try {
              SparkEntry.queries(name)(spark, dst).write.format("noop").mode("overwrite").save()
              true
            } catch { case e: Throwable =>
              System.err.println(s"[sf1probe] $name failed: ${e.getMessage}")
              false
            }
          val elapsed = (System.nanoTime() - t0) / 1e9
          Caches.releaseAll(spark)
          System.gc()
          if (ok) Some((elapsed, calib)) else None
        }
        attempt() match {
          case None => skipped += s"$name:failed"
          case Some(first) =>
            val best =
              if (System.nanoTime() > deadline) first
              else attempt().map(s => if (s._1 < first._1) s else first).getOrElse(first)
            done += ((name, best._1, best._1 / math.max(suiteBest, 1e-3),
              best._2, best._2 > quietBar))
        }
      }
    }
    def sec(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def r2(v: Double): String = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    def ms(v: Double): String = math.round(v * 1000).toString
    val ratios = done.map { case (k, _, r, _, _) => "\"" + k + "\":" + r2(r) }
      .mkString("{", ",", "}")
    val secs = done.map { case (k, s, _, _, _) => "\"" + k + "\":" + sec(s) }
      .mkString("{", ",", "}")
    val calibs = done.map { case (k, _, _, c, _) => "\"" + k + "\":" + ms(c) }
      .mkString("{", ",", "}")
    val contended = done.collect { case (k, _, _, _, true) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val skip = skipped.map("\"" + _ + "\"").mkString("[", ",", "]")
    val fragment =
      s""""sf1_ratios":$ratios,"sf1_secs":$secs,"sf1_calib_ms":$calibs""" +
        s""","sf1_contended":$contended,"sf1_skipped":$skip,"sf1_dir":"$dst"""" +
        s""","sf1_jvm":"fresh""""
    sys.env.get("SPARK_GRAFT_SF1_OUT").foreach { out =>
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        fragment.getBytes("UTF-8"))
      // machine-readable ratio side channel for the parent's recap digest
      // (ADVICE r14 — the parent must not regex-parse the JSON fragment)
      java.nio.file.Files.write(java.nio.file.Paths.get(out + ".ratios.tsv"),
        done.map { case (k, _, r, _, _) => s"$k\t${r2(r)}" }
          .mkString("", "\n", "\n").getBytes("UTF-8"))
    }
    println(s"{$fragment}")
    spark.stop()
  }
}
