package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints the headline JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`,
  * followed by one short `"metric":"total_recap"` line repeating the
  * headline numbers (tail-truncation insurance — a consumer keying on
  * `metric == "total"` sees exactly one line).
  *
  * Results are materialized through the `noop` sink — a bare `count()`
  * would let Catalyst prune projections and undercount the real work.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // GraftSession.builder: same extension-injected configuration the
    // correctness gate runs under (custom function/strategy/rule active)
    val spark = GraftSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session once (JVM/codegen/scheduler/whole-stage compile) so
    // the alphabetically-first query isn't charged ~6 s of bring-up cost.
    spark.range(1 << 20).selectExpr("sum(id) AS s")
      .write.format("noop").mode("overwrite").save()
    // Optional subset for local iteration, e.g. SPARK_GRAFT_ONLY=q01_pricing_summary,q_dedup_exact
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    // Best-of-N (default 2): the shared box this runs on shows roaming
    // contention spikes — a different query 5-10× slower each run while
    // measuring <1 s isolated (BASELINE.md documents the evidence). The
    // min over N runs is the engine-characteristic number; the per-run
    // plan/codegen work is identical, so this measures execution, not luck.
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt.max(1)
    // Contention sentinel: a FIXED constant-work aggregate timed before
    // every measured attempt. Its isolated cost is a known constant, so
    // inflated sentinel readings in the emitted JSON mark exactly which
    // measurements ran under shared-box load — the artifact carries its
    // own noise floor instead of needing an after-the-fact adjudication.
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      spark.range(1L << 22).selectExpr("sum(id * 2 + 1) AS s")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
    // Broadcast variables are reclaimed by the ContextCleaner only when
    // the DRIVER GC collects their references: over a 240-query suite the
    // 8 GiB heap accumulates hundreds of dead broadcast/checkpoint blocks
    // faster than incidental GC frees them, squeezing execution memory —
    // measured round 10 as 3-5× inflation of the LAST queries to run (the
    // sf1 probe: pagerank 16.2× there vs 3.1× in a clean JVM, identical
    // plans). A periodic explicit GC lets the cleaner drain; ~50 ms every
    // 24 queries, repaid many times over in the probe.
    var sinceGc = 0
    // counts QUERIES, not attempts (ADVICE r11): called once per query
    // below, so with best-of-N this really is every 24 queries as the
    // BASELINE notes state.
    def maybeGc(): Unit = { sinceGc += 1; if (sinceGc >= 24) { sinceGc = 0; System.gc() } }
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val attempts = (1 to runs).map { _ =>
        val calib = calibrate()
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        val elapsed = (System.nanoTime() - t0) / 1e9
        // Each query's consumed localCheckpoints/caches otherwise pile up in
        // the block manager across the 70+-query run, squeezing execution
        // memory for later queries (the roaming mid-suite slowdowns).
        // Safe between queries: every result was fully materialized above.
        Caches.releaseAll(spark)
        (elapsed, calib)
      }
      maybeGc()
      val (best, calibAtBest) = attempts.minBy(_._1)
      (name, best, calibAtBest, attempts.map(_._2))
    }
    // sf1 scale probe (round 10): synthesize the ~10× corpus in-engine
    // (ScaleProbe) and re-time the heavy tail once, so the emitted JSON
    // carries sf1/sf0.1 ratios — a super-linear regression fails loudly in
    // BENCH_r{N}.json instead of depending on a manual builder probe.
    // SPARK_GRAFT_SF1_PROBE: "auto" (default — run iff the bench dir looks
    // like sf0.1), "0"/"off", or "1". The probe is time-budgeted
    // (SPARK_GRAFT_SF1_BUDGET sec, default 2000); anything dropped is
    // listed in "sf1_skipped" — no silent caps.
    val sf1Enabled = sys.env.getOrElse("SPARK_GRAFT_SF1_PROBE", "auto") match {
      case "0" | "off" => false
      case "auto"      => sfDir.contains("sf0.1")
      case _           => true
    }
    val sf1Top = sys.env.getOrElse("SPARK_GRAFT_SF1_TOP", "20").toInt
    // 2000 → 2400 (ADVICE r13 item 3): the budget scales with the
    // best-of-2 attempt discipline — and in the FRESH probe JVM the
    // second attempt no longer rides a suite-warmed page cache, so the
    // old early-exit saving doesn't apply. The probe corpus synth and
    // JVM bring-up run before the probe's deadline starts, so the budget
    // buys measured attempts only.
    val sf1Budget = sys.env.getOrElse("SPARK_GRAFT_SF1_BUDGET", "2400").toDouble
    // probed regardless of rank: the two round-10 re-registered pair
    // queries (their sub-quadratic claim is exactly what the probe
    // audits), plus one representative per family that reads the
    // round-11-scaled events/orders tables — before round 11 those were
    // flat dimensions in the probe corpus, so this family's linearity was
    // argued rather than measured (VERDICT r10 item 4)
    val sf1Forced = Set(
      "q_dedup_embedding", "q_pipeline_crossmodal",
      "q_variant_extract", "q_interpolate", "q_m4_downsample",
      "q_target_encode", "q_events_funnel", "q_cusum_shift",
      // round 11: the two composites — their sub-linearity claims are the
      // integration story, so the probe audits them regardless of rank
      "q_pipeline_full", "q_intake",
      // round 12: the two r11 weak items — their fixes (hash-argmax LPA,
      // single-build packed-key trigram) dropped them below the top-20
      // cutoff, which would make their ratios invisible exactly when the
      // record needs to show the fix held
      "q_label_prop", "q_lm_trigram_score",
      // round 13: the new broadcast-apply classifier and the per-epoch
      // window packer — first decade measured the round they land
      "q_quality_classifier", "q_epoch_order",
      // round 13c: every new query measures its first decade the round it
      // lands — the composite, both single-aggregate audits, and the
      // burst walk+aggregate (exif_meta itself is a pure narrow codegen
      // walk; the media family's per-row linearity is established)
      "q_pipeline_gated", "q_epoch_mixing", "q_batch_buckets",
      "q_exif_burst_dedup",
      // round 14: every new query measures its first decade the round it
      // lands — the one-scan repetition profile + filter, the geo mix,
      // and the classifier-pre-gated intake composite (exif_thumb is a
      // pure narrow codegen walk like exif_meta — per-row linearity
      // established for the family)
      "q_doc_repetition", "q_repetition_filter", "q_geo_diversity_mix",
      "q_intake_gated", "q_pq_recon_error",
      // round 15: the full nine-gate composite and the HTML boilerplate
      // report measure their first decade the round they land
      // (q_html_extract itself is a pure narrow codegen walk — per-row
      // linearity established for the walker family)
      "q_intake_full", "q_html_boilerplate")
    // targets + denominators + quiet bar are computed HERE (the suite
    // leg owns them); the measurements run in a FORKED fresh JVM
    // (VERDICT r13 item 2 — see Sf1Probe's scaladoc for why), with the
    // old in-process path kept only as a loudly-labeled fallback.
    def sf1Targets: Seq[(String, Double)] = {
      val byName = results.map(r => r._1 -> r._2).toMap
      (results.sortBy(-_._2).map(_._1).take(sf1Top) ++
        results.map(_._1).filter(sf1Forced)).distinct.map(n => (n, byName(n)))
    }
    def sf1QuietBar: Double = {
      val suiteCalibs = results.flatMap(_._4).sorted
      if (suiteCalibs.isEmpty) 0.15
      else math.max(0.15, 2 * suiteCalibs(suiteCalibs.size / 2))
    }
    def forkSf1Probe(): Option[(String, Seq[(String, Double)])] =
      try {
        val base = java.io.File.createTempFile("graft-sf1-base", ".tsv")
        java.nio.file.Files.write(base.toPath,
          sf1Targets.map { case (n, s) => s"$n\t$s" }
            .mkString("", "\n", "\n").getBytes("UTF-8"))
        val out = java.io.File.createTempFile("graft-sf1-out", ".json")
        out.delete()
        val javaBin = System.getProperty("java.home") + "/bin/java"
        // the module opens Spark needs on JDK 17 (the parent was started
        // with the same set by sbt/spark-submit)
        val addOpens = Seq(
          "java.base/java.lang", "java.base/java.lang.invoke",
          "java.base/java.lang.reflect", "java.base/java.io",
          "java.base/java.net", "java.base/java.nio",
          "java.base/java.util", "java.base/java.util.concurrent",
          "java.base/java.util.concurrent.atomic",
          "java.base/sun.nio.ch", "java.base/sun.nio.cs",
          "java.base/sun.security.action", "java.base/sun.util.calendar",
        ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
        // child heap: a FRACTION of the parent's (ADVICE r14) — the
        // parent JVM (suite heap + cached pages) stays resident while the
        // child runs, so mirroring the full -Xmx can overcommit a box
        // provisioned for one heap and get the child OOM-killed mid-probe
        // (pressure the calibration sentinel cannot flag). 60% leaves the
        // resident parent room; SPARK_GRAFT_SF1_XMX overrides.
        val childXmx = sys.env.getOrElse("SPARK_GRAFT_SF1_XMX",
          (Runtime.getRuntime.maxMemory * 6 / 10).toString)
        val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
          s"-Xmx$childXmx",
          "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
          "-cp", System.getProperty("java.class.path"),
          "graft.Sf1Probe")).toArray
        val pb = new ProcessBuilder(cmd: _*)
        pb.environment().put("SPARK_GRAFT_SF1_BASE", base.getAbsolutePath)
        pb.environment().put("SPARK_GRAFT_SF1_OUT", out.getAbsolutePath)
        pb.environment().put("SPARK_GRAFT_SF1_BUDGET", sf1Budget.toString)
        pb.environment().put("SPARK_GRAFT_SF1_QUIETBAR", sf1QuietBar.toString)
        pb.environment().put("SPARK_GRAFT_CPUS", cpus)
        pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
        // child stdout would interleave with the parent's JSON lines —
        // the fragment arrives via the out file; keep stderr visible
        pb.redirectOutput(java.lang.ProcessBuilder.Redirect.DISCARD)
        pb.redirectError(java.lang.ProcessBuilder.Redirect.INHERIT)
        val p = pb.start()
        // wall cap = attempt budget + synth/bring-up headroom
        val ok = p.waitFor((sf1Budget * 1.2 + 600).toLong,
          java.util.concurrent.TimeUnit.SECONDS)
        if (!ok) {
          p.destroyForcibly()
          System.err.println("[bench] sf1 fork timed out — killed")
          None
        } else if (p.exitValue() != 0 || !out.exists()) {
          // distinguish a memory-killed fork (SIGKILL → 137) from a
          // genuine probe failure so a silently-degraded record is
          // attributable (ADVICE r14)
          val why = p.exitValue() match {
            case 137 => "exit 137 (SIGKILL — likely OOM-killed; " +
              "lower SPARK_GRAFT_SF1_XMX or free memory)"
            case 0 => "exit 0 but no output file"
            case other => s"exit $other"
          }
          System.err.println(s"[bench] sf1 fork failed: $why")
          None
        } else {
          val fragment = new String(
            java.nio.file.Files.readAllBytes(out.toPath), "UTF-8")
          // ratios arrive via the TSV side channel the probe writes next
          // to the fragment (ADVICE r14 — one serializer, no regex
          // re-parse of the JSON); absence just drops the recap digest
          val tsv = new java.io.File(out.getAbsolutePath + ".ratios.tsv")
          // readAllBytes + explicit UTF-8: the probe writes the TSV as
          // UTF-8, and a Source would leak its file handle per bench run
          // (ADVICE r15)
          val ratioRows =
            if (!tsv.exists()) Seq.empty[(String, Double)]
            else new String(java.nio.file.Files.readAllBytes(tsv.toPath), "UTF-8")
              .linesIterator.filter(_.nonEmpty)
              .flatMap { l =>
                l.split("\t") match {
                  case Array(k, v) => scala.util.Try((k, v.toDouble)).toOption
                  case _ => None
                }
              }.toSeq
          Some((fragment, ratioRows))
        }
      } catch { case e: Throwable =>
        System.err.println(s"[bench] sf1 fork failed: ${e.getMessage}")
        None
      }
    // Fallback only (fork failure): the pre-r14 in-process probe, with
    // every documented caveat about measuring in a suite-aged heap.
    def inProcessProbe(): (Seq[(String, Double, Double, Double, Boolean)], Seq[String], String) = {
      val dst = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft-sf1")
      ScaleProbe.synthesize(spark, sfDir, dst)
      // the probe measures 10× the data in the same heap the whole suite
      // just ran through — start it from a drained block manager, and
      // drain between probe queries (see maybeGc above)
      Caches.releaseAll(spark)
      System.gc()
      val targets = (results.sortBy(-_._2).map(_._1).take(sf1Top) ++
        results.map(_._1).filter(sf1Forced)).distinct
      val byName = results.map(r => r._1 -> r._2).toMap
      val deadline = System.nanoTime() + (sf1Budget * 1e9).toLong
      val done = scala.collection.mutable.ArrayBuffer.empty[(String, Double, Double, Double, Boolean)]
      val skipped = scala.collection.mutable.ArrayBuffer.empty[String]
      val failed = scala.collection.mutable.ArrayBuffer.empty[String]
      // Contention-proofing (VERDICT r12 item 1) + attempt SYMMETRY
      // (round 13c): the r12 record carried 23× for a plan that measures
      // 2.89× clean (one unflagged run, roaming load); the r13 records
      // then swung 3.8×–11.4× for the SAME pagerank plan because the
      // suite leg is best-of-N (warm: footers cached, codegen compiled)
      // while the sf1 leg was a single COLD attempt retried only when
      // the sentinel was hot — a warm denominator under a cold numerator
      // overstates every unretried ratio. Every sf1 entry now gets the
      // SAME best-of-2 the suite leg got (budget-guarded), carries its
      // own sentinel reading, and is listed under "sf1_contended" if the
      // kept attempt's sentinel exceeds the quiet bar (2× the suite's
      // median, floored at 150 ms) — a hot or cold-start ratio can no
      // longer be mistaken for a plan property.
      val suiteCalibs = results.flatMap(_._4).sorted
      val quietBar =
        if (suiteCalibs.isEmpty) 0.15
        else math.max(0.15, 2 * suiteCalibs(suiteCalibs.size / 2))
      targets.foreach { name =>
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
                System.err.println(s"[bench] sf1 $name failed: ${e.getMessage}")
                false
              }
            val elapsed = (System.nanoTime() - t0) / 1e9
            Caches.releaseAll(spark)
            System.gc()
            // a failed run's wall time is NOT a timing — drop the entry
            if (ok) Some((elapsed, calib)) else None
          }
          attempt() match {
            case None => failed += name
            case Some(first) =>
              val best =
                if (System.nanoTime() > deadline) first
                else attempt().map(s => if (s._1 < first._1) s else first).getOrElse(first)
              done += ((name, best._1, best._1 / math.max(byName(name), 1e-3),
                best._2, best._2 > quietBar))
          }
        }
      }
      (done.toSeq, skipped.toSeq ++ failed.map(_ + ":failed"), dst)
    }

    // Locale.ROOT: f"" uses the default locale — a comma decimal separator
    // would corrupt the JSON line.
    def sec(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def ms(v: Double): String = math.round(v * 1000).toString
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + sec(v) }
      .mkString("{", ",", "}")
    // per-query sentinel reading from the attempt that produced the best
    // time (ms) — an inflated entry means that measurement ran under load
    val calibQs = results.map { case (k, _, c, _) => "\"" + k + "\":" + ms(c) }
      .mkString("{", ",", "}")
    val allCalibs = results.flatMap(_._4).sorted
    def pct(p: Double): Double =
      if (allCalibs.isEmpty) 0.0
      else allCalibs(math.min(allCalibs.size - 1, (p * allCalibs.size).toInt))
    val calibStats =
      s"""{"n":${allCalibs.size},"median_ms":${ms(pct(0.5))},""" +
        s""""p90_ms":${ms(pct(0.9))},"max_ms":${ms(allCalibs.lastOption.getOrElse(0.0))}}"""
    val total = results.map(_._2).sum
    def r2(v: Double): String = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    // sf1Json is the spliced fragment; sf1RatioRows is the SAME data as
    // rows for the recap digest — one machine-readable channel (the
    // probe's ratios TSV / the fallback's own rows) feeds both, instead
    // of the recap re-parsing ratios out of the serialized JSON with a
    // format-fragile regex (ADVICE r14).
    val (sf1Json, sf1RatioRows) =
      if (!sf1Enabled) ("", Seq.empty[(String, Double)])
      else forkSf1Probe() match {
        case Some((fragment, ratioRows)) => ("," + fragment, ratioRows)
        case None =>
          val (sf1Rows, sf1Skipped, sf1Dir) = inProcessProbe()
          val ratios = sf1Rows.map { case (k, _, r, _, _) => "\"" + k + "\":" + r2(r) }
            .mkString("{", ",", "}")
          val secs = sf1Rows.map { case (k, s, _, _, _) => "\"" + k + "\":" + sec(s) }
            .mkString("{", ",", "}")
          val calibs = sf1Rows.map { case (k, _, _, c, _) => "\"" + k + "\":" + ms(c) }
            .mkString("{", ",", "}")
          val contended = sf1Rows.collect { case (k, _, _, _, true) => "\"" + k + "\"" }
            .mkString("[", ",", "]")
          val skip = sf1Skipped.map("\"" + _ + "\"").mkString("[", ",", "]")
          (s""","sf1_ratios":$ratios,"sf1_secs":$secs,"sf1_calib_ms":$calibs""" +
            s""","sf1_contended":$contended,"sf1_skipped":$skip,"sf1_dir":"$sf1Dir"""" +
            s""","sf1_jvm":"shared-fallback"""",
            sf1Rows.map { case (k, _, r, _, _) => (k, r) })
      }
    // Every ServingIndexes/model first build this run triggered, with its
    // wall seconds (VERDICT r16 item 3a): the record carries the true
    // cost of each stored artifact/session model instead of hiding it in
    // a discarded best-of-N first attempt. Sorted for a stable record.
    val buildLog = ServingIndexes.buildLog.toSeq.sortBy(_._1)
    val buildJson = buildLog
      .map { case (k, s) => "\"" + k + "\":" + sec(s) }.mkString("{", ",", "}")
    val buildTotal = buildLog.map(_._2).sum
    val totalLine = s"""{"metric":"total","value":${sec(total)},"unit":"sec","queries":$qs,"calib_ms":$calibQs,"calib":$calibStats,"runs":$runs,"artifact_build_sec":$buildJson,"artifact_build_total_sec":${sec(buildTotal)},"sf":"$sfDir"$sf1Json}"""
    // The per-round harness keeps only the TAIL of stdout (2000 chars), so
    // the full 293-query map NEVER survives into BENCH_r{N}.json — r10..r16
    // all have `parsed: null` because the only line carrying
    // `"metric":"total"` lost its head (VERDICT r16 item 2, broken for 7
    // rounds). The full line therefore goes to the repo files ONLY
    // (BENCH_FULL.json = latest run, BENCH_HISTORY.jsonl = one line per
    // run for tools/bench_diff.py), and stdout carries exactly ONE
    // `"metric":"total"` line — the compact recap printed LAST below, small
    // enough (≤1500 chars) to survive any tail capture intact.
    try {
      val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL", "BENCH_FULL.json")
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        (totalLine + "\n").getBytes("UTF-8"))
      val hist = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_HISTORY", "BENCH_HISTORY.jsonl"))
      java.nio.file.Files.write(hist, (totalLine + "\n").getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] full-JSON persist failed: ${e.getMessage}")
    }
    val top10 = results.sortBy(-_._2).take(10)
      .map { case (k, v, _, _) => "\"" + k + "\":" + sec(v) }.mkString("{", ",", "}")
    // recap's worst-ratio digest from the machine-readable ratio rows
    val sf1Recap =
      if (sf1RatioRows.isEmpty) ""
      else {
        val worst = sf1RatioRows.sortBy(-_._2).take(5)
          .map { case (k, r) => "\"" + k + "\":" + r2(r) }.mkString("{", ",", "}")
        s""","sf1_n":${sf1RatioRows.size},"sf1_worst_ratios":$worst"""
      }
    // Assemble the compact line under the 1500-char budget: the optional
    // digests are dropped (loudly, via "omitted") before the itemized
    // build log, which is dropped last in favour of its total.
    def compact(withTop10: Boolean, withSf1: Boolean, withBuilds: Boolean): String = {
      val opt = (if (withBuilds) s""","artifact_build_sec":$buildJson""" else ""","artifact_build_omitted":"see BENCH_FULL.json"""") +
        s""","artifact_build_total_sec":${sec(buildTotal)}""" +
        (if (withTop10) s""","top10":$top10""" else "") +
        (if (withSf1) sf1Recap else "")
      s"""{"metric":"total","value":${sec(total)},"unit":"sec","n_queries":${results.size},"runs":$runs,"sf":"$sfDir","calib":$calibStats,"full":"BENCH_FULL.json"$opt}"""
    }
    val recapLine = Seq(
      compact(withTop10 = true, withSf1 = true, withBuilds = true),
      compact(withTop10 = false, withSf1 = true, withBuilds = true),
      compact(withTop10 = false, withSf1 = false, withBuilds = true),
      compact(withTop10 = false, withSf1 = false, withBuilds = false))
      .find(_.length <= 1500)
      .getOrElse(compact(withTop10 = false, withSf1 = false, withBuilds = false))
    spark.stop()
    // printed after spark.stop() so no late executor/log line can follow
    // it: the LAST stdout line is the one `"metric":"total"` JSON.
    println(recapLine)
  }
}
