package graft.ops

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Semantic properties of the training-corpus operators that the value
  * oracle can't express: the md5-derived decisions must be pure row
  * functions (stable under repartitioning — the reproducibility claim),
  * splits must cover every document exactly once, and packing must respect
  * the token budget for every chunk a document fits in.
  */
class CorpusSpec extends SparkFunSuite {

  test("target encoding is leave-one-out: the row's own label never leaks in") {
    val sf = "/root/testdata/sf0.001"
    val all = Tables.table(spark, sf, "orders")
      .join(Tables.table(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_mktsegment").as("cat"),
        when(col("o_orderpriority").startsWith("1"), 1L).otherwise(0L).as("y"))
      .collect()
    val byCat = all.groupBy(_.getString(1))
    val out = Corpus.qTargetEncode(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val cat = r.getString(1)
      val members = byCat(cat)
      val sumY = members.map(_.getLong(2)).sum
      val n = members.length.toLong
      val y = r.getAs[Long]("y")
      // LOO: subtracting THIS row's label, never another's
      assert(r.getAs[Long]("loo_bp") === (sumY - y) * 10000 / math.max(n - 1, 1))
      // two same-category rows with different labels must encode differently
      members.map(_.getLong(2)).distinct.sorted.toList match {
        case List(0L, 1L) =>
          val encs = out.filter(_.getString(1) == cat).map(o =>
            o.getAs[Long]("y") -> o.getAs[Long]("loo_bp")).toMap
          if (encs.size == 2) assert(encs(0L) > encs(1L),
            "excluding a positive label must lower the LOO mean")
        case _ =>
      }
    }
  }

  private val sf = "/root/testdata/sf0.001"

  test("split leakage: only the cross-split near-dup pair surfaces") {
    import spark.implicits._
    // md5-bucket splits (precomputed): 1→train, 8→test, 2→train, 3→train,
    // 16→val. Docs 1/8 are verbatim dups ACROSS train/test → the leak.
    // Docs 2/3 are verbatim dups WITHIN train → must NOT surface.
    // Doc 16 shares nothing → absent entirely.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "en", "s", 10L),
      (8L, "alpha beta gamma delta epsilon zeta", "en", "s", 10L),
      (2L, "one two three four five six seven", "en", "s", 10L),
      (3L, "one two three four five six seven", "en", "s", 10L),
      (16L, "p q r s t u v w x y z", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("leakage")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Dedup.qSplitLeakage(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), r.getDouble(4)))
    assert(out.toSeq === Seq((1L, 8L, "train", "test", 1.0)))
  }

  test("quality gate: per-source median floor, hand-computed odd/even cases") {
    import spark.implicits._
    // srcA (n=3, chars 10/20/30): median = position (3+1) DIV 2 = 2 → 20;
    // kept strictly above → 1 doc → 3333 bp.
    // srcB (n=4, chars 5/5/7/9): median = position 2 → 5; kept = {7,9} →
    // 2 docs → 5000 bp. Each source gets its OWN floor.
    val docs = Seq(
      (1L, "a", "en", "srcA", 10L), (2L, "b", "en", "srcA", 20L),
      (3L, "c", "en", "srcA", 30L),
      (4L, "d", "en", "srcB", 5L), (5L, "e", "en", "srcB", 5L),
      (6L, "f", "en", "srcB", 7L), (7L, "g", "en", "srcB", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("quality-gate")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Corpus.qQualityGate(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("srcA") === ((3L, 20L, 1L, 3333L)))
    assert(out("srcB") === ((4L, 5L, 2L, 5000L)))
  }

  test("bitext mining: only the cross-language near-dup pair surfaces") {
    import spark.implicits._
    // 1/2 verbatim dups ACROSS en/de → the bitext candidate; 3/4 verbatim
    // dups both en → suppressed; 5 unrelated.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "en", "s", 10L),
      (2L, "alpha beta gamma delta epsilon zeta", "de", "s", 10L),
      (3L, "one two three four five six seven", "en", "s", 10L),
      (4L, "one two three four five six seven", "en", "s", 10L),
      (5L, "p q r s t u v w x y z", "fr", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("bitext")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Dedup.qBitextMine(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), r.getDouble(4)))
    assert(out.toSeq === Seq((1L, 2L, "en", "de", 1.0)))
  }

  test("source pairs: the contamination matrix counts pairs by canonical source pair") {
    import spark.implicits._
    // srcA↔srcB verbatim dup (cross), srcA↔srcA verbatim dup (within);
    // the canonical orientation must not depend on doc order.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "en", "srcB", 10L),
      (2L, "alpha beta gamma delta epsilon zeta", "en", "srcA", 10L),
      (3L, "one two three four five six seven", "en", "srcA", 10L),
      (4L, "one two three four five six seven", "en", "srcA", 10L),
      (5L, "p q r s t u v w x y z", "fr", "srcC", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("source-pairs")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Dedup.qSourcePairs(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(out === Map(
      ("srcA", "srcA") -> ((1L, 1.0)),
      ("srcA", "srcB") -> ((1L, 1.0))))
  }

  test("stats manifest: known lineitem invariants hold") {
    val out = Checks.qStatsManifest(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.size === 7)
    val rf = out("l_returnflag")
    assert(rf._1 === "A" && rf._2 === "R" && rf._3 === 3L && rf._4 === 0L)
    assert(out("l_linenumber")._1 === "1")
    assert(out("l_shipdate")._1.matches("\\d{4}-\\d{2}-\\d{2}"))
    // ndv of the PK prefix equals the distinct order count
    val nOrders = Tables.table(spark, sf, "lineitem")
      .select(col("l_orderkey")).distinct().count()
    assert(out("l_orderkey")._3 === nOrders)
  }

  test("deterministic sample is invariant under repartitioning") {
    val a = Corpus.qSampleDet(spark, sf).collect().toSeq
    // Same decisions over a shuffled, re-sliced input: the hash membership
    // test is a pure row function, so the aggregate must be identical
    // (df.sample's per-partition PRNG would NOT survive this).
    val b = Corpus.sampleAgg(
      Tables.table(spark, sf, "lineitem").repartition(13)).collect().toSeq
    assert(a == b)
  }

  test("split assignment is total, disjoint, and id-stable") {
    val split = Corpus.qSplitAssign(spark, sf).cache()
    val docs = Tables.table(spark, sf, "documents")
    assert(split.count() == docs.count())
    assert(split.select("doc_id").distinct().count() == docs.count())
    val byName = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName.keySet.subsetOf(Set("train", "val", "test")))
    // ~80/10/10 within loose bounds at n=500
    val n = docs.count().toDouble
    assert(byName("train") / n > 0.7 && byName("train") / n < 0.9)
    // Re-run assigns every doc the same split (pure function of doc_id).
    val again = Corpus.qSplitAssign(spark, sf)
    assert(split.join(again, Seq("doc_id"))
      .filter(split("split") =!= again("split")).count() == 0)
    split.unpersist()
  }

  test("packing: every chunk except a shard's last starts within budget") {
    val chunks = Corpus.qPackSequences(spark, sf).collect()
    // chunk ids per shard are dense from 0 (no empty chunks emitted)
    chunks.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val ids = rows.map(_.getLong(1)).sorted
      assert(ids.head == 0 && ids.zipWithIndex.forall { case (id, i) => id == i })
    }
    // a chunk holds >= 1 doc and its doc count is bounded by budget only
    // when docs are non-empty; sanity: totals reconcile with the source
    val totalDocs = chunks.map(_.getLong(2)).sum
    assert(totalDocs == Tables.table(spark, sf, "documents").count())
  }

  test("stratified sample respects per-language rate ordering and is id-stable") {
    val out = Corpus.qSampleStratified(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = Tables.table(spark, sf, "documents").groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // realized keep-rates must order as the configured rates: en(0.5) >
    // zh(0.2) > others(0.1), with slack for n≈70 strata
    def rate(l: String) = out.getOrElse(l, 0L).toDouble / base(l)
    assert(rate("en") > rate("zh") && rate("zh") > rate("de"))
    assert(math.abs(rate("en") - 0.5) < 0.2, s"en rate ${rate("en")}")
    val again = Corpus.qSampleStratified(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == again)
  }

  test("quantile trim keeps ~90% of documents, inside the exact p5/p95") {
    val docs = Tables.table(spark, sf, "documents")
    val total = docs.count()
    val kept = Corpus.qQuantileTrim(spark, sf).collect().map(_.getLong(1)).sum
    assert(kept >= (total * 0.85).toLong && kept <= (total * 0.95).toLong,
      s"kept $kept of $total")
  }

  test("contamination excludes benchmark docs and counts shared shingles") {
    val out = Corpus.qContamination(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(0) % 20 != 0), "benchmark doc leaked into output")
    assert(out.forall(_.getLong(1) >= 1))
  }

  test("weighted sample biases toward long documents and is id-stable") {
    val docs = Tables.table(spark, sf, "documents")
    val overallAvg = docs.agg(avg(col("n_chars"))).head().getDouble(0)
    val out = Corpus.qSampleWeighted(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    // kept docs average longer than the corpus (selection ∝ length)
    val keptAvg = out.map(_._3).sum.toDouble / out.map(_._2).sum
    assert(keptAvg > overallAvg, s"kept avg $keptAvg vs corpus $overallAvg")
    val again = Corpus.qSampleWeighted(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === again.toSeq)
  }

  test("temperature sample: smallest source kept whole, thresholds flatten with size") {
    val rows = Corpus.qSampleTemperature(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // per-source: kept ⊆ source, threshold in (0, 10000]
    rows.foreach { case (s, nSrc, thr, nKept) =>
      assert(nKept <= nSrc, s"$s keeps more than it has")
      assert(thr > 0 && thr <= 10000, s"$s threshold $thr out of range")
    }
    // the smallest source's threshold is exactly 10⁴ (√(n_min/n_min)=1),
    // so every one of its documents survives — the α-sampling guarantee
    // that low-resource sources are never down-sampled
    val (_, nMin, thrMin, keptMin) = rows.minBy(_._2)
    assert(thrMin === 10000L && keptMin === nMin)
    // thresholds are non-increasing in source size (flattening, not
    // amplifying, the source distribution)
    val bySize = rows.sortBy(_._2).map(_._3)
    assert(bySize.zip(bySize.tail).forall { case (a, b) => b <= a })
  }

  test("quota sample: ≤10 docs per source, repartition-stable picks") {
    val out = Corpus.qSampleQuota(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out.nonEmpty)
    assert(out.forall(_._2 <= 10L), "quota exceeded")
    // picks are a pure function of doc_id hashes: re-running over a
    // re-sliced corpus selects the same documents (same sum_chars)
    val docs = Tables.table(spark, sf, "documents").repartition(13)
    val again = graft.plans.TopKPerKey
      .perKey(docs.withColumn("h", md5(col("doc_id").cast("string"))),
        Seq(col("source")), Seq(col("h").asc, col("doc_id").asc), k = 10)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        min(col("h")).as("first_hash"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out.sorted === again.sorted)
  }

  test("epoch order: repartition-invariant, epochs conserve mass but permute order") {
    val out = Corpus.qEpochOrder(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(out.nonEmpty)
    // md5-priority decisions are pure row functions: a re-sliced corpus
    // produces the identical epoch order (chunks, counts, first docs)
    val dir = tmpDir("epoch-order")
    Tables.table(spark, sf, "documents").repartition(13)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val again = Corpus.qEpochOrder(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(out === again)
    // every epoch consumes the whole corpus exactly once (same doc and
    // token mass per epoch) ...
    val byEpoch = out.groupBy(_._1)
    assert(byEpoch.keySet === (0L until Corpus.EpochCount.toLong).toSet)
    assert(byEpoch.values.map(_.map(_._4).sum).toSet.size === 1)
    assert(byEpoch.values.map(_.map(_._5).sum).toSet.size === 1)
    // ... but the md5(epoch:doc_id) priority re-shuffles it: the
    // (shard, chunk, first_doc) layout must differ across epochs
    val layouts = byEpoch.view.mapValues(_.map(t => (t._2, t._3, t._6)).toSet).toMap
    assert(layouts(0L) !== layouts(1L))
  }

  test("epoch shard files come out in training order and cover every epoch exactly once") {
    val out = tmpDir("epoch-shards")
    val n = Corpus.writeEpochShards(spark, sf, out)
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(n === total * Corpus.EpochCount)
    // the expected order per shard, independently recomputed
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id")).collect().map(_.getLong(0))
    def h(e: Long, id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$e:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(4).map(b => f"$b%02x").mkString, 16)
    }
    (0L until Corpus.EpochCount.toLong).foreach { e =>
      (0L until Corpus.EpochShards.toLong).foreach { s =>
        val want = docs.map(id => (h(e, id), id))
          .filter { case (hh, _) => hh % Corpus.EpochShards == s }
          .sorted.map(_._2).toSeq
        // one task wrote the shard, so one file; parquet preserves the
        // written row order within a file — this IS the loader's view
        val dir = s"$out/epoch=$e/shard=$s"
        assert(new java.io.File(dir).isDirectory, s"missing shard dir $dir")
        val files = new java.io.File(dir).listFiles()
          .filter(_.getName.endsWith(".parquet"))
        assert(files.length === 1, s"$dir should hold exactly one shard file")
        val got = spark.read.parquet(files.head.getPath)
          .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
        assert(got === want, s"epoch $e shard $s out of training order")
      }
    }
  }

  test("epoch mixing: reconciles with the epoch order; Simpson bounds hold per shard") {
    val mix = Corpus.qEpochMixing(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_sources"),
          r.getAs[Long]("max_source_docs"), r.getAs[Long]("simpson_num"))).toMap
    assert(mix.nonEmpty)
    // the audit counts exactly the documents the epoch order assigns: per
    // (epoch, shard), chunk doc-counts sum to the audit's n_docs
    val order = Corpus.qEpochOrder(spark, sf).collect()
      .groupBy(r => (r.getLong(0), r.getLong(1)))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    assert(mix.keySet === order.keySet)
    mix.foreach { case (k, (n, _, _, _)) => assert(order(k) === n, s"shard $k") }
    // exact-integer dominance bounds: max² ≤ Σcnt² ≤ max·n (equality on
    // the right iff one source holds the shard), and Cauchy–Schwarz
    // Σcnt² ≥ ⌈n²/s⌉ (uniform mixing floor)
    mix.foreach { case (k, (n, s, mx, simp)) =>
      assert(s >= 1 && mx >= 1 && mx <= n, s"shard $k")
      assert(simp >= mx * mx && simp <= mx * n, s"shard $k")
      assert(simp >= (n * n + s - 1) / s, s"shard $k")
    }
    // the shuffle actually mixes: no shard is captured by a single source
    // (Σcnt² = n² is the degenerate layout the audit exists to flag)
    mix.foreach { case (k, (n, _, _, simp)) => assert(simp < n * n, s"shard $k") }
  }

  test("batch buckets: minimal power-of-two ceilings, exact padding accounting") {
    val rows = Corpus.qBatchBuckets(spark, sf).collect()
      .map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("padded_tokens"), r.getAs[Long]("waste_tokens"))).toMap
    assert(rows.nonEmpty)
    val ladder = Seq(16L, 32L, 64L, 128L, 256L, 512L, 1024L, 2048L, 4096L, 8192L)
    assert(rows.keySet.subsetOf(ladder.toSet))
    rows.foreach { case (b, (n, toks, padded, waste)) =>
      assert(padded === n * b, s"bucket $b")
      assert(waste === padded - toks, s"bucket $b")
      // every doc fits its ceiling and (unless in the floor bucket) would
      // NOT fit the next one down — the ceilings are minimal
      assert(toks <= padded, s"bucket $b")
      if (b > 16L) assert(toks > n * (b / 2), s"bucket $b not minimal")
    }
    // bucketing is total: every document lands in exactly one bucket
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.values.map(_._1).sum === total)
    // an independent JVM recount of bucket membership, using TokenCount's
    // actual convention (1 + whitespace-run count, boundary empties kept)
    def tokCount(s: String): Int = {
      var runs = 0; var inWs = false
      s.foreach { c =>
        val ws = c == ' ' || c == '\t' || c == '\n' || c == '\u000b' ||
          c == '\f' || c == '\r'
        if (ws && !inWs) runs += 1
        inWs = ws
      }
      runs + 1
    }
    val counts = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("text")).collect()
      .map(r => tokCount(r.getString(0)))
    def ceilPow2(n: Int): Long = ladder.find(_ >= n).getOrElse(8192L)
    val expect = counts.groupBy(c => ceilPow2(c)).view.mapValues(_.length.toLong).toMap
    assert(rows.view.mapValues(_._1).toMap === expect)
  }

  test("grouped split: every source lands in exactly one split; totals are preserved") {
    val rows = Corpus.qSplitGrouped(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val splitsPerSource = rows.groupBy(_._2).view.mapValues(_.map(_._1).distinct.size)
    assert(splitsPerSource.values.forall(_ == 1), "a source must never straddle splits")
    val total = rows.map(_._3).sum
    assert(total === Tables.table(spark, sf, "documents").count())
  }

  test("padding waste: hand-computed pad counts on planted lengths") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // token counts 100 and 130: at c=128 → waste 28 + 126; at c=256 →
    // waste 156 + 126; at c=512 → 412 + 382
    val docs = Seq(
      (1L, Seq.fill(100)("w").mkString(" "), "en", "s", 10L),
      (2L, Seq.fill(130)("w").mkString(" "), "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("padding")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Corpus.qPaddingWaste(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toList
    assert(got === List(
      (128L, 230L, 154L, 154L * 10000 / 384),
      (256L, 230L, 282L, 282L * 10000 / 512),
      (512L, 230L, 794L, 794L * 10000 / 1024)))
  }

  test("token budget: allocations sum exactly to the budget, each within 1 of the ideal share") {
    val rows = Corpus.qTokenBudget(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.map(_._3).sum === Corpus.TokenBudget, "largest-remainder must hit B exactly")
    val tot = rows.map(_._2).sum
    rows.foreach { case (src, c, alloc) =>
      val floorShare = Corpus.TokenBudget * c / tot
      assert(alloc === floorShare || alloc === floorShare + 1,
        s"$src: alloc $alloc vs floor share $floorShare")
    }
  }

  test("rendezvous sharding: totality, and removing a shard only moves that shard's docs") {
    import org.apache.spark.sql.functions._
    val docs = Tables.table(spark, sf, "documents")
    def assign(numShards: Int) = docs.select(col("doc_id"),
        Corpus.rendezvousShard(col("doc_id"), numShards).as("shard"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val with8 = assign(Corpus.NumShards)
    val nDocs = docs.count()
    assert(with8.size.toLong === nDocs)
    assert(with8.values.forall(s => s >= 0 && s < Corpus.NumShards))
    // HRW's minimal-disruption property: dropping the last shard reassigns
    // ONLY documents that lived on it — everyone else keeps their shard
    val with7 = assign(Corpus.NumShards - 1)
    with8.foreach { case (doc, s8) =>
      if (s8 < Corpus.NumShards - 1)
        assert(with7(doc) === s8, s"doc $doc moved from $s8 to ${with7(doc)}")
    }
    // the per-shard aggregate view is consistent with the assignment
    val agg = Corpus.qShardRendezvous(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val expected = with8.values.groupBy(identity).map { case (s, xs) => (s, xs.size.toLong) }
    assert(agg === expected)
  }

  test("dsir weights: target-distinctive docs outrank mixed, off-target scores zero") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // target slice (en) speaks only "special"; "common" never appears in
    // the target → its bucket ratio is 0. d1/d2 are pure-target (tied,
    // doc_id order), d4 is 1/3 target vocabulary, d3 is pure-off-target.
    val docs = Seq(
      (1L, "special special special", "en", "s", 23L),
      (2L, "special special special", "en", "s", 23L),
      (3L, "common common common", "fr", "s", 20L),
      (4L, "special common common", "fr", "s", 21L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("dsir")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Corpus.qDsirWeights(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.map(_._1).toSeq === Seq(1L, 2L, 4L, 3L))
    val w = got.toMap
    // ratio(special) = (6·12·10⁴) DIV (7·6) = 17142 bp; d4 = 17142 DIV 3
    assert(w(1L) === 17142L && w(2L) === 17142L)
    assert(w(4L) === 5714L && w(3L) === 0L)
  }

  test("DoReMi weights: high-OOV domain upweighted, weights a distribution, uniform when losses tie") {
    import spark.implicits._
    // source A speaks 3 frequent tokens (all in the top-256 vocab);
    // source B speaks 400 distinct hapaxes — only 253 vocab slots remain,
    // so B's OOV loss is (400-253)·10⁴ DIV 400 = 3675 bp over A's 0
    val a = (1 to 5).map(i => (i.toLong, "a b c a b c", "A"))
    val b = Seq((100L, (1 to 400).map(i => f"z$i%03d").mkString(" "), "B"))
    val docs = (a ++ b).toDF("doc_id", "text", "source")
    val rows = Corpus.doremiWeights(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byS = rows.map(x => x._1 -> x).toMap
    assert(byS("A")._3 === 0L) // min-loss domain has zero excess
    assert(byS("B")._3 === 3675L)
    assert(byS("B")._4 > byS("A")._4) // lossier domain upweighted
    val tot = rows.map(_._4).sum
    assert(tot <= 1000000L && tot >= 1000000L - rows.length) // ppm distribution
    // tied losses → exactly uniform mixture
    val uni = Corpus.doremiWeights(
      Seq((1L, "a b c", "A"), (2L, "a b c", "B")).toDF("doc_id", "text", "source"))
      .collect().map(_.getLong(3))
    assert(uni.toSeq === Seq(500000L, 500000L))
  }

  test("temperature mixture: sqrt smoothing boosts small sources, shares a distribution") {
    import spark.implicits._
    // A: 9 docs x 4 tokens = 36 tokens; B: 1 doc x 4 tokens.
    // sqrt weights 6:2 -> mix 750000/250000 ppm vs natural 900000/100000.
    val docs = ((1 to 9).map(i => (i.toLong, "t t t t", "A")) :+
      ((100L, "t t t t", "B"))).toDF("doc_id", "text", "source")
    val rows = Corpus.mixTemperature(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val byS = rows.map(x => x._1 -> x).toMap
    assert(byS("A") == (("A", 9L, 36L, 900000L, 750000L, 833L)))
    assert(byS("B") == (("B", 1L, 4L, 100000L, 250000L, 2500L)))
    // shares form a (floor-truncated) distribution
    val tot = rows.map(_._5).sum
    assert(tot <= 1000000L && tot >= 1000000L - rows.length)
    // real table: small sources boosted above 1000‰, large below
    val real = Corpus.qMixTemperature(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(2), r.getLong(5)))
    val maxTok = real.map(_._1).max
    val minTok = real.map(_._1).min
    assert(real.find(_._1 == maxTok).get._2 <= 1000L)
    assert(real.find(_._1 == minTok).get._2 >= 1000L)
  }

  test("waterfill: allocation respects the budget and the waterline semantics") {
    val sf = "/root/testdata/sf0.001"
    val rows = Corpus.qTokenWaterfill(spark, sf).collect().toSeq
    assert(rows.nonEmpty)
    val budget = rows.head.getLong(5)
    val totalAlloc = rows.map(_.getLong(2)).sum
    val waterline = rows.head.getLong(4)
    // never overspends, and the leftover is smaller than funding ONE more
    // unit across the capped sources (the integer-waterline residue)
    assert(totalAlloc <= budget)
    val capped = rows.count(r => r.getLong(1) > waterline)
    // integer-waterline residue: funding one more unit across the capped
    // sources would overshoot (only meaningful when something is capped)
    if (capped > 0)
      assert(budget - totalAlloc < capped,
        s"budget=$budget alloc=$totalAlloc capped=$capped")
    // waterfill semantics: below the line fully funded, above it capped AT the line
    rows.foreach { r =>
      val (n, alloc) = (r.getLong(1), r.getLong(2))
      if (n <= waterline) assert(alloc == n) else assert(alloc == waterline)
    }
  }

  test("waterfill on equal sources spends the budget exactly at the derived line") {
    val s2 = spark
    import s2.implicits._
    // 3 sources x 50 tokens each; budget = 60% of 150 = 90 -> waterline
    // floor(90/3) = 30 < 50, so every source is capped at exactly 30 and
    // the budget is spent to the last token (equal sizes leave no residue)
    val docs = Seq.tabulate(30)(i => (i.toLong, s"src${i % 3}", "a b c d e"))
      .toDF("doc_id", "source", "text")
    val dir = tmpDir("waterfill-eq")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Corpus.qTokenWaterfill(spark, dir).collect().toSeq
    assert(rows.size == 3)
    assert(rows.forall(_.getLong(4) == 30L), "waterline = budget/3")
    assert(rows.forall(_.getLong(2) == 30L), "each source capped at the line")
    assert(rows.map(_.getLong(2)).sum == rows.head.getLong(5))
  }

  test("priority sample is exactly k, weight-biased, and id-stable") {
    val sf = "/root/testdata/sf0.001"
    val rows = Corpus.qSamplePriority(spark, sf).collect().toSeq
    assert(rows.size == Corpus.PriorityK)
    // priorities strictly ordered by construction (ties broken by doc_id
    // upstream; the emitted relation must be re-runnable bit-identically)
    val again = Corpus.qSamplePriority(spark, sf).collect().toSeq
    assert(rows.map(_.toSeq) == again.map(_.toSeq))
    // weight bias: the sampled mean n_chars exceeds the corpus mean
    val corpusMean = Tables.table(spark, sf, "documents")
      .agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    val sampleMean = rows.map(_.getLong(2)).sum.toDouble / rows.size
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean should exceed corpus mean $corpusMean")
  }

  test("chunk windows tile every document with the documented stride") {
    val sf = "/root/testdata/sf0.001"
    val rows = Corpus.qChunkWindows(spark, sf).collect().toSeq
    rows.groupBy(_.getLong(0)).foreach { case (_, chunks) =>
      val sorted = chunks.sortBy(_.getLong(1))
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(1) == i, "chunk indexes are dense from 0")
        assert(r.getLong(2) == i.toLong * Corpus.ChunkS)
        assert(r.getLong(3) >= 1 && r.getLong(3) <= Corpus.ChunkW)
      }
      // a NON-last chunk always covers more than one stride (else no
      // further chunk would have started); only the last may be shorter
      sorted.init.foreach(r => assert(r.getLong(3) > Corpus.ChunkS))
    }
  }
}
