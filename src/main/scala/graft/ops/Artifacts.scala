package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import Tables.table

/** CANONICAL builder per serving-artifact key (ADVICE r11): every
  * [[graft.ServingIndexes]] key is defined by exactly ONE build function
  * here, and every query that serves the artifact calls the matching
  * `ensure*` — so two call sites can never silently pass diverging build
  * closures under the same key and serve a differently-built artifact
  * depending on execution order. The memoization itself (train-once per
  * (key, dataDir) per session, md5-named scratch path, serialized first
  * builds) stays in [[graft.ServingIndexes]]; this object only owns WHAT
  * each key's bytes are.
  *
  * Corpus conventions (shared by the batch queries, their oracles, and
  * the streaming gates): the plain `*-index` artifacts train over the
  * FULL table; the `*-refresh-index` artifacts train over the standing
  * split (id % 5 != 0) and append the ingest split (id % 5 == 0) via the
  * frozen-state O(batch) refresh writers; `dedup-lsh-index` and
  * `semdedup-ivf-index` train over the standing split only, because they
  * serve incremental gates that probe arrivals against a fixed corpus.
  */
object Artifacts {

  /** MinHash-LSH dedup index over the standing documents (doc_id % 5 != 0). */
  def ensureDedupLsh(spark: SparkSession, dir: String): String =
    graft.ServingIndexes.ensure("dedup-lsh-index", dir) { d =>
      TextDedup.writeLshIndex(
        table(spark, dir, "documents").filter(pmod(col("doc_id"), lit(5)) =!= 0),
        col("doc_id"), col("text"), d,
        TextDedup.MinHashConfig(shingleK = Dedup.ShingleK))
    }

  /** IVF index over the standing embeddings (vec_id % 5 != 0), serving
    * the semantic-dedup incremental gate.
    */
  def ensureSemdedupIvf(spark: SparkSession, dir: String): String =
    graft.ServingIndexes.ensure("semdedup-ivf-index", dir) { d =>
      VectorSearch.writeIvfIndex(
        table(spark, dir, "embeddings").filter(pmod(col("vec_id"), lit(5)) =!= 0),
        col("vec_id"), col("embedding"), d)
    }

  /** IVF ANN index over the full embeddings table. */
  def ensureIvf(spark: SparkSession, dir: String): String =
    graft.ServingIndexes.ensure("ivf-index", dir) { d =>
      VectorSearch.writeIvfIndex(
        table(spark, dir, "embeddings"), col("vec_id"), col("embedding"), d)
    }

  /** LSH ANN index over the full embeddings table. */
  def ensureLsh(spark: SparkSession, dir: String): String =
    graft.ServingIndexes.ensure("lsh-index", dir) { d =>
      VectorSearch.writeLshIndex(
        table(spark, dir, "embeddings"), col("vec_id"), col("embedding"), d)
    }

  /** PQ ANN index over the full embeddings table. */
  def ensurePq(spark: SparkSession, dir: String): String =
    graft.ServingIndexes.ensure("pq-index", dir) { d =>
      VectorSearch.writePqIndex(
        table(spark, dir, "embeddings"), col("vec_id"), col("embedding"), d)
    }

  /** IVF index: standing-corpus train + frozen-centroid O(batch) append. */
  def ensureIvfRefresh(spark: SparkSession, dir: String): String =
    graft.ServingIndexes.ensure("ivf-refresh-index", dir) { d =>
      val emb = table(spark, dir, "embeddings")
      VectorSearch.writeIvfIndex(
        emb.filter(pmod(col("vec_id"), lit(5)) =!= 0), col("vec_id"), col("embedding"), d)
      VectorSearch.refreshIvfIndex(
        emb.filter(pmod(col("vec_id"), lit(5)) === 0), col("vec_id"), col("embedding"), d)
    }

  /** LSH index: standing-corpus build + signature append. */
  def ensureLshRefresh(spark: SparkSession, dir: String): String =
    graft.ServingIndexes.ensure("lsh-refresh-index", dir) { d =>
      val emb = table(spark, dir, "embeddings")
      VectorSearch.writeLshIndex(
        emb.filter(pmod(col("vec_id"), lit(5)) =!= 0), col("vec_id"), col("embedding"), d)
      VectorSearch.refreshLshIndex(
        emb.filter(pmod(col("vec_id"), lit(5)) === 0), col("vec_id"), col("embedding"), d)
    }

  /** PQ index: standing-corpus codebook train + frozen-codebook encode-append. */
  def ensurePqRefresh(spark: SparkSession, dir: String): String =
    graft.ServingIndexes.ensure("pq-refresh-index", dir) { d =>
      val emb = table(spark, dir, "embeddings")
      VectorSearch.writePqIndex(
        emb.filter(pmod(col("vec_id"), lit(5)) =!= 0), col("vec_id"), col("embedding"), d)
      VectorSearch.refreshPqIndex(
        emb.filter(pmod(col("vec_id"), lit(5)) === 0), col("vec_id"), col("embedding"), d)
    }

  /** The co-order part GRAPH (round 16 optimization): the canonically
    * oriented (`src < dst`) co-order edge list
    * ([[Graph.orientedCoOrderEdges]] at the default basket cap) stored
    * once per (corpus, session). NINE registered graph queries (pagerank,
    * triangles, k-core, label propagation, PPR, harmonic centrality, BFS,
    * assortativity, degree histogram) previously each re-paid the same
    * lineitem groupBy → sorted-set pair explode → distinct per run —
    * exactly the edge-list materialization a production graph pipeline
    * does once per snapshot. Bit-stable: a deterministic projection of
    * lineitem (distinct oriented long pairs), so every iterative
    * computation over the stored edges is bit-identical to the inline
    * build (StoredArtifactParitySpec pins stored == inline).
    */
  def ensureCoOrderEdges(spark: SparkSession, dir: String): String =
    graft.ServingIndexes.ensure("co-order-edges", dir) { d =>
      Graph.orientedCoOrderEdges(spark, dir)
        .write.mode("overwrite").parquet(s"$d/edges.parquet")
    }

  /** Load [[ensureCoOrderEdges]] back as the oriented edge relation. */
  private[ops] def coOrderOriented(spark: SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    spark.read.parquet(s"${ensureCoOrderEdges(spark, dir)}/edges.parquet")

  /** The LAYOUT-EXPERIMENT state (round 16 optimization): per-layout
    * granule zone maps of the keyed lineitem scan (`lin`/`zo`/`hi` = the
    * price-sort, Morton and Hilbert layouts; `append` = the 10%-append
    * drift scenario), the 1-row normalizing-domain relation (`dom`) and
    * the Hilbert-restore group manifest (`restore`). Four registered
    * queries (skipping stats, clustering health, layout drift, recluster
    * plan) previously each re-ran 2–3 full range-exchange rank passes
    * over the table per run — these relations are exactly the table-format
    * METADATA (zone maps, file manifests) a lakehouse keeps persistent.
    * Bit-stable: every rank pass sorts on a key made total by (ok, ln),
    * so granule extents are deterministic (StoredArtifactParitySpec).
    */
  def ensureLayoutZoneMaps(spark: SparkSession, dir: String): String =
    graft.ServingIndexes.ensure("layout-zone-maps", dir) { d =>
      val keyed = Layout.keyedLineitem(spark, dir)
        .withColumn("segment", expr("CASE WHEN ok % 10 = 0 THEN 1 ELSE 0 END"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val appendOrder = Seq(col("segment"),
        when(col("segment") === 0, col("hk")).otherwise(lit(0L)),
        col("ok"), col("ln"))
      Layout.granuleZoneMaps(keyed, Seq(col("pc"), col("ok"), col("ln")))
        .write.mode("overwrite").parquet(s"$d/lin.parquet")
      Layout.granuleZoneMaps(keyed, Seq(col("zk"), col("ok"), col("ln")))
        .write.mode("overwrite").parquet(s"$d/zo.parquet")
      Layout.granuleZoneMaps(keyed, Seq(col("hk"), col("ok"), col("ln")))
        .write.mode("overwrite").parquet(s"$d/hi.parquet")
      Layout.granuleZoneMaps(keyed, appendOrder)
        .write.mode("overwrite").parquet(s"$d/append.parquet")
      Layout.domOf(keyed)
        .write.mode("overwrite").parquet(s"$d/dom.parquet")
      Rank.globalRank(keyed, Seq(col("hk"), col("ok"), col("ln")), 32)
        .select(expr(s"(rnk - 1) DIV ${Layout.ReclusterGroupRows}").as("grp"), col("hk"))
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("hk")).as("hk_lo"), max(col("hk")).as("hk_hi"))
        .write.mode("overwrite").parquet(s"$d/restore.parquet")
      keyed.unpersist()
    }

  /** Load one [[ensureLayoutZoneMaps]] relation back. */
  private[ops] def layoutRelation(spark: SparkSession, dir: String,
      name: String): org.apache.spark.sql.DataFrame =
    spark.read.parquet(s"${ensureLayoutZoneMaps(spark, dir)}/$name.parquet")

  /** The trigram-fluency score relation (round 16 optimization):
    * [[TextAnalysis.lmTrigramDocScores]]'s materialized
    * (doc_id, n_trigrams, mean_score_micro) — shared by
    * `q_lm_trigram_score` and `q_ppl_buckets`, which each re-ran the
    * corpus tokenize + distinct-trigram joins per run. Exact integers,
    * deterministic — the same sharing argument as [[ensureLmRank]].
    */
  def ensureLmTrigramScores(spark: SparkSession, dir: String): String =
    graft.ServingIndexes.ensure("lm-trigram-scores", dir) { d =>
      TextAnalysis.lmTrigramDocScores(table(spark, dir, "documents"))
        .write.mode("overwrite").parquet(s"$d/scores.parquet")
    }

  /** The maximal duplicated-span relation (round 16 optimization):
    * [[TextDedup.duplicatedSpans]] over the full documents table at the
    * dedup window length — shared by `q_dup_spans` and `q_dup_rate`,
    * which each re-ran the corpus window-explode + island merge per run.
    * Deterministic (exact integer positions), same sharing argument as
    * the dedup candidates table.
    */
  def ensureDupSpans(spark: SparkSession, dir: String): String =
    graft.ServingIndexes.ensure("dup-spans", dir) { d =>
      TextDedup.duplicatedSpans(
        table(spark, dir, "documents"), col("doc_id"), col("text"), Dedup.DupSpanL)
        .write.mode("overwrite").parquet(s"$d/spans.parquet")
    }

  /** The trained BPE merge table (round 16 optimization):
    * [[BpeTrain.bpeMerges]]'s 10-round merge relation over the full
    * documents table — three queries (`q_bpe_merges`, `q_bpe_encode`,
    * `q_bpe_fertility`) each re-ran the word-frequency corpus pass plus
    * the 10 argmax rounds per run. Deterministic: exact counts, argmax
    * total-ordered by (count desc, pair asc) — the store is the trained
    * tokenizer a production pipeline ships.
    */
  def ensureBpeMerges(spark: SparkSession, dir: String): String =
    graft.ServingIndexes.ensure("bpe-merges", dir) { d =>
      BpeTrain.bpeMerges(table(spark, dir, "documents"),
          BpeTrain.VocabWords, BpeTrain.MergeRounds)
        .write.mode("overwrite").parquet(s"$d/merges.parquet")
    }

  /** Stored BM25 inverted index over the full documents table (round 16:
    * `q_bm25_indexed` re-wrote it per run via a raw ScratchDirs path —
    * now the same build-once/serve-many contract as the vector indexes,
    * and keyed by data directory instead of one JVM-global path).
    */
  def ensureBm25Index(spark: SparkSession, dir: String): String =
    graft.ServingIndexes.ensure("bm25-index", dir) { d =>
      TextAnalysis.writeSearchIndex(
        table(spark, dir, "documents"), col("doc_id"), col("text"), d)
    }

  /** BM25 index lifecycle: standing-corpus build + ingest-batch merge —
    * the text dual of [[ensureIvfRefresh]] (round 16: `q_search_refresh`
    * re-ran build+merge per run). Serving reads `merged`.
    */
  def ensureBm25Refresh(spark: SparkSession, dir: String): String =
    graft.ServingIndexes.ensure("bm25-refresh-index", dir) { d =>
      val docs = table(spark, dir, "documents")
      TextAnalysis.writeSearchIndex(
        docs.filter(pmod(col("doc_id"), lit(5)) =!= 0),
        col("doc_id"), col("text"), s"$d/base")
      TextAnalysis.refreshSearchIndex(spark, s"$d/base",
        docs.filter(pmod(col("doc_id"), lit(5)) === 0),
        col("doc_id"), col("text"), s"$d/merged")
    }

  /** Stored VARIANT ingest of the enriched events feed (round 16:
    * `q_variant_stored` re-paid the parse_json + parquet write per run;
    * "parse once at ingest" is the lifecycle the query models).
    */
  def ensureVariantStore(spark: SparkSession, dir: String): String =
    graft.ServingIndexes.ensure("variant-events", dir) { d =>
      SemiStructured.enrichedEvents(spark, dir)
        .select(col("event_id"), parse_json(col("doc")).as("v"))
        .write.mode("overwrite").parquet(s"$d/events.parquet")
    }

  /** Stored enriched orders⋈customer view (round 16: `q_view_refresh`
    * re-joined and re-wrote the view per run; the stored view is the
    * state the incremental maintenance refreshes).
    */
  def ensureJoinView(spark: SparkSession, dir: String): String =
    graft.ServingIndexes.ensure("join-view", dir) { d =>
      val orders = table(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          Tables.dec(col("o_totalprice")).as("price"))
      val cust = table(spark, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      orders.join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_custkey"),
          col("c_mktsegment").as("segment"), col("price"))
        .write.mode("overwrite").parquet(s"$d/view.parquet")
    }

  /** The BUCKETED join tables (round 16 optimization): lineitem and
    * orders written `bucketBy(8, orderkey)` + sorted, registered once per
    * (corpus, session) — persisting a partitioning across jobs is the
    * entire point of bucketing (guide §2.4), and `q_bucketed_join`
    * previously re-wrote both tables on every run just to demonstrate the
    * exchange-free join. Table names carry the corpus digest so two data
    * directories can never share a catalog entry. Returns
    * (lineitem table name, orders table name).
    */
  def ensureBucketedTables(spark: SparkSession, dir: String): (String, String) = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    val ln = s"graft_lineitem_b_$tag"
    val on = s"graft_orders_b_$tag"
    def write(d: String): Unit = {
      table(spark, dir, "lineitem")
        .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$d/lineitem_b").saveAsTable(ln)
      table(spark, dir, "orders")
        .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$d/orders_b").saveAsTable(on)
    }
    val d = graft.ServingIndexes.ensure("bucketed-tables", dir)(write)
    // saveAsTable registers in the CALLING session's catalog, but the memo
    // is JVM-global: a second session in the same JVM would skip the build
    // and then fail spark.table(ln) (ADVICE r16). Re-write (bucket spec
    // included) when this session's catalog lacks the entries.
    if (!spark.catalog.tableExists(ln) || !spark.catalog.tableExists(on)) write(d)
    (ln, on)
  }

  /** The intake gates' standing-corpus probe relations — the exact-dup
    * fingerprint multiset (`fps.parquet`) and the benchmark shingle set
    * (`grams.parquet`) both `q_intake` and `q_intake_gated` scan per
    * run: built once per (corpus, session), the same recompute-once
    * discipline as the index artifacts (each query previously re-paid a
    * tokenize+md5 corpus scan and a shingle build). Deterministic pure
    * projections of the standing split, so the stored bytes are
    * bit-stable regardless of which query triggers the build.
    */
  /** Arrival-side intake artifacts (round 15 — the arrival dual of
    * [[ensureIntakeStanding]], VERDICT r14 item 2): the intake cascade
    * previously recomputed the arrival tokenize/quality/langid/fp scan,
    * the MinHash shingles + banded signatures, and the IVF probe ranking
    * on EVERY q_intake / q_intake_gated run. All four relations are pure
    * per-document functions of the arrival split (probes additionally of
    * the frozen semdedup-IVF centroids), so they are bit-stable
    * regardless of which query triggers the build, and serving them
    * semi-joined to a survivor subset equals recomputing on that subset.
    */
  def ensureIntakeArrivals(spark: SparkSession, dir: String): String = {
    val ivfDir = ensureSemdedupIvf(spark, dir) // hoisted build dependency
    graft.ServingIndexes.ensure("intake-arrivals", dir) { d =>
      val arrivals = table(spark, dir, "documents")
        .filter(pmod(col("doc_id"), lit(5)) === 0)
      Pipeline.arrivalMeta(arrivals)
        .select(col("doc_id"), col("n_tokens"), col("quality_score"),
          col("lang"), col("fp"))
        .write.mode("overwrite").parquet(s"$d/meta.parquet")
      val shI = TextDedup.shingles(arrivals, col("doc_id"), col("text"), Dedup.ShingleK)
      shI.write.mode("overwrite").parquet(s"$d/shingles.parquet")
      TextDedup.bandedSignatures(shI,
          TextDedup.MinHashConfig(shingleK = Dedup.ShingleK))
        .write.mode("overwrite").parquet(s"$d/bands.parquet")
      shI.unpersist()
      VectorSearch.ivfProbeBucketsFromIndex(
          table(spark, dir, "embeddings")
            .filter(pmod(col("vec_id"), lit(5)) === 0),
          col("vec_id"), col("embedding"), ivfDir)
        .write.mode("overwrite").parquet(s"$d/probes.parquet")
      // NB classifier scores of every arrival against the session model —
      // pure in (arrival split, stored model) and the model is itself a
      // deterministic per-dir artifact, so the scores are bit-stable too;
      // the gated intake otherwise re-paid the token-explode × vocab-join
      // scoring pass per run
      val nbDir = ensureQualityNb(spark, dir)
      TextAnalysis.nbScore(
          arrivals
            .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
            .filter(size(col("t")) >= 1)
            .select(col("doc_id"), explode(col("t")).as("tok")),
          Seq("doc_id"),
          spark.read.parquet(s"$nbDir/weights.parquet"),
          spark.read.parquet(s"$nbDir/totals.parquet"))
        .write.mode("overwrite").parquet(s"$d/nbscores.parquet")
    }
  }

  /** Load [[ensureIntakeArrivals]] as the cascade's [[Pipeline.ArrivalPrep]]. */
  private[ops] def intakeArrivalPrep(spark: SparkSession, dir: String): Pipeline.ArrivalPrep = {
    val d = ensureIntakeArrivals(spark, dir)
    Pipeline.ArrivalPrep(
      meta = spark.read.parquet(s"$d/meta.parquet"),
      shingles = spark.read.parquet(s"$d/shingles.parquet"),
      bands = spark.read.parquet(s"$d/bands.parquet"),
      probes = spark.read.parquet(s"$d/probes.parquet"),
      nbScores = spark.read.parquet(s"$d/nbscores.parquet"))
  }

  /** The dedup CANDIDATE relation (round 16 optimization): the exact
    * capped-commons overlap table `(id_a, id_b, common)` plus per-doc
    * shingle-set sizes `(id, n)` over the FULL documents table at the
    * dedup operating point (k = [[Dedup.ShingleK]],
    * cap = [[TextDedup.DefaultBucketCap]]). This is the candidates table
    * a production dedup pipeline materializes once per corpus snapshot:
    * FOURTEEN registered queries (the ngram-Jaccard pair family, the
    * components/survivor/mixture/sizes/savings labeling family, the
    * threshold sweep, containment, split leakage, bitext mining, source
    * pairs, quality smoothing, the quality×dup matrix) previously each
    * re-paid the identical tokenize → shingle-explode → inverted-index
    * self-join from scratch — the same recomputation class the LM-rank
    * and intake artifacts removed in r13/r15. Bit-stable: exact integer
    * overlap counts and sizes, deterministic in the corpus, so every
    * derived Jaccard/containment value is bit-identical to the inline
    * computation ([[TextDedup.jaccardFromCommons]] is shared by both
    * paths; StoredArtifactParitySpec pins stored == inline).
    */
  def ensureDedupCommons(spark: SparkSession, dir: String): String =
    graft.ServingIndexes.ensure("dedup-commons", dir) { d =>
      val cc = TextDedup.cappedCommons(
        table(spark, dir, "documents"), col("doc_id"), col("text"),
        Dedup.ShingleK, TextDedup.DefaultBucketCap)
      cc.commons.write.mode("overwrite").parquet(s"$d/commons.parquet")
      cc.sizes.write.mode("overwrite").parquet(s"$d/sizes.parquet")
      cc.cached.foreach(_.unpersist())
    }

  /** Load [[ensureDedupCommons]] back as a [[TextDedup.CappedCommons]]
    * (no live caches — the stored relations are plain parquet scans).
    */
  private[ops] def dedupCommons(spark: SparkSession, dir: String): TextDedup.CappedCommons = {
    val d = ensureDedupCommons(spark, dir)
    TextDedup.CappedCommons(
      spark.read.parquet(s"$d/commons.parquet"),
      spark.read.parquet(s"$d/sizes.parquet"),
      Seq.empty)
  }

  def ensureIntakeStanding(spark: SparkSession, dir: String): String =
    graft.ServingIndexes.ensure("intake-standing", dir) { d =>
      val corpus = table(spark, dir, "documents")
        .filter(pmod(col("doc_id"), lit(5)) =!= 0)
      corpus.select(md5(concat_ws(" ", TextOps.tokens(col("text")))).as("fp"))
        .write.mode("overwrite").parquet(s"$d/fps.parquet")
      val sh = TextDedup.shingles(
        corpus.filter(pmod(col("doc_id"), lit(7)) === 0),
        col("doc_id"), col("text"), Dedup.ShingleK)
      sh.select(col("s")).distinct()
        .write.mode("overwrite").parquet(s"$d/grams.parquet")
      sh.unpersist()
    }

  /** Geo state of the intake cascade (round 16, VERDICT r15 item 7):
    * `q_intake_full` previously EXIF-walked the whole photo corpus per
    * run — once for the arrival photo cells and once for the standing
    * [[Multimodal.cellRates]] thresholds. Both are pure functions of the
    * photo bytes (the decoded [[Multimodal.burstKeys]] cells of the
    * arrival split; the frozen admission thresholds of the standing
    * split), so they memoize like every other intake artifact:
    * `photoCells.parquet` (doc_id, lat_cell, lon_cell) and
    * `rates.parquet` (lat_cell, lon_cell, thr).
    */
  def ensureGeoCells(spark: SparkSession, dir: String): String =
    graft.ServingIndexes.ensure("intake-geo-cells", dir) { d =>
      val photos = Multimodal.burstKeys(Multimodal.exifMetaTable(spark, dir))
        .localCheckpoint()
      photos.filter(pmod(col("doc_id"), lit(5)) === 0)
        .select(col("doc_id"), col("lat_cell"), col("lon_cell"))
        .write.mode("overwrite").parquet(s"$d/photoCells.parquet")
      Multimodal.cellRates(photos.filter(pmod(col("doc_id"), lit(5)) =!= 0))
        .select(col("lat_cell"), col("lon_cell"), col("thr"))
        .write.mode("overwrite").parquet(s"$d/rates.parquet")
    }

  /** The bigram-LM score + global-rank relation (VERDICT r13 item 1):
    * [[TextAnalysis.qLmBigramScore]]'s exact-integer scored relation with
    * [[Rank.globalRank]]'s `rnk` attached, stored once per (corpus,
    * session) as `ranked.parquet` (doc_id, n_bigrams, mean_lift_micro,
    * rnk). Four queries previously rebuilt this identical tokenize →
    * bigram-train → score → rank pass from scratch (`q_lm_bigram_score`,
    * quality buckets, the curriculum schedule, the quality×dup matrix) —
    * the same recomputation class the ANN audits had before r13's
    * memoization. On-disk rather than cached because Bench/Verify call
    * [[graft.Caches.releaseAll]] between queries. Bit-identity is safe to
    * share: the score is exact integers and the rank a total order over
    * (score desc, doc_id), so the artifact bytes don't depend on which
    * query triggered the build.
    */
  def ensureLmRank(spark: SparkSession, dir: String): String =
    graft.ServingIndexes.ensure("lm-bigram-rank", dir) { d =>
      Rank.globalRank(TextAnalysis.lmScored(spark, dir),
        Seq(col("mean_lift_micro").desc, col("doc_id")), 8)
        .write.mode("overwrite").parquet(s"$d/ranked.parquet")
    }

  /** Trained quality-classifier model: the NB micro-unit weight table +
    * class totals of [[TextAnalysis.qQualityClassifier]]'s 80%-split
    * training, stored as `weights.parquet` (tok, w_micro) and
    * `totals.parquet` (tot_pos, tot_neg, v). Deterministic, so the stored
    * apply is bit-identical to the in-session train→apply.
    */
  def ensureQualityNb(spark: SparkSession, dir: String): String =
    graft.ServingIndexes.ensure("quality-nb-model", dir) { d =>
      val (weights, totals) = TextAnalysis.nbTrain(TextAnalysis.nbLabeled(spark, dir))
      weights.write.mode("overwrite").parquet(s"$d/weights.parquet")
      totals.write.mode("overwrite").parquet(s"$d/totals.parquet")
    }

  /** Trained rerank scorer (round 16, VERDICT r15 item 5): the 1-row
    * integer weight table of [[Similarity.rerankTrain]] over the pool
    * pair features — the exact-integer class-centroid discriminant
    * distilled from the blend teacher. Deterministic, so the stored
    * serve is bit-identical to an in-session train→apply; the store is
    * what makes q_rerank_scored's serving plan training-free.
    */
  def ensureRerankScorer(spark: SparkSession, dir: String): String =
    graft.ServingIndexes.ensure("rerank-scorer", dir) { d =>
      Similarity.rerankTrain(Similarity.rerankFeatures(spark, dir))
        .write.mode("overwrite").parquet(s"$d/weights.parquet")
    }

  // ---- session memos for DRIVER-SIDE trained models (VERDICT r12 item 2) ----
  //
  // The in-session recall audits (qAnnRecall / qAnnRecallSampled) train
  // IVF centroids and PQ codebooks from the full embeddings table per
  // call — within one suite run that was 4 identical trainings for the
  // top-2 bench costs. The trained state is control-plane metadata
  // (centroid sums/counts), so it memoizes as a plain JVM object: unlike
  // a cached DataFrame it SURVIVES Caches.releaseAll between queries,
  // and unlike the stored indexes it keeps the audits' in-session
  // train-then-serve semantics (no artifact bytes are read back).
  // computeIfAbsent gives the same serialized-first-build guarantee
  // ServingIndexes has; same canonical-builder contract — one builder
  // per model key lives HERE.

  private val models = new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  private def model[T <: AnyRef](key: String, dir: String)(build: => T): T =
    models.computeIfAbsent(s"$key:$dir", _ => {
      val t0 = System.nanoTime()
      val m = build
      graft.ServingIndexes.recordBuild(key, dir, (System.nanoTime() - t0) / 1e9)
      m
    }).asInstanceOf[T]

  /** The session-trained IVF model (resolved config + exact-integer
    * centroids) over the full embeddings table — training is query-free,
    * so every audit variant serves from this one model bit-identically.
    */
  private[ops] def ivfModel(spark: SparkSession, dir: String): (VectorSearch.IvfConfig, Array[VectorSearch.Centroid]) =
    model("ivf-model", dir) {
      VectorSearch.trainIvfModel(
        table(spark, dir, "embeddings"), col("vec_id"), col("embedding"))
    }

  /** The session-trained IVF model over the STANDING embeddings split
    * (vec_id % 5 != 0) — the incremental semantic gate's corpus side
    * (round 16: `q_semdedup_incremental` retrained it per run while the
    * stored-index twin served from `ensureSemdedupIvf`).
    */
  private[ops] def ivfModelStanding(spark: SparkSession, dir: String): (VectorSearch.IvfConfig, Array[VectorSearch.Centroid]) =
    model("ivf-model-standing", dir) {
      VectorSearch.trainIvfModel(
        table(spark, dir, "embeddings").filter(pmod(col("vec_id"), lit(5)) =!= 0),
        col("vec_id"), col("embedding"))
    }

  /** The session-trained PQ codebooks over the full embeddings table. */
  private[ops] def pqModel(spark: SparkSession, dir: String): Array[Array[VectorSearch.Centroid]] =
    model("pq-model", dir) {
      VectorSearch.trainPqModel(
        table(spark, dir, "embeddings"), col("vec_id"), col("embedding"))
    }

  /** The EXACT brute-force cosine top-k baseline for `qids`, stored once
    * per (qids, dataDir) as a queries×k parquet (`exact.parquet`, columns
    * `q_vec_id, rnk, vec_id, cos_sim`): five audit queries previously
    * recomputed this identical corpus scan. On-disk rather than
    * localCheckpointed because Bench/Verify call Caches.releaseAll
    * between queries, which drops checkpoint blocks. The sampled audit
    * passes its own (smaller) qids, so a sampled-only run's baseline cost
    * scales with the sample, never the full query log.
    */
  private[ops] def ensureExactTopK(spark: SparkSession, dir: String,
      qids: Seq[Long], k: Int): String =
    graft.ServingIndexes.ensure(s"exact-topk-k$k-q" + {
      // digest, not the raw id list: the qid set only disambiguates the
      // full vs sampled baselines within a session, and the raw join
      // would bloat the bench's artifact_build_sec keys past the compact
      // line's budget
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(qids.mkString("_").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
    }, dir) { d =>
      VectorSearch.cosineTopK(
          table(spark, dir, "embeddings"), col("vec_id"), col("embedding"), qids, k)
        .withColumnRenamed("qid", "q_vec_id").withColumnRenamed("id", "vec_id")
        .write.mode("overwrite").parquet(s"$d/exact.parquet")
    }

  /** Test hook mirroring [[graft.ServingIndexes.reset]]. */
  private[graft] def resetModels(): Unit = models.clear()
}
