package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._
import TextOps._

/** Training-corpus assembly operators: the deterministic bookkeeping a
  * large-scale LLM data pipeline runs AFTER cleaning/dedup — reproducible
  * sampling, train/val/test assignment, sequence packing, and benchmark
  * decontamination. Every one is hash-gated against DuckDB: determinism
  * across engines/runs is the entire point of these ops (an irreproducible
  * split or sample invalidates downstream evals), so each uses md5-derived
  * decisions (the [[VectorSearch.planeSign]] recipe) rather than engine
  * PRNGs.
  */
object Corpus {

  /** Deterministic ~1/16 sample of lineitem: a row is IN iff an md5-derived
    * integer of its (orderkey, linenumber) key ≡ 0 (mod 16), then exact
    * per-flag aggregates over the sample. Unlike `df.sample` (seeded PRNG,
    * partition-order-dependent), the hash decision is a pure row function —
    * stable under repartitioning, engine-independent, and joinable (the
    * same key always lands in the same sample across tables and runs).
    */
  def qSampleDet(spark: SparkSession, dir: String): DataFrame =
    sampleAgg(table(spark, dir, "lineitem"))

  /** The sample + aggregate of [[qSampleDet]] over any lineitem-shaped
    * input — separated so specs can feed a repartitioned input and assert
    * the decisions don't move. */
  private[ops] def sampleAgg(lineitem: DataFrame): DataFrame =
    lineitem
      .withColumn("h",
        conv(substring(md5(concat_ws(":", col("l_orderkey"), col("l_linenumber"))), 1, 8),
          16, 10).cast("long"))
      .filter(pmod(col("h"), lit(16)) === 0)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag"))

  val qSampleDetSql: String =
    """SELECT l_returnflag,
      |  count(*) AS n_rows,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |WHERE CAST(concat('0x', substring(md5(concat(l_orderkey, ':', l_linenumber)), 1, 8))
      |        AS BIGINT) % 16 = 0
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Deterministic 80/10/10 train/val/test assignment per document: bucket
    * = md5(doc_id) mod 100. The split must be a pure function of the
    * STABLE document id (not position, not a seed) so that re-runs,
    * engine swaps, and incremental corpus additions never move a document
    * across splits — that would leak eval data into training.
    */
  /** The 80/10/10 split decision as a pure column expression — shared by
    * [[qSplitAssign]] and the cross-split leakage audit
    * ([[Dedup.qSplitLeakage]]) so both see the identical assignment.
    */
  private[ops] def splitCol(docId: Column): Column = {
    val bucket =
      pmod(conv(substring(md5(docId.cast("string")), 1, 8), 16, 10).cast("long"), lit(100))
    when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
  }

  /** SQL mirror of [[splitCol]] (DuckDB dialect). */
  private[ops] def splitColSql(docId: String): String =
    s"""CASE
       |    WHEN CAST(concat('0x', substring(md5(CAST($docId AS VARCHAR)), 1, 8)) AS BIGINT)
       |      % 100 < 80 THEN 'train'
       |    WHEN CAST(concat('0x', substring(md5(CAST($docId AS VARCHAR)), 1, 8)) AS BIGINT)
       |      % 100 < 90 THEN 'val'
       |    ELSE 'test'
       |  END""".stripMargin

  def qSplitAssign(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"), splitCol(col("doc_id")).as("split"))
      .orderBy(col("doc_id"))

  val qSplitAssignSql: String =
    s"""SELECT doc_id,
       |  ${splitColSql("doc_id")} AS split
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  /** Budget for [[qPackSequences]] (tokens per training sequence). */
  val PackBudget = 2048

  /** Sequence packing (concat-then-chunk): within each of 8 md5-derived
    * shards, documents concatenate in doc_id order and chunk at
    * [[PackBudget]] tokens — a doc belongs to the chunk where it starts
    * (`floor(prefix_sum_before / budget)`). Emits per-chunk doc counts +
    * token totals. The window runs PER SHARD, so packing parallelizes
    * across the cluster (a single global ORDER BY would serialize the
    * corpus through one partition); integer prefix sums keep the oracle
    * exact.
    */
  def qPackSequences(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    table(spark, dir, "documents")
      .select(col("doc_id"),
        pmod(conv(substring(md5(col("doc_id").cast("string")), 9, 4), 16, 10).cast("long"),
          lit(8)).as("shard"),
        graft.functions.TokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("start_tok", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("chunk_id", floor(col("start_tok") / lit(PackBudget)))
      .groupBy(col("shard"), col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .orderBy(col("shard"), col("chunk_id"))
  }

  val qPackSequencesSql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 9, 4)) AS BIGINT) % 8
       |      AS shard,
       |    len(regexp_split_to_array(lower(text), '\\s+')) AS n_tokens
       |  FROM documents
       |), c AS (
       |  SELECT shard, doc_id, n_tokens,
       |    COALESCE(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
       |  FROM d
       |)
       |SELECT shard, CAST(floor(start_tok / $PackBudget) AS BIGINT) AS chunk_id,
       |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
       |FROM c
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin

  /** Epochs materialized by [[qEpochOrder]]. */
  val EpochCount = 2

  /** Shards per epoch in [[qEpochOrder]]. */
  val EpochShards = 8

  /** THE epoch-shuffle priority — md5(`epoch:doc_id`) first-8-hex as a
    * long — in one place (Spark column + SQL fragment) so the order
    * ([[qEpochOrder]]) and the audit over it ([[qEpochMixing]]) cannot
    * silently decouple. Expects `epoch` and `doc_id` columns in scope.
    */
  private def epochHash: Column =
    conv(substring(md5(concat_ws(":", col("epoch"), col("doc_id"))), 1, 8),
      16, 10).cast("long")
  private val epochHashSql =
    "CAST(concat('0x', substring(md5(concat(epoch, ':', doc_id)), 1, 8)) AS BIGINT)"

  /** EPOCH-SHUFFLE / training-order operator: the reproducible data
    * ORDER a training run consumes — per epoch, a deterministic global
    * shuffle (priority = md5(`epoch:doc_id`), the [[qSampleDet]]
    * pure-row-function discipline: no PRNG, no partition-order
    * dependence, so any engine/run/repartitioning reproduces the exact
    * same epoch order), sharded to [[EpochShards]] worker files by
    * priority residue, then packed into [[PackBudget]]-token chunks in
    * shuffle order (the [[qPackSequences]] concat-then-chunk rule) so
    * shard files come out IN training order. Emits per
    * (epoch, shard, chunk) the doc count, token total, and the chunk's
    * FIRST document in training order — the column that pins the order
    * itself (not just membership) into the hash gate.
    *
    * Scale: the only non-map work is the per-(epoch, shard) prefix-sum
    * window — 2·8 independent partitions, never a global sort — and the
    * final chunk aggregate. Epochs multiply the stream by a constant
    * ([[EpochCount]]); token counts are computed once per document
    * BEFORE the epoch explode (GenerateExec re-evaluates outer
    * projections per generated row).
    */
  def qEpochOrder(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("epoch"), col("shard")).orderBy(col("h"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    table(spark, dir, "documents")
      .select(col("doc_id"),
        graft.functions.TokenCount(col("text")).cast("long").as("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        explode(sequence(lit(0L), lit(EpochCount - 1L))).as("epoch"))
      .withColumn("h", epochHash)
      .withColumn("shard", pmod(col("h"), lit(EpochShards)))
      .withColumn("start_tok", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("chunk_id", floor(col("start_tok") / lit(PackBudget)))
      .groupBy(col("epoch"), col("shard"), col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        min_by(col("doc_id"), col("start_tok")).as("first_doc"))
      .orderBy(col("epoch"), col("shard"), col("chunk_id"))
  }

  val qEpochOrderSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, len(regexp_split_to_array(lower(text), '\\s+')) AS n_tokens
       |  FROM documents
       |), e AS (
       |  SELECT doc_id, n_tokens, unnest(range($EpochCount)) AS epoch FROM d
       |), h AS (
       |  SELECT epoch, doc_id, n_tokens,
       |    $epochHashSql AS h
       |  FROM e
       |), o AS (
       |  SELECT epoch, h % $EpochShards AS shard, doc_id, n_tokens,
       |    COALESCE(sum(n_tokens) OVER (PARTITION BY epoch, h % $EpochShards
       |      ORDER BY h, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
       |  FROM h
       |)
       |SELECT epoch, shard, CAST(floor(start_tok / $PackBudget) AS BIGINT) AS chunk_id,
       |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |  arg_min(doc_id, start_tok) AS first_doc
       |FROM o GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** MATERIALIZE the training order [[qEpochOrder]] plans: write the
    * corpus as `epoch=<e>/shard=<s>/` parquet with each shard file's ROWS
    * IN TRAINING ORDER — the artifact a data loader actually consumes
    * (it reads shard files sequentially; if the file order is not the
    * epoch order, the reproducibility of the plan never reaches the
    * trainer). One hash repartition on (epoch, shard) puts each shard in
    * exactly one task, `sortWithinPartitions` on the md5 priority orders
    * it, and `partitionBy` lays the directories out — no global sort,
    * shards write in parallel across the cluster. Returns the written
    * row count.
    */
  def writeEpochShards(spark: SparkSession, dir: String, outDir: String): Long = {
    // token counts BEFORE the epoch explode (the qEpochOrder discipline:
    // the generator's output Project re-evaluates per generated row, so a
    // same-select TokenCount would re-tokenize each document per epoch)
    // row count observed ON THE WRITE (VERDICT r13 item 3): the previous
    // read-back `spark.read.parquet(outDir).count()` was a second full
    // pass over the materialized corpus just to return one long
    val obs = new org.apache.spark.sql.Observation("epoch-shard-rows")
    val staged = table(spark, dir, "documents")
      .select(col("doc_id"),
        graft.functions.TokenCount(col("text")).cast("long").as("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        explode(sequence(lit(0L), lit(EpochCount - 1L))).as("epoch"))
      .withColumn("h", epochHash)
      .withColumn("shard", pmod(col("h"), lit(EpochShards)))
      .repartition(col("epoch"), col("shard"))
      .sortWithinPartitions(col("epoch"), col("shard"), col("h"), col("doc_id"))
      .observe(obs, count(lit(1)).as("n"))
    staged.write.mode("overwrite")
      .partitionBy("epoch", "shard").parquet(outDir)
    obs.get("n").asInstanceOf[Long]
  }

  /** Training-order MIXING audit over [[qEpochOrder]]'s shard assignment —
    * the check a reproducible epoch shuffle has to pass before anyone
    * trains on it: a shard dominated by one source feeds the optimizer
    * long runs of correlated gradients (the failure global shuffles exist
    * to prevent), and because the md5 priority is a pure row function the
    * audit is itself engine-reproducible. Per (epoch, shard): document
    * count, distinct sources present, the largest single-source count,
    * and the Simpson concentration NUMERATOR `Σ cnt²` — an exact-integer
    * dominance measure (uniform mixing over s sources ⇒ Σcnt² ≈ n²/s;
    * one-source capture ⇒ n²), so drift is visible without a single
    * float/log in the gate (the [[qEpochOrder]] discipline).
    *
    * Scale: two map-side-combinable hash aggregates — the first's output
    * is (epochs·shards·sources)-sized, the second's (epochs·shards) —
    * and the epoch explode rides the same narrow projection as
    * [[qEpochOrder]]; no window, no sort, no per-doc state.
    */
  def qEpochMixing(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(0L), lit(EpochCount - 1L))).as("epoch"))
      .withColumn("shard", pmod(epochHash, lit(EpochShards)))
      .groupBy(col("epoch"), col("shard"), col("source"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("epoch"), col("shard"))
      .agg(sum(col("cnt")).as("n_docs"),
        count(lit(1)).as("n_sources"),
        max(col("cnt")).as("max_source_docs"),
        sum(col("cnt") * col("cnt")).as("simpson_num"))
      .orderBy(col("epoch"), col("shard"))

  val qEpochMixingSql: String =
    s"""WITH e AS (
       |  SELECT doc_id, source, unnest(range($EpochCount)) AS epoch FROM documents
       |), a AS (
       |  SELECT epoch, $epochHashSql % $EpochShards AS shard,
       |    source, CAST(count(*) AS BIGINT) AS cnt
       |  FROM e GROUP BY 1, 2, 3
       |)
       |SELECT epoch, shard, CAST(sum(cnt) AS BIGINT) AS n_docs,
       |  CAST(count(*) AS BIGINT) AS n_sources,
       |  CAST(max(cnt) AS BIGINT) AS max_source_docs,
       |  CAST(sum(cnt * cnt) AS BIGINT) AS simpson_num
       |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** The bucket table over any documents-shaped relation — the ONE place
    * the ladder + padding arithmetic lives, shared by [[qBatchBuckets]]
    * and the streaming dual ([[graft.streaming.PackStream.bucketTable]]).
    * Works unmodified on a streaming DataFrame: the aggregate is
    * mergeable and its state is the ≤10-row ladder, the smallest
    * streaming state in the suite.
    */
  private[graft] def bucketAgg(docs: DataFrame): DataFrame = {
    val n = graft.functions.TokenCount(col("text")).cast("long")
    val bucket = Seq(16L, 32L, 64L, 128L, 256L, 512L, 1024L, 2048L, 4096L)
      .foldRight(lit(8192L): Column)((b, acc) => when(col("n_tokens") <= b, b).otherwise(acc))
    docs
      .select(n.as("n_tokens"))
      .withColumn("bucket", bucket)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(least(col("n_tokens"), col("bucket"))).as("n_tokens"),
        (count(lit(1)) * col("bucket")).as("padded_tokens"),
        (count(lit(1)) * col("bucket") -
          sum(least(col("n_tokens"), col("bucket")))).as("waste_tokens"))
      .select(col("bucket"), col("n_docs"), col("n_tokens"),
        col("padded_tokens"), col("waste_tokens"))
  }

  /** LENGTH-BUCKETED batching audit — the alternative to sequence packing
    * ([[qPackSequences]]) a training stack actually chooses between:
    * batch documents whole, grouped into power-of-two token-length
    * buckets, and pay padding up to the bucket ceiling instead of
    * splitting documents across chunk boundaries. Per bucket: document
    * count, real token mass, the padded mass `n_docs · bucket`, and the
    * waste — the exact-integer table that, read against
    * [[qPaddingWaste]], decides pack-vs-bucket for a corpus. The bucket
    * ceiling is a branch ladder (16 … 4096, else 8192) rather than a
    * float `log2`, so both engines bucket bit-identically; 8192 is the
    * MAX-SEQUENCE-LENGTH bucket — a longer document is truncated to it
    * (the standard max-len policy), so its token contribution is
    * `least(n_tokens, bucket)` and waste is ≥ 0 in every bucket.
    *
    * Shape at 100 TB: one narrow projection (native
    * [[graft.functions.TokenCount]], no tokenize-explode) into one
    * map-side-combinable hash aggregate with ≤ 10 output rows.
    */
  def qBatchBuckets(spark: SparkSession, dir: String): DataFrame =
    bucketAgg(table(spark, dir, "documents")).orderBy(col("bucket"))

  val qBatchBucketsSql: String =
    """WITH d AS (
      |  SELECT len(regexp_split_to_array(lower(text), '\s+')) AS n_tokens
      |  FROM documents
      |), b AS (
      |  SELECT n_tokens,
      |    CASE WHEN n_tokens <= 16 THEN 16 WHEN n_tokens <= 32 THEN 32
      |         WHEN n_tokens <= 64 THEN 64 WHEN n_tokens <= 128 THEN 128
      |         WHEN n_tokens <= 256 THEN 256 WHEN n_tokens <= 512 THEN 512
      |         WHEN n_tokens <= 1024 THEN 1024 WHEN n_tokens <= 2048 THEN 2048
      |         WHEN n_tokens <= 4096 THEN 4096 ELSE 8192 END AS bucket
      |  FROM d
      |)
      |SELECT CAST(bucket AS BIGINT) AS bucket,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(least(n_tokens, bucket)) AS BIGINT) AS n_tokens,
      |  CAST(count(*) * bucket AS BIGINT) AS padded_tokens,
      |  CAST(count(*) * bucket - sum(least(n_tokens, bucket)) AS BIGINT) AS waste_tokens
      |FROM b GROUP BY b.bucket ORDER BY 1""".stripMargin

  /** Benchmark decontamination: every corpus document sharing at least one
    * distinct word-3-shingle with the "benchmark" subset (doc_id ≡ 0
    * mod 20 stands in for an eval set), with the count of shared shingles.
    * The shape is the dedup inverted-index join against a DISTINCT, tiny
    * benchmark shingle set — at 100 TB the benchmark side broadcasts and
    * the corpus is scanned once; ultra-common shingles should be
    * stop-listed first (same skew note as [[TextDedup.jaccardPairs]]).
    */
  def qContamination(spark: SparkSession, dir: String): DataFrame = {
    val (out, sh) = contaminationPlan(spark, dir)
    TextDedup.materializeAndRelease(out, sh)
  }

  /** The unmaterialized contamination plan + its cached shingle relation —
    * split out so plan-shape specs can inspect the join strategy (the
    * checkpointed result [[qContamination]] returns plans as an RDD scan).
    */
  private[ops] def contaminationPlan(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val sh = TextDedup.shingles(
      table(spark, dir, "documents"), col("doc_id"), col("text"), Dedup.ShingleK)
    // the eval set is ~5% of docs and its DISTINCT shingles are a dim-sized
    // relation — broadcast it so the corpus side never shuffles on the
    // shingle string (a sort-merge join here sorts the whole corpus index)
    val benchGrams = broadcast(
      sh.filter(pmod(col("id"), lit(20)) === 0).select(col("s")).distinct())
    val out = sh.filter(pmod(col("id"), lit(20)) =!= 0)
      .join(benchGrams, Seq("s"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shared"))
      .select(col("id").as("doc_id"), col("n_shared"))
      .orderBy(col("doc_id"))
    (out, sh)
  }

  val qContaminationSql: String = {
    val k = Dedup.ShingleK
    s"""WITH tok AS (
       |  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t FROM documents
       |), sh AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(len(t) - ${k - 1}),
       |    i -> array_to_string(t[i+1:i+$k], ' ')))) AS s
       |  FROM tok WHERE len(t) >= $k
       |), bench AS (
       |  SELECT DISTINCT s FROM sh WHERE doc_id % 20 = 0
       |)
       |SELECT sh.doc_id, count(*) AS n_shared
       |FROM sh JOIN bench ON sh.s = bench.s
       |WHERE sh.doc_id % 20 <> 0
       |GROUP BY sh.doc_id
       |ORDER BY sh.doc_id""".stripMargin
  }

  /** Stratified (mixture-reweighting) sample: per-LANGUAGE keep rates —
    * en 50%, zh 20%, rest 10% — applied with the same md5-bucket decision
    * as [[qSampleDet]], so the realized mixture is deterministic and
    * id-stable while rebalancing the corpus toward a target language
    * distribution (the `sampleBy` use case, minus the seeded PRNG's
    * partition-order dependence). One scan, no shuffle before the
    * aggregate.
    */
  def qSampleStratified(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .withColumn("bucket",
        pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("long"),
          lit(1000)))
      .filter(col("bucket") <
        when(col("lang") === "en", 500).when(col("lang") === "zh", 200).otherwise(100))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"))

  val qSampleStratifiedSql: String =
    """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents
      |WHERE CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      |    % 1000
      |  < CASE WHEN lang = 'en' THEN 500 WHEN lang = 'zh' THEN 200 ELSE 100 END
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  /** Length-outlier trim: drop documents outside the exact [p5, p95] of
    * n_chars, report the surviving per-language profile. The bounds are a
    * 1-row aggregate broadcast to the scan (scalar-subquery shape — the
    * corpus is read once and filtered map-side, no self-join); exact
    * `percentile` interpolation is bit-identical to DuckDB's
    * `quantile_cont`, so the trim decisions hash-match. At 100 TB swap the
    * exact percentile for `percentile_approx` at the same plan shape.
    */
  def qQuantileTrim(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val bounds = docs.agg(
      expr("percentile(n_chars, 0.05)").as("lo"),
      expr("percentile(n_chars, 0.95)").as("hi"))
    docs.crossJoin(broadcast(bounds))
      .filter(col("n_chars") >= col("lo") && col("n_chars") <= col("hi"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("n_chars")).cast("double") / count(lit(1)).cast("double")).as("avg_chars"))
      .orderBy(col("lang"))
  }

  val qQuantileTrimSql: String =
    """WITH b AS (
      |  SELECT quantile_cont(n_chars, 0.05) AS lo, quantile_cont(n_chars, 0.95) AS hi
      |  FROM documents
      |)
      |SELECT lang, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_chars
      |FROM documents, b
      |WHERE n_chars >= lo AND n_chars <= hi
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  /** Per-source quota sampling: a fixed budget of 10 documents per source,
    * chosen deterministically by md5-hash order (the reproducible stand-in
    * for "10 uniformly at random, stable across runs/engines/partitioning"),
    * then a per-source profile of the picks. The quota selection runs
    * through the native [[graft.plans.TopKPerKey]] bounded-heap operator —
    * partial heaps of ≤ 10 rows per source on the map side, so the shuffle
    * carries at most `sources × 10` rows no matter how large the corpus is
    * (a filtered `row_number()` window would sort and shuffle every row).
    */
  def qSampleQuota(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
      .withColumn("h", md5(col("doc_id").cast("string")))
    graft.plans.TopKPerKey
      .perKey(docs, Seq(col("source")), Seq(col("h").asc, col("doc_id").asc), k = 10)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("h")).as("first_hash"))
      .orderBy(col("source"))
  }

  val qSampleQuotaSql: String =
    """WITH ranked AS (
      |  SELECT source, n_chars, md5(CAST(doc_id AS VARCHAR)) AS h,
      |    row_number() OVER (PARTITION BY source
      |                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM documents
      |)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  min(h) AS first_hash
      |FROM ranked WHERE rn <= 10
      |GROUP BY 1
      |ORDER BY source""".stripMargin

  /** Length-weighted deterministic sampling: each document is kept with
    * probability ∝ its length (`n_chars / 10⁴`, capped at 0.9999) — the
    * importance-sampling step of corpus mixing (long documents carry
    * more training signal per row). The keep decision compares the
    * md5-derived bucket of doc_id against the weight threshold — a pure
    * row function like [[qSampleDet]], so the sample is repartition-
    * invariant, engine-independent, and reproducible run to run (a
    * PRNG-weighted `sample` is none of those). Per-language profile of
    * the picks, all exact integers.
    */
  def qSampleWeighted(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .withColumn("bucket",
        pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("long"),
          lit(10000)))
      .filter(col("bucket") < least(lit(9999), col("n_chars")))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"))

  val qSampleWeightedSql: String =
    """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents
      |WHERE CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      |    % 10000
      |  < least(9999, n_chars)
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  /** Temperature (α = ½) source-mixing sample: per-source keep rates
    * ∝ n_src^(α−1), normalized so the SMALLEST source keeps 100 % — the
    * standard low-resource up-weighting of multilingual corpus mixing
    * (sampling shares ∝ share^α flatten the source distribution; per-doc
    * keep probability is share^(α−1) ∝ 1/√n_src). The keep decision is
    * the same md5-bucket rule as [[qSampleDet]] against a per-source
    * integer threshold `floor(10⁴·√(n_min/n_src))`.
    *
    * Cross-engine determinism: the threshold's float path is ONE IEEE
    * division of exact longs, one correctly-rounded `sqrt`, one
    * multiply by 10⁴ and a floor — every step bit-identical in Spark
    * and DuckDB, so the realized sample hash-matches (the discipline
    * that keeps [[qQuantileTrim]]'s percentile bounds gateable).
    *
    * Scale: source sizes are a dimension-sized aggregate broadcast back
    * to the scan; the corpus is read once and filtered map-side — no
    * shuffle before the final per-source profile.
    */
  def qSampleTemperature(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val sizes = docs.groupBy(col("source")).agg(count(lit(1)).as("n_src"))
    val minN = sizes.agg(min(col("n_src")).as("n_min"))
    val rates = sizes.crossJoin(broadcast(minN))
      .select(col("source"), col("n_src"),
        floor(lit(10000d) * sqrt(col("n_min").cast("double") / col("n_src").cast("double")))
          .as("thr"))
    docs.join(broadcast(rates), "source")
      .withColumn("bucket",
        pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("long"),
          lit(10000)))
      .filter(col("bucket") < col("thr"))
      .groupBy(col("source"))
      .agg(max(col("n_src")).as("n_src"), max(col("thr")).as("thr"),
        count(lit(1)).as("n_kept"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("source"))
  }

  val qSampleTemperatureSql: String =
    """WITH sizes AS (SELECT source, count(*) AS n_src FROM documents GROUP BY 1),
      |mn AS (SELECT min(n_src) AS n_min FROM sizes),
      |rates AS (
      |  SELECT source, n_src,
      |    CAST(floor(10000 * sqrt(CAST(n_min AS DOUBLE) / CAST(n_src AS DOUBLE))) AS BIGINT) AS thr
      |  FROM sizes, mn
      |)
      |SELECT d.source, max(r.n_src) AS n_src, max(r.thr) AS thr,
      |  count(*) AS n_kept, CAST(sum(d.n_chars) AS BIGINT) AS sum_chars
      |FROM documents d JOIN rates r ON r.source = d.source
      |WHERE CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      |    % 10000 < r.thr
      |GROUP BY 1
      |ORDER BY d.source""".stripMargin

  /** Per-source quality gate at each source's own exact median: keep the
    * documents STRICTLY longer than their source's median n_chars, and
    * report the per-source floor plus how much survived. The grouped-
    * quantile complement of [[qQuantileTrim]]'s single global bounds —
    * sources with different length profiles each get their own floor, the
    * way a mixed-crawl pipeline actually gates (a boilerplate-heavy crawl
    * must not set the bar for curated text).
    *
    * The median is computed by an explicit rank formulation — value at
    * position floor((n+1)/2) of the ascending per-source order — in BOTH
    * engines, so no engine-specific percentile semantics are in play and
    * the result hash-gates. All arithmetic is exact (positions are
    * integers, the median is a witnessed data value, never interpolated).
    *
    * Scale: one per-source window (shuffle on source) to rank, one
    * dimension-sized median relation joined back (broadcast — |sources|
    * rows), one aggregate. A pathological mega-source skews the window
    * partition; that source's rank then runs through [[Rank.globalRank]]'s
    * range-partitioned selection instead — same witnessed-value contract.
    */
  def qQualityGate(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = table(spark, dir, "documents")
      .select(col("source"), col("doc_id"), col("n_chars"))
    val w = Window.partitionBy(col("source")).orderBy(col("n_chars"), col("doc_id"))
    val wAll = Window.partitionBy(col("source"))
    // both window specs share the partitioning — one exchange on source
    val ranked = docs.withColumn("rn", row_number().over(w))
      .withColumn("n_docs", count(lit(1)).over(wAll))
    val med = ranked.filter(expr("rn = (n_docs + 1) DIV 2"))
      .select(col("source"), col("n_docs"), col("n_chars").as("median_chars"))
    docs.join(broadcast(med), Seq("source"))
      .groupBy(col("source"))
      .agg(max(col("n_docs")).as("n_docs"), max(col("median_chars")).as("median_chars"),
        sum(when(col("n_chars") > col("median_chars"), 1L).otherwise(0L)).as("n_kept"))
      .select(col("source"), col("n_docs"), col("median_chars"), col("n_kept"),
        expr("n_kept * 10000 DIV n_docs").as("kept_bp"))
      .orderBy(col("source"))
  }

  val qQualityGateSql: String =
    """WITH ranked AS (
      |  SELECT source, n_chars,
      |    row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
      |    count(*) OVER (PARTITION BY source) AS n_docs
      |  FROM documents
      |), med AS (
      |  SELECT source, n_docs, n_chars AS median_chars
      |  FROM ranked WHERE rn = (n_docs + 1) // 2
      |)
      |SELECT d.source, max(m.n_docs) AS n_docs, max(m.median_chars) AS median_chars,
      |  CAST(sum(CASE WHEN d.n_chars > m.median_chars THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_kept,
      |  (CAST(sum(CASE WHEN d.n_chars > m.median_chars THEN 1 ELSE 0 END) AS BIGINT)
      |    * 10000) // max(m.n_docs) AS kept_bp
      |FROM documents d JOIN med m ON m.source = d.source
      |GROUP BY d.source
      |ORDER BY d.source""".stripMargin

  /** Global token budget to apportion across sources in [[qTokenBudget]]. */
  val TokenBudget = 100000L

  /** Shard count for the rendezvous-hash assignment in [[qShardRendezvous]]. */
  val NumShards = 8

  /** Largest-remainder (Hamilton) apportionment of a global token budget
    * across sources, proportional to each source's exact token count —
    * the "how many tokens does each source contribute to this training
    * mix" allocator. Every step is exact integer arithmetic: floor quota
    * `(B·c) DIV Σc`, remainder `(B·c) mod Σc`, and the leftover
    * `B − Σfloor` units go to the largest remainders (source asc on
    * ties), so allocations sum to B exactly — no float shares, no
    * drift, bit-identical cross-engine.
    *
    * Scale: one corpus scan collapses to a |sources|-row relation; the
    * two scalar aggregates ride as broadcast 1-row cross joins and the
    * remainder rank is a window over the dimension-sized relation —
    * nothing beyond the first aggregation touches corpus-sized data.
    */
  def qTokenBudget(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val perSrc = docs.groupBy(col("source"))
      .agg(sum(graft.functions.TokenCount(col("text")).cast("long")).as("c"))
    val tot = perSrc.agg(sum(col("c")).as("t"))
    val based = perSrc.crossJoin(broadcast(tot))
      .select(col("source"), col("c"),
        expr(s"($TokenBudget * c) DIV t").as("base"),
        expr(s"($TokenBudget * c) % t").as("rem"))
    val left = based.agg((lit(TokenBudget) - sum(col("base"))).as("extra"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("rem").desc, col("source"))
    based.crossJoin(broadcast(left))
      .withColumn("rnk", row_number().over(w))
      .select(col("source"), col("c").as("n_tokens"),
        (col("base") + when(col("rnk") <= col("extra"), 1L).otherwise(0L)).as("alloc"))
      .orderBy(col("source"))
  }

  val qTokenBudgetSql: String =
    s"""WITH per_src AS (
       |  SELECT source,
       |    CAST(sum(len(regexp_split_to_array(lower(text), '\\s+'))) AS BIGINT) AS c
       |  FROM documents GROUP BY 1
       |), tot AS (SELECT sum(c) AS t FROM per_src),
       |based AS (
       |  SELECT source, c,
       |    ($TokenBudget * c) // t AS base,
       |    ($TokenBudget * c) % t AS rem
       |  FROM per_src CROSS JOIN tot
       |), lft AS (SELECT $TokenBudget - sum(base) AS extra FROM based),
       |ranked AS (
       |  SELECT based.*, row_number() OVER (ORDER BY rem DESC, source) AS rnk
       |  FROM based
       |)
       |SELECT source, c AS n_tokens,
       |  CAST(base + (CASE WHEN rnk <= extra THEN 1 ELSE 0 END) AS BIGINT) AS alloc
       |FROM ranked CROSS JOIN lft
       |ORDER BY source""".stripMargin

  /** Temperature-based mixture sampling at α = 1/2 (the multilingual-
    * pretraining mixture move of mBERT/XLM-R: sampling probability
    * p_i ∝ n_i^α flattens the natural distribution so low-resource
    * sources are not drowned out; α between 0.3 and 0.7 is standard).
    * α = 1/2 is chosen deliberately: the weight is then a SQUARE ROOT,
    * which IEEE 754 rounds correctly in every engine — so
    * `w_i = floor(sqrt(n_tokens_i · 10^6))` is the same exact integer in
    * Spark and DuckDB (a general pow() is not correctly rounded and
    * could differ in the last ulp), and everything downstream is exact
    * integer arithmetic: mixture shares in ppm via integer division and
    * the up/down-sampling factor versus the natural mixture in ‰.
    *
    * Complements [[qDoremiWeights]] (loss-driven mixture),
    * [[qTokenBudget]] (exact apportionment of a fixed budget) and
    * [[qSampleTemperature]] (the doc-level EXECUTION of a temperature
    * downsample): this is the token-weighted PLAN — the table of target
    * shares and per-source up/down-sampling factors a sampler consumes,
    * including boosts > 1 that a pure downsampler cannot express.
    *
    * Scale: one corpus scan collapses to a |sources|-row relation; totals
    * ride as broadcast 1-row cross joins. Envelope: exact while
    * n_tokens·10^6 < 2^53 (per-source n_tokens < ~9·10^9; beyond that
    * drop the 10^6 precision scale).
    */
  def qMixTemperature(spark: SparkSession, dir: String): DataFrame =
    mixTemperature(table(spark, dir, "documents"))

  /** The table-agnostic core of [[qMixTemperature]]: any (source, text)
    * frame in, the per-source mixture plan out.
    */
  def mixTemperature(docs: DataFrame): DataFrame = {
    val perSrc = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(graft.functions.TokenCount(col("text")).cast("long")).as("n_tokens"))
      .withColumn("w", floor(sqrt((col("n_tokens") * lit(1000000L)).cast("double"))).cast("long"))
    val tot = perSrc.agg(sum(col("w")).as("sw"), sum(col("n_tokens")).as("sn"))
    perSrc.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr("n_tokens * 1000000 DIV sn").as("natural_ppm"),
        expr("w * 1000000 DIV sw").as("mix_ppm"))
      .withColumn("boost_x1000", expr("mix_ppm * 1000 DIV greatest(natural_ppm, 1)"))
      .orderBy(col("source"))
  }

  val qMixTemperatureSql: String =
    """WITH per_src AS (
      |  SELECT source, count(*) AS n_docs,
      |    CAST(sum(len(regexp_split_to_array(lower(text), '\s+'))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY 1
      |), wtd AS (
      |  SELECT per_src.*,
      |    CAST(floor(sqrt(CAST(n_tokens * 1000000 AS DOUBLE))) AS BIGINT) AS w
      |  FROM per_src
      |), tot AS (SELECT sum(w) AS sw, sum(n_tokens) AS sn FROM wtd)
      |SELECT source, CAST(n_docs AS BIGINT) AS n_docs, n_tokens,
      |  CAST(n_tokens * 1000000 // sn AS BIGINT) AS natural_ppm,
      |  CAST(w * 1000000 // sw AS BIGINT) AS mix_ppm,
      |  CAST((w * 1000000 // sw) * 1000 // greatest(n_tokens * 1000000 // sn, 1) AS BIGINT) AS boost_x1000
      |FROM wtd CROSS JOIN tot
      |ORDER BY source""".stripMargin

  /** Rendezvous (highest-random-weight) sharding: every document goes to
    * the shard whose `md5(doc_id ":" shard)` weight is highest — the
    * assignment that moves only ~1/N of keys when a shard is added or
    * removed, unlike mod-N (the reason consistent routing layers use it).
    * Weight and argmax are pure functions of the stable doc_id, so the
    * assignment is repartition- and rerun-invariant; ties (never observed
    * at 60-bit weights, but defined) break toward the smaller shard.
    *
    * Scale: embarrassingly parallel — a per-row projection over N=8
    * in-array hashes, no shuffle until the final per-shard count.
    */
  /** The rendezvous (highest-random-weight) shard of `docId` over
    * `numShards`: argmax over per-shard 60-bit md5 weights. The SINGLE
    * Scala definition of the assignment — the batch sharder, the
    * streaming router ([[graft.streaming.IngestDedup.shardRouter]]), and
    * the specs all use it, so an edit cannot silently break the pinned
    * stream/batch agreement (the DuckDB oracle re-derives the expression
    * independently and still gates the semantics).
    */
  def rendezvousShard(docId: Column, numShards: Int): Column = {
    val weights = transform(sequence(lit(0), lit(numShards - 1)),
      s => conv(substring(md5(concat_ws(":", docId, s)), 1, 15), 16, 10).cast("long"))
    (array_position(weights, array_max(weights)) - 1).cast("long")
  }

  def qShardRendezvous(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    docs
      .withColumn("shard", rendezvousShard(col("doc_id"), NumShards))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"))
      .orderBy(col("shard"))
  }

  val qShardRendezvousSql: String =
    s"""WITH w AS (
       |  SELECT doc_id, n_chars,
       |    list_transform(range($NumShards), s -> CAST(concat('0x',
       |      substring(md5(concat(doc_id, ':', s)), 1, 15)) AS BIGINT)) AS ws
       |  FROM documents
       |)
       |SELECT CAST(list_position(ws, list_max(ws)) - 1 AS BIGINT) AS shard,
       |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       |  min(doc_id) AS min_doc
       |FROM w GROUP BY 1 ORDER BY shard""".stripMargin

  /** Group-aware train/val/test assignment: the split keys on the SOURCE
    * (md5 of the source name, same 80/10/10 bucketing as [[splitCol]]),
    * so every document of a source lands in the same split — the
    * leakage-proof-by-construction alternative to per-doc splitting
    * (within-source near-duplicates can never straddle train/test,
    * shrinking what [[Dedup.qSplitLeakage]] has to audit to cross-source
    * pairs only). Output: per (split, source) doc and token counts — the
    * mixture report a practitioner checks before training.
    *
    * Scale: one corpus aggregation; the split is a pure projection of the
    * grouping key (no shuffle added to whatever grouping already costs).
    */
  def qSplitGrouped(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val bucket = pmod(
      conv(substring(md5(col("source")), 1, 8), 16, 10).cast("long"), lit(100))
    docs
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
      .groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(graft.functions.TokenCount(col("text")).cast("long")).as("n_tokens"))
      .orderBy(col("split"), col("source"))
  }

  val qSplitGroupedSql: String =
    """WITH b AS (
      |  SELECT source, text,
      |    CAST(concat('0x', substring(md5(source), 1, 8)) AS BIGINT) % 100 AS bucket
      |  FROM documents
      |)
      |SELECT CASE WHEN bucket < 80 THEN 'train'
      |            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
      |  source, count(*) AS n_docs,
      |  CAST(sum(len(regexp_split_to_array(lower(text), '\s+'))) AS BIGINT) AS n_tokens
      |FROM b GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Candidate context lengths for the padding-waste report. */
  val PaddingChunks: Seq[Int] = Seq(128, 256, 512)

  /** Padding-waste report: if every document were padded up to a multiple
    * of chunk size c, how many pad tokens does the corpus burn — `waste =
    * Σ (⌈n/c⌉·c − n)` per candidate c, with the waste share in exact
    * basis points. The context-length selection diagnostic that pairs
    * with [[qPackSequences]] (packing removes this waste; this op prices
    * NOT packing). Pure integer arithmetic from one corpus pass with the
    * three candidate sizes evaluated via an explode over a literal array.
    */
  def qPaddingWaste(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
      .select(graft.functions.TokenCount(col("text")).cast("long").as("n"))
    docs
      .select(col("n"), explode(typedLit(PaddingChunks.map(_.toLong))).as("c"))
      .select(col("c"),
        col("n"),
        (expr("((n + c - 1) DIV c) * c") - col("n")).as("waste"))
      .groupBy(col("c"))
      .agg(sum(col("n")).as("n_tokens"), sum(col("waste")).as("pad_tokens"))
      .select(col("c").as("chunk_size"), col("n_tokens"), col("pad_tokens"),
        expr("pad_tokens * 10000 DIV (n_tokens + pad_tokens)").as("waste_bp"))
      .orderBy(col("chunk_size"))
  }

  val qPaddingWasteSql: String = {
    val chunks = PaddingChunks.mkString(", ")
    s"""WITH n AS (
       |  SELECT CAST(len(regexp_split_to_array(lower(text), '\\s+')) AS BIGINT) AS n
       |  FROM documents
       |), x AS (
       |  SELECT CAST(c AS BIGINT) AS c, n,
       |    ((n + c - 1) // c) * c - n AS waste
       |  FROM n CROSS JOIN (SELECT unnest([$chunks]) AS c) cs
       |)
       |SELECT c AS chunk_size, CAST(sum(n) AS BIGINT) AS n_tokens,
       |  CAST(sum(waste) AS BIGINT) AS pad_tokens,
       |  (CAST(sum(waste) AS BIGINT) * 10000)
       |    // (CAST(sum(n) AS BIGINT) + CAST(sum(waste) AS BIGINT)) AS waste_bp
       |FROM x GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Cross-source QUANTILE NORMALIZATION of a per-doc score — the
    * calibration step before any global quality threshold: each source's
    * raw score distribution is mapped onto the POOLED distribution by
    * rank, so "top quartile of source X" and "top quartile of source Y"
    * land on the same normalized scale even when one source's raw scores
    * run systematically high. Nearest-rank formulation, all exact
    * integers: a doc at within-source rank `r` of `ns` maps to the pooled
    * score at global rank `(r·N + ns − 1) DIV ns` (the ceiling of
    * `r·N/ns`, reaching exactly N at r = ns). Score = distinct-token
    * count (lexical richness) — an exact long, so both engines rank and
    * map identically.
    *
    * Scale: the within-source rank is a source-partitioned window
    * (distributed); the pooled ladder uses [[Rank.globalRank]]'s
    * range-partitioned two-pass ranking — NO single-reducer global
    * window anywhere; the final mapping is an equi-join on the computed
    * global rank.
    */
  def qScoreQnorm(spark: SparkSession, dir: String): DataFrame =
    quantileNormalize(
      table(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(array_distinct(tokens(col("text")))).cast("long").as("score")))
      .orderBy(col("doc_id"))

  /** The reusable nearest-rank quantile-normalization core over any
    * `(doc_id, source, score)` frame — see [[qScoreQnorm]] for semantics
    * and the scale story. Output adds `norm_score`.
    */
  def quantileNormalize(m0: DataFrame, numParts: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = m0.select(col("doc_id"), col("source"), col("score"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = m.count() // control-plane scalar: pooled row count
    val ws = Window.partitionBy(col("source")).orderBy(col("score"), col("doc_id"))
    val ranked = m
      .withColumn("r", row_number().over(ws).cast("long"))
      .withColumn("ns", count(lit(1)).over(Window.partitionBy(col("source"))))
    val ladder = Rank.globalRank(
      m.select(col("score"), col("doc_id").as("tie")),
      Seq(col("score"), col("tie")), numParts, rankName = "g")
      .select(col("g"), col("score").as("norm_score"))
    val out = ranked
      .withColumn("g", expr(s"(r * ${n}L + ns - 1) DIV ns"))
      .join(ladder, "g")
      .select(col("doc_id"), col("source"), col("score"), col("norm_score"))
    TextDedup.materializeAndRelease(out, m)
  }

  val qScoreQnormSql: String =
    """WITH m AS (
      |  SELECT doc_id, source,
      |    CAST(len(list_distinct(regexp_split_to_array(lower(text), '\s+'))) AS BIGINT) AS score
      |  FROM documents
      |), r AS (
      |  SELECT doc_id, source, score,
      |    row_number() OVER (PARTITION BY source ORDER BY score, doc_id) AS r,
      |    count(*) OVER (PARTITION BY source) AS ns
      |  FROM m
      |), p AS (
      |  SELECT score AS norm_score,
      |    row_number() OVER (ORDER BY score, doc_id) AS g
      |  FROM m
      |), n AS (SELECT count(*) AS n FROM m)
      |SELECT r.doc_id, r.source, r.score, p.norm_score
      |FROM r CROSS JOIN n JOIN p ON p.g = (r.r * n.n + r.ns - 1) // r.ns
      |ORDER BY r.doc_id""".stripMargin

  /** Number of hashed feature buckets for [[qDsirWeights]]. */
  val DsirBuckets = 256

  /** DSIR-style IMPORTANCE WEIGHTS for data selection (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling",
    * arXiv:2302.03169 — log-free variant): score each document by how
    * much its hashed-unigram feature distribution resembles a TARGET
    * domain (here the labeled-`en` slice) relative to the raw corpus.
    * Per bucket the likelihood ratio is `(t_cnt·C_total·10⁴) DIV
    * (c_cnt·T_total)` in exact basis points (10000 = bucket drawn at the
    * target rate); a document's weight is the exact-integer mean of its
    * token positions' bucket ratios. Top-20 by weight = the raw docs a
    * target-domain-seeking sampler would keep first.
    *
    * Scale: the token relation persists once and feeds three aggregates
    * (bucket×2 + totals); the ratio relation is [[DsirBuckets]] rows —
    * broadcast back onto the token stream, so the only corpus-sized
    * shuffle is the per-doc partial-aggregated mean.
    *
    * Envelope (round-16 escape, VERDICT r15 item 1c): the ratio moments
    * are DECIMAL(38,0) — numerator `t_cnt·C_total·10⁴` safe while
    * target×corpus token-products ≤ 10^34 (any corpus to ~10^17 tokens;
    * the old long form bound at 9·10^14), denominator `c_cnt·T_total`
    * likewise. The per-bucket quotient lands in BIGINT through
    * [[Tables.satFloorDiv]] capped at [[DsirRatioCapBp]], and the
    * per-doc Σ ratio is summed in decimal — so the sf100 shape is safe
    * by construction, with no subsampling semantics change needed.
    */
  def qDsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val toks = table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), explode(tokens(col("text"))).as("tok"))
      .select(col("doc_id"), col("lang"),
        pmod(conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"),
          lit(DsirBuckets.toLong)).as("bucket"))
      .persist()
    val corpus = toks.groupBy(col("bucket")).agg(count(lit(1)).as("c_cnt"))
    val target = toks.filter(col("lang") === "en")
      .groupBy(col("bucket")).agg(count(lit(1)).as("t_cnt"))
    val totals = toks.agg(count(lit(1)).as("c_total"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("t_total"))
    val ratios = corpus
      .join(target, Seq("bucket"), "left")
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        Tables.satFloorDiv(
          Tables.big(coalesce(col("t_cnt"), lit(0L))) * col("c_total") * lit(10000L),
          Tables.big(col("c_cnt")) * col("t_total"),
          DsirRatioCapBp).as("ratio_bp"))
    toks
      .join(broadcast(ratios), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(Tables.big(col("ratio_bp"))).as("sum_bp"))
      .select(col("doc_id"), col("n_tokens"),
        expr("sum_bp DIV n_tokens").as("weight_bp"))
      .orderBy(col("weight_bp").desc, col("doc_id")).limit(20)
  }

  /** Saturation ceiling for a bucket's DSIR likelihood ratio (bp →
    * ratio 10^11). Reachable only when a bucket is ~10^11× enriched in
    * the target vs the corpus — impossible under md5 bucketing at any
    * measured scale (values are the identical exact integers through
    * sf10); it bounds the BIGINT landing of the DECIMAL(38,0) quotient
    * by construction, so sf100 cannot abort.
    */
  val DsirRatioCapBp: Long = 1000000000000000L

  val qDsirWeightsSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang,
       |    CAST(concat('0x', substring(md5(tok), 1, 8)) AS BIGINT) % $DsirBuckets AS bucket
       |  FROM (SELECT doc_id, lang, unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
       |        FROM documents)
       |), corpus AS (
       |  SELECT bucket, CAST(count(*) AS BIGINT) AS c_cnt FROM toks GROUP BY bucket
       |), target AS (
       |  SELECT bucket, CAST(count(*) AS BIGINT) AS t_cnt
       |  FROM toks WHERE lang = 'en' GROUP BY bucket
       |), totals AS (
       |  SELECT CAST(count(*) AS BIGINT) AS c_total,
       |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS t_total
       |  FROM toks
       |), ratios AS (
       |  SELECT corpus.bucket,
       |    least((CAST(COALESCE(target.t_cnt, 0) AS HUGEINT) * totals.c_total * 10000)
       |      // (CAST(corpus.c_cnt AS HUGEINT) * totals.t_total),
       |      1000000000000000) AS ratio_bp
       |  FROM corpus LEFT JOIN target ON corpus.bucket = target.bucket
       |  CROSS JOIN totals
       |)
       |SELECT toks.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |  CAST(sum(ratio_bp) // count(*) AS BIGINT) AS weight_bp
       |FROM toks JOIN ratios ON toks.bucket = ratios.bucket
       |GROUP BY toks.doc_id
       |ORDER BY weight_bp DESC, doc_id LIMIT 20""".stripMargin

  /** Vocabulary size for the [[qDoremiWeights]] loss proxy. */
  val DoremiVocabK = 256

  /** Multiplicative-weights rounds for [[qDoremiWeights]]. */
  val DoremiRounds = 5

  /** DoReMi-style domain (source) reweighting by iterated multiplicative
    * weights — the mixture-tuning move of Xie et al., "DoReMi: Optimizing
    * Data Mixtures Speeds Up Language Model Pretraining": domains whose
    * proxy EXCESS LOSS is high get their mixture weight multiplied up each
    * round, then weights renormalize to a distribution. Training a proxy
    * model is out of scope for a data engine, so the per-domain loss
    * stands in as the out-of-vocabulary rate against the corpus top-256
    * vocabulary (in basis points — the domain the reference tokenizer
    * models worst is the one DoReMi would upweight); the ITERATION is the
    * real operator and runs entirely in exact integers:
    *
    *   w ← w · (10000 + excess_bp) DIV 10000,  then
    *   w ← w · (n_domains · 10^6) DIV Σw            (renormalize)
    *
    * for 5 rounds — every intermediate an exact long (renormalized w is
    * bounded by n_domains·10^6·3, so products stay ≪ 2^63), replayed by
    * the oracle as chained CTEs, final output the mixture in ppm.
    *
    * Scale: one corpus scan into a map-side-combined (source, token)
    * aggregate + a broadcast top-K vocab join; the iteration itself runs
    * on a DOMAIN-sized relation (a handful of rows) with 1-row broadcast
    * totals — the 100 TB cost is the scan, not the solve.
    */
  def qDoremiWeights(spark: SparkSession, dir: String): DataFrame =
    doremiWeights(table(spark, dir, "documents"))

  /** [[qDoremiWeights]]'s iteration over any (source, text) frame.
    *
    * One corpus scan (round 16): the token explode feeds a map-side-
    * combined `(source, token) → cnt` aggregate ONCE; the top-K vocab and
    * the per-source OOV loss both derive from that persisted relation by
    * re-aggregation (`count(*)` over instances ≡ `sum(cnt)` — exact
    * longs, so the result is bit-identical). Before, the unpersisted
    * token relation was referenced by both subtrees and the corpus was
    * tokenized+exploded twice per run; the vocab join now probes
    * distinct (source, token) rows instead of every token instance.
    *
    * localCheckpoint, NOT persist: the multiplicative-weights loop below
    * nests one broadcast build per round, and EVERY build re-plans its
    * whole subtree — with an InMemoryRelation in that lineage the
    * repeated cached-plan re-optimization measured 36–58 s at sf0.1
    * (vs 4.4 s inline, 3.0 s checkpointed). The checkpoint truncates the
    * lineage to a materialized leaf, so each per-round broadcast plans a
    * domain-sized subtree.
    */
  def doremiWeights(docs: DataFrame): DataFrame = {
    val Scale = 1000000L
    // Round 17 (VERDICT r16 item 5 — the r16 form regressed on the driver):
    // checkpoint the DOMAIN-sized loss relation, not the vocab-sized
    // (source, token) relation. `sw` is persisted only for the duration of
    // the ONE job that materializes `loss` (its two consumers — the vocab
    // top-K build side and the OOV probe side — both read the cache inside
    // that job), so the corpus is still tokenized exactly once, but the
    // eager checkpoint WRITE + re-SCAN of the vocab-sized relation is gone.
    // The multiplicative-weights loop below then plans every per-round
    // broadcast over a few-row checkpoint leaf — no InMemoryRelation in any
    // re-planned lineage (the 36–58 s re-optimization trap documented r16).
    val sw = docs
      .select(col("source"), explode(tokens(col("text"))).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab = sw.groupBy(col("w")).agg(sum(col("cnt")).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(DoremiVocabK)
      .select(col("w"), lit(1).as("inv"))
    val loss = sw.join(broadcast(vocab), Seq("w"), "left")
      .groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_tokens"),
        sum(when(col("inv").isNull, col("cnt")).otherwise(0L)).as("oov"))
      .select(col("source"), expr("oov * 10000 DIV n_tokens").as("loss_bp"))
      .localCheckpoint()
    sw.unpersist(blocking = false)
    val minLoss = loss.agg(min(col("loss_bp")).as("min_bp"))
    var w = loss.crossJoin(broadcast(minLoss))
      .select(col("source"), col("loss_bp"),
        (col("loss_bp") - col("min_bp")).as("excess_bp"),
        lit(Scale).as("w"))
    for (_ <- 1 to DoremiRounds) {
      val upd = w.select(col("source"), col("loss_bp"), col("excess_bp"),
        expr("w * (10000 + excess_bp) DIV 10000").as("w"))
      val tot = upd.agg(sum(col("w")).as("tot"), count(lit(1)).as("ns"))
      w = upd.crossJoin(broadcast(tot))
        .select(col("source"), col("loss_bp"), col("excess_bp"),
          expr(s"w * (ns * ${Scale}L) DIV tot").as("w"))
    }
    val tot = w.agg(sum(col("w")).as("tot"))
    val out = w.crossJoin(broadcast(tot))
      .select(col("source"), col("loss_bp"), col("excess_bp"),
        expr(s"w * ${Scale}L DIV tot").as("weight_ppm"))
      .orderBy(col("source"))
    // source-dimension-sized result; the loss checkpoint blocks are left
    // for the caller's Caches.releaseAll sweep (which unpersists
    // checkpoint RDDs directly — Dataset.unpersist is a CacheManager
    // no-op on checkpoints, ADVICE r16).
    TextDedup.materializeAndRelease(out)
  }

  val qDoremiWeightsSql: String = {
    def round(i: Int): String =
      s"""u$i AS (
         |  SELECT source, loss_bp, excess_bp,
         |    (w * (10000 + excess_bp)) // 10000 AS w
         |  FROM r${i - 1}
         |), r$i AS (
         |  SELECT source, loss_bp, excess_bp,
         |    (w * ((SELECT count(*) FROM u$i) * 1000000)) // (SELECT sum(w) FROM u$i) AS w
         |  FROM u$i
         |)""".stripMargin
    s"""WITH tok AS (
       |  SELECT source, unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
       |  FROM documents
       |), vocab AS (
       |  SELECT w FROM (
       |    SELECT w, count(*) AS cnt FROM tok GROUP BY 1
       |    ORDER BY cnt DESC, w LIMIT $DoremiVocabK)
       |), loss AS (
       |  SELECT source,
       |    (CAST(sum(CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) * 10000)
       |      // count(*) AS loss_bp
       |  FROM tok LEFT JOIN vocab ON tok.w = vocab.w
       |  GROUP BY source
       |), r0 AS (
       |  SELECT source, loss_bp,
       |    loss_bp - (SELECT min(loss_bp) FROM loss) AS excess_bp,
       |    CAST(1000000 AS BIGINT) AS w
       |  FROM loss
       |), ${(1 to DoremiRounds).map(round).mkString(", ")}
       |SELECT source, CAST(loss_bp AS BIGINT) AS loss_bp,
       |  CAST(excess_bp AS BIGINT) AS excess_bp,
       |  CAST((w * 1000000) // (SELECT sum(w) FROM r$DoremiRounds) AS BIGINT) AS weight_ppm
       |FROM r$DoremiRounds ORDER BY source""".stripMargin
  }

  /** LEAVE-ONE-OUT target encoding — the leakage-safe categorical feature
    * for tabular model training: a category's encoded value for row i is
    * the target mean of the category EXCLUDING row i (naive target
    * encoding leaks the row's own label into its feature — the classic
    * CV-inflation bug), shrunk toward the global prior with an m-estimate
    * (m = 100) so rare categories don't memorize their few labels:
    * `enc = (Σy − y_i + m·prior) / (n − 1 + m)`, all in exact basis
    * points. Target: order-is-urgent; category: customer market segment.
    *
    * Scale: one broadcast dimension join + one category-sized statistics
    * relation broadcast back — a single data scan end to end, no window,
    * no shuffle of the fact table. The emitted sample (every 97th order)
    * hash-pins the per-row arithmetic.
    */
  def qTargetEncode(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
      when(col("o_orderpriority").startsWith("1"), 1L).otherwise(0L).as("y"))
    val c = table(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment").as("cat"))
    val rows = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
    val stats = rows.groupBy(col("cat"))
      .agg(count(lit(1)).as("n_cat"), sum(col("y")).as("sum_y"))
    val tot = rows.agg(count(lit(1)).as("n_all"), sum(col("y")).as("y_all"))
    rows.join(broadcast(stats), Seq("cat"))
      .crossJoin(broadcast(tot)) // 1-row scalar attach
      .withColumn("loo_bp", expr("(sum_y - y) * 10000 DIV greatest(n_cat - 1, 1)"))
      .withColumn("enc_bp",
        expr("((sum_y - y) * 10000 + 100 * (y_all * 10000 DIV n_all)) DIV (n_cat - 1 + 100)"))
      .filter(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey"), col("cat"), col("y"), col("n_cat"),
        col("loo_bp"), col("enc_bp"))
      .orderBy(col("o_orderkey"))
  }

  val qTargetEncodeSql: String =
    """WITH r AS (
      |  SELECT o_orderkey, c_mktsegment AS cat,
      |    CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END AS y
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |), s AS (
      |  SELECT cat, CAST(count(*) AS BIGINT) AS n_cat,
      |    CAST(sum(y) AS BIGINT) AS sum_y
      |  FROM r GROUP BY cat
      |), t AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_all, CAST(sum(y) AS BIGINT) AS y_all FROM r
      |)
      |SELECT o_orderkey, cat, CAST(y AS BIGINT) AS y, n_cat,
      |  CAST((sum_y - y) * 10000 // greatest(n_cat - 1, 1) AS BIGINT) AS loo_bp,
      |  CAST(((sum_y - y) * 10000 + 100 * (y_all * 10000 // n_all)) // (n_cat - 1 + 100) AS BIGINT) AS enc_bp
      |FROM r JOIN s USING (cat) CROSS JOIN t
      |WHERE o_orderkey % 97 = 0
      |ORDER BY o_orderkey""".stripMargin

  /** Window / stride (tokens) for [[qChunkWindows]]. */
  val ChunkW = 64
  val ChunkS = 48

  /** RAG-STYLE CHUNKING: split every document into [[ChunkW]]-token
    * windows at [[ChunkS]]-token stride (16-token overlap), emitting one
    * row per chunk with its position, length and content fingerprint —
    * the chunk table an embedding/retrieval pipeline materializes before
    * vectorizing a corpus. Chunk count per doc is ⌈n/stride⌉ (the final
    * window may be short); the fingerprint is the md5 of the chunk's
    * tokens, so downstream chunk-level dedup is a plain groupBy.
    *
    * Scale: a pure per-row explode (`transform(sequence(...))` over the
    * token array, whole-stage codegen'd) — no shuffle until the
    * presentation sort; output is Σ⌈n/S⌉ rows, ~n/S·|corpus|, linear.
    */
  def qChunkWindows(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .withColumn("n", size(col("t")))
      .filter(col("n") > 0)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), ((col("n") - 1) / lit(ChunkS)).cast("int")),
          i => slice(col("t"), i * ChunkS + 1, lit(ChunkW)))).as(Seq("ci", "c")))
      .select(col("doc_id"), col("ci").cast("long").as("chunk_idx"),
        (col("ci") * ChunkS).cast("long").as("start_tok"),
        size(col("c")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", col("c"))).as("fp"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  val qChunkWindowsSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t FROM documents
       |), c AS (
       |  SELECT doc_id, t, unnest(range(((len(t) - 1) // $ChunkS) + 1)) AS ci
       |  FROM d WHERE len(t) > 0
       |)
       |SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
       |  CAST(ci * $ChunkS AS BIGINT) AS start_tok,
       |  CAST(len(t[ci * $ChunkS + 1 : ci * $ChunkS + $ChunkW]) AS BIGINT) AS n_tokens,
       |  md5(array_to_string(t[ci * $ChunkS + 1 : ci * $ChunkS + $ChunkW], ' ')) AS fp
       |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  /** TOKEN-BUDGET WATER-FILLING: allocate a corpus-wide token budget
    * (60% of the total here) across sources by the water-filling rule —
    * every source gets min(its tokens, L) where the integer waterline L
    * is the largest level the budget can fund. The allocation that
    * equalizes marginal take across sources: big crawls are capped at L,
    * small curated sources are taken whole — the budgeted dual of
    * [[qMixTemperature]]'s proportional reweighting.
    *
    * L is found CLOSED-FORM, not iteratively: with sources sorted by
    * size, the first row j where `(B − prefix_{j−1}) DIV remaining < n_j`
    * pins the waterline segment (everything smaller is fully funded,
    * everything from j on is capped); no row before j can fire — while
    * full funding remains feasible the candidate stays ≥ n_j. One
    * |sources|-row window pass; every quantity an exact long.
    */
  def qTokenWaterfill(spark: SparkSession, dir: String): DataFrame =
    waterfillFrom(table(spark, dir, "documents")
      .groupBy(col("source"))
      .agg(sum(graft.functions.TokenCount(col("text")).cast("long")).as("n")))

  /** The closed-form allocation over ANY (source, n) totals relation —
    * shared by the batch query and the streaming maintenance gate
    * ([[graft.streaming.WaterfillStream]]), which carries the per-source
    * totals across micro-batches and re-derives the plan per commit.
    */
  def waterfillFrom(perSrc: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tot = perSrc.agg((sum(col("n")) * 6).as("b6"))
      .select(expr("b6 DIV 10").as("budget"))
    val w = Window.orderBy(col("n"), col("source"))
    val rows = perSrc.crossJoin(broadcast(tot))
      .withColumn("j", row_number().over(w).cast("long"))
      .withColumn("pfx", coalesce(
        sum(col("n")).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("nsrc", count(lit(1)).over(
        Window.partitionBy().rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("cand", expr("(budget - pfx) DIV (nsrc - j + 1)"))
    val wl = rows.agg(
      min(when(col("cand") < col("n"), struct(col("j"), col("cand")))).as("first"),
      max(col("n")).as("nmax"))
      .select(coalesce(col("first.cand"), col("nmax")).as("waterline"))
    rows.crossJoin(broadcast(wl))
      .select(col("source"), col("n").as("n_tokens"),
        least(col("n"), col("waterline")).as("alloc"),
        (col("n") - least(col("n"), col("waterline"))).as("spilled"),
        col("waterline"), col("budget"))
      .orderBy(col("source"))
  }

  val qTokenWaterfillSql: String =
    """WITH per_src AS (
      |  SELECT source,
      |    CAST(sum(len(regexp_split_to_array(lower(text), '\s+'))) AS BIGINT) AS n
      |  FROM documents GROUP BY 1
      |), tot AS (SELECT CAST(sum(n) * 6 // 10 AS BIGINT) AS budget FROM per_src),
      |rows_ AS (
      |  SELECT source, n, budget,
      |    row_number() OVER (ORDER BY n, source) AS j,
      |    COALESCE(sum(n) OVER (ORDER BY n, source
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pfx,
      |    count(*) OVER () AS nsrc
      |  FROM per_src CROSS JOIN tot
      |), wl AS (
      |  SELECT coalesce(
      |    (SELECT (budget - pfx) // (nsrc - j + 1) FROM rows_
      |     WHERE (budget - pfx) // (nsrc - j + 1) < n ORDER BY j LIMIT 1),
      |    (SELECT max(n) FROM rows_)) AS waterline
      |)
      |SELECT source, n AS n_tokens,
      |  CAST(least(n, waterline) AS BIGINT) AS alloc,
      |  CAST(n - least(n, waterline) AS BIGINT) AS spilled,
      |  CAST(waterline AS BIGINT) AS waterline, budget
      |FROM rows_ CROSS JOIN wl
      |ORDER BY source""".stripMargin

  /** CHUNK-LEVEL DUPLICATION PROFILE: the dedup view of the
    * [[qChunkWindows]] chunk table — per source, how many retrieval
    * chunks are corpus-wide duplicates (their content fingerprint occurs
    * ≥ 2×). Whole-document dedup misses this entirely (two distinct docs
    * sharing one boilerplate chunk), and a vector store pays for every
    * duplicate chunk twice — once in storage, once in degraded retrieval
    * diversity. Reported in exact basis points.
    *
    * Scale: the chunk explode is linear ([[qChunkWindows]]); the dup set
    * is a map-side-combinable df aggregate. Unlike the df≥3 hot sets
    * elsewhere, the ≥2 survivor set is NOT bounded by construction — it
    * scales with the corpus's duplication mass — so the semi-join back is
    * left UNHINTED: AQE broadcasts it when it measures small and falls
    * back to a shuffle join on a duplication-heavy corpus where a forced
    * broadcast would OOM the driver (ADVICE r11).
    */
  def qChunkDedup(spark: SparkSession, dir: String): DataFrame = {
    val chunks = table(spark, dir, "documents")
      .select(col("doc_id"), col("source"), tokens(col("text")).as("t"))
      .withColumn("n", size(col("t")))
      .filter(col("n") > 0)
      .select(col("doc_id"), col("source"),
        explode(transform(
          sequence(lit(0), ((col("n") - 1) / lit(ChunkS)).cast("int")),
          i => slice(col("t"), i * ChunkS + 1, lit(ChunkW)))).as("c"))
      .select(col("source"), md5(concat_ws(" ", col("c"))).as("fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dup = chunks.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2).select(col("fp"))
    val out = chunks
      .join(dup, Seq("fp"), "left_semi")
      .groupBy(col("source")).agg(count(lit(1)).as("n_dup_chunks"))
      .join(chunks.groupBy(col("source")).agg(count(lit(1)).as("n_chunks")),
        Seq("source"), "right")
      .select(col("source"), col("n_chunks"),
        coalesce(col("n_dup_chunks"), lit(0L)).as("n_dup_chunks"))
      .withColumn("dup_share_bp", expr("n_dup_chunks * 10000 DIV n_chunks"))
      .orderBy(col("source"))
    TextDedup.materializeAndRelease(out, chunks)
  }

  val qChunkDedupSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, source, regexp_split_to_array(lower(text), '\\s+') AS t
       |  FROM documents
       |), chunks AS (
       |  SELECT source,
       |    md5(array_to_string(t[ci * $ChunkS + 1 : ci * $ChunkS + $ChunkW], ' ')) AS fp
       |  FROM (SELECT source, t, unnest(range(((len(t) - 1) // $ChunkS) + 1)) AS ci
       |        FROM d WHERE len(t) > 0)
       |), dup AS (
       |  SELECT fp FROM chunks GROUP BY fp HAVING count(*) >= 2
       |)
       |SELECT c.source, count(*) AS n_chunks,
       |  CAST(sum(CASE WHEN dup.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_dup_chunks,
       |  CAST(sum(CASE WHEN dup.fp IS NOT NULL THEN 1 ELSE 0 END) * 10000 // count(*)
       |    AS BIGINT) AS dup_share_bp
       |FROM chunks c LEFT JOIN dup ON dup.fp = c.fp
       |GROUP BY c.source
       |ORDER BY c.source""".stripMargin

  /** Sample size for [[qSamplePriority]]. */
  val PriorityK = 20

  /** PRIORITY SAMPLING (Duffield-Lund-Thorup): a weighted
    * WITHOUT-replacement sample of exactly k documents — each doc gets
    * priority `w / u` (weight over a uniform draw) and the top-k
    * priorities win; the scheme whose inclusion probabilities make
    * subset-sum estimates near-optimal. The "uniform draw" is the house
    * md5 discipline (52 bits of `md5("prio:" + doc_id)`, +1 to dodge
    * zero), so the sample is deterministic, repartition-invariant and
    * engine-replayable; the priority itself is the EXACT integer
    * `(w << 52) DIV u` — no float anywhere, so ranking is bit-stable.
    *
    * Envelope: `w · 2^52` needs w < 2^11 (n_chars here tops out < 1024);
    * the guard raises rather than wraps (SCALE.md audit discipline).
    *
    * Scale: one projection + one top-k (rides [[graft.plans.TopKPerKey]]
    * partial/final through the native rule when keyed; here a plain
    * global ORDER BY LIMIT k, which Spark runs as TakeOrdered — no full
    * sort).
    */
  def qSamplePriority(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars").as("w"),
        (pmod(conv(substring(md5(concat(lit("prio:"), col("doc_id").cast("string"))), 1, 13),
          16, 10).cast("long"), lit(1L << 52)) + 1).as("u"))
      .withColumn("priority",
        EmbedStats.envelopeGuard(col("w"), (1L << 11) - 1,
          "priority sample: weight", "drop the 52-bit scale to 40 bits")(
          expr(s"(w * ${1L << 52}) DIV u")))
      .orderBy(col("priority").desc, col("doc_id"))
      .limit(PriorityK)
      .select(col("doc_id"), col("source"), col("w").as("n_chars"),
        col("u"), col("priority"))

  val qSamplePrioritySql: String =
    s"""WITH p AS (
       |  SELECT doc_id, source, n_chars AS w,
       |    CAST(concat('0x', substring(md5(concat('prio:', CAST(doc_id AS VARCHAR))), 1, 13))
       |      AS BIGINT) % ${1L << 52} + 1 AS u
       |  FROM documents
       |)
       |SELECT doc_id, source, w AS n_chars, u,
       |  CAST((w * ${1L << 52}) // u AS BIGINT) AS priority
       |FROM p
       |ORDER BY priority DESC, doc_id
       |LIMIT $PriorityK""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_chunk_windows" -> (qChunkWindows _),
    "q_chunk_dedup" -> (qChunkDedup _),
    "q_token_waterfill" -> (qTokenWaterfill _),
    "q_sample_priority" -> (qSamplePriority _),
    "q_target_encode" -> (qTargetEncode _),
    "q_doremi_weights" -> (qDoremiWeights _),
    "q_dsir_weights" -> (qDsirWeights _),
    "q_score_qnorm" -> (qScoreQnorm _),
    "q_split_grouped" -> (qSplitGrouped _),
    "q_padding_waste" -> (qPaddingWaste _),
    "q_token_budget" -> (qTokenBudget _),
    "q_mix_temperature" -> (qMixTemperature _),
    "q_shard_rendezvous" -> (qShardRendezvous _),
    "q_quality_gate" -> (qQualityGate _),
    "q_sample_temperature" -> (qSampleTemperature _),
    "q_sample_weighted" -> (qSampleWeighted _),
    "q_sample_quota" -> (qSampleQuota _),
    "q_sample_det" -> (qSampleDet _),
    "q_sample_stratified" -> (qSampleStratified _),
    "q_split_assign" -> (qSplitAssign _),
    "q_pack_sequences" -> (qPackSequences _),
    "q_epoch_order" -> (qEpochOrder _),
    "q_epoch_mixing" -> (qEpochMixing _),
    "q_batch_buckets" -> (qBatchBuckets _),
    "q_quantile_trim" -> (qQuantileTrim _),
    "q_contamination" -> (qContamination _))

  def oracle: Map[String, String] = Map(
    "q_chunk_windows" -> qChunkWindowsSql,
    "q_chunk_dedup" -> qChunkDedupSql,
    "q_token_waterfill" -> qTokenWaterfillSql,
    "q_sample_priority" -> qSamplePrioritySql,
    "q_target_encode" -> qTargetEncodeSql,
    "q_doremi_weights" -> qDoremiWeightsSql,
    "q_dsir_weights" -> qDsirWeightsSql,
    "q_score_qnorm" -> qScoreQnormSql,
    "q_split_grouped" -> qSplitGroupedSql,
    "q_padding_waste" -> qPaddingWasteSql,
    "q_token_budget" -> qTokenBudgetSql,
    "q_mix_temperature" -> qMixTemperatureSql,
    "q_shard_rendezvous" -> qShardRendezvousSql,
    "q_quality_gate" -> qQualityGateSql,
    "q_sample_temperature" -> qSampleTemperatureSql,
    "q_sample_weighted" -> qSampleWeightedSql,
    "q_sample_quota" -> qSampleQuotaSql,
    "q_sample_det" -> qSampleDetSql,
    "q_sample_stratified" -> qSampleStratifiedSql,
    "q_split_assign" -> qSplitAssignSql,
    "q_pack_sequences" -> qPackSequencesSql,
    "q_epoch_order" -> qEpochOrderSql,
    "q_epoch_mixing" -> qEpochMixingSql,
    "q_batch_buckets" -> qBatchBucketsSql,
    "q_quantile_trim" -> qQuantileTrimSql,
    "q_contamination" -> qContaminationSql)
}
