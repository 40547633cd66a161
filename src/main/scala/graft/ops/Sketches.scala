package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Mergeable sketches — the 100 TB answer to "how many distinct?" and
  * "what are the heavy hitters?" when the exact answer would shuffle the
  * whole key space: HyperLogLog registers (distinct cardinality),
  * KMV/bottom-k (distinct cardinality via order statistics, riding the
  * native [[graft.plans.TopKPerKey]] operator), and a count-min sketch
  * (point frequency over-estimates). Each query ALSO computes the exact
  * answer and the signed error in basis points — at test scale the exact
  * side is the oracle's ground truth; at 100 TB it is precisely the scan
  * you run the sketch to avoid (drop the comparison columns and only the
  * sketch state crosses the wire).
  *
  * Why these are the scale path: a sketch's state is a small FIXED-size
  * aggregate (2^p byte-sized registers, k hashes, d·w counters) that
  * merges associatively — Spark computes it as a map-side partial
  * aggregate, so the shuffle carries per-partition sketch fragments
  * instead of every distinct key. An exact `count(distinct s)` over a
  * 100 TB corpus shuffles the full distinct key set; the HLL register
  * relation shuffles at most `sources × m` max-rho rows no matter how the
  * corpus grows.
  *
  * Determinism discipline (house style): the hash is the first 15 hex
  * chars of md5 — a 60-bit non-negative exact integer both engines
  * compute identically (the [[TextDedup.simhashPairs]] idiom) — and every
  * derived quantity (bucket, rho via binary-string length — no libm
  * log2, scaled harmonic sums, integer-division estimates with DECIMAL /
  * HUGEINT widening) is exact integer arithmetic, so all three queries
  * hash-gate against the DuckDB oracle instead of a rows-only check.
  * Signed errors avoid `DIV` on negatives (Spark truncates toward zero,
  * DuckDB `//` floors): magnitude divides, a CASE applies the sign.
  */
object Sketches {

  /** Hash width: 15 hex chars of md5 = 60 bits, clear of the long sign. */
  val HashBits = 60

  /** 60-bit md5-derived hash — deterministic and engine-portable. */
  private def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** HLL precision: 2^8 = 256 registers per source. Standard error
    * 1.04/√m ≈ 6.5%; the per-source shingle vocabularies (1k at sf0.001,
    * 10k at sf0.1) sit well above the 2.5m low-range cutoff, so the raw
    * harmonic estimator applies without the linear-counting branch (which
    * would need a log and break the integer discipline; V is emitted so a
    * presentation layer could apply it).
    */
  val HllP = 8
  val HllM: Int = 1 << HllP
  /** Bits left for the rho scan after the bucket index. */
  val HllWindow: Int = HashBits - HllP // 52
  /** Exponent scale: Z is accumulated as Σ 2^(S − M_j) with S = window+1,
    * so the smallest register contribution is exactly 1 and an empty
    * register contributes 2^S — all integer, max m·2^53 < 2^62.
    */
  val HllScaleExp: Int = HllWindow + 1 // 53

  /** α_m · m² · 2^S as an exact integer: α_256 = 0.7213/(1 + 1.079/256)
    * = 7213·256·1000 / (10000·257079) = 1846528/2570790 exactly.
    */
  private val HllAlphaNum = BigInt(1846528) * BigInt(HllM) * BigInt(HllM) *
    (BigInt(1) << HllScaleExp)
  private val HllAlphaDen = 2570790L

  /** KMV bottom-k size; every source's shingle vocabulary is ≥ k at every
    * test SF, so the k-th order statistic always exists.
    */
  val KmvK = 64
  private val KmvNum = BigInt(KmvK - 1) * (BigInt(1) << HashBits)

  /** Count-min geometry: 4 rows × 2048 counters (8k longs of state). */
  val CmsRows = 4
  val CmsWidth = 2048
  /** log2(CmsWidth) — the AMS sign bit sits just above the index bits. */
  val CmsIdxBits = 11
  /** Heavy hitters reported: top by (df desc, shingle). */
  val CmsTopK = 20

  /** `(source, s)` — the distinct 3-shingle vocabulary per source (the
    * per-doc [[TextDedup.shingles]] postings de-duplicated across each
    * source's documents).
    */
  def sourceShingles(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val sh = TextDedup.shingles(docs, col("doc_id"), col("text"), Dedup.ShingleK)
    val src = sh
      .join(docs.select(col("doc_id").as("id"), col("source")), Seq("id"))
      .select(col("source"), col("s"))
      .distinct()
    TextDedup.materializeAndRelease(src, sh)
  }

  /** Signed error in basis points without negative integer division:
    * magnitude DIV, CASE sign (Spark DIV truncates toward zero, DuckDB
    * `//` floors — they agree only on non-negatives).
    */
  private def errBp(est: String, exact: String): Column =
    expr(s"""CASE WHEN $est >= $exact THEN ($est - $exact) * 10000 DIV $exact
            |ELSE -(($exact - $est) * 10000 DIV $exact) END""".stripMargin)

  /** `(source, bucket, m_j)` HLL registers from a `(source, s)` item
    * relation: bucket = low p hash bits; rho = 1 + leading zeros of the
    * remaining `window` bits, computed as `window + 1 − length(bin(w))` —
    * the binary-string length is the integer ⌊log2⌋+1 in BOTH engines, no
    * libm. `M_j = max(rho)` per (source, bucket) is ONE map-side
    * combinable aggregate: the shuffle moves ≤ m rows per source per
    * partition however large the corpus. Mergeable: the registers of a
    * union are the elementwise max of the parts' registers (max of maxes
    * — spec-pinned).
    */
  def hllRegisters(src: DataFrame): DataFrame =
    src
      .select(col("source"), h60(col("s")).as("h"))
      .select(col("source"),
        (col("h") % HllM).cast("int").as("bucket"),
        shiftrightunsigned(col("h"), HllP).as("w"))
      .select(col("source"), col("bucket"),
        when(col("w") === 0, lit(HllScaleExp))
          .otherwise(lit(HllScaleExp) - length(bin(col("w")))).cast("int").as("rho"))
      .groupBy(col("source"), col("bucket"))
      .agg(max(col("rho")).as("m_j"))

  /** `(source, buckets_hit, z_scaled, est_distinct)` from the register
    * relation — pure integer arithmetic: E = α_m·m²/Z with
    * Z = Σ_j 2^(−M_j) over all m registers; scaled by 2^S (S = window+1)
    * everything is integer — z_scaled = Σ_hit 2^(S−M_j) + V·2^S (V =
    * registers never hit) and E = (α_num·m²·2^S) DIV (α_den·z_scaled) in
    * DECIMAL(38,0) — exact, so the oracle hash-matches the estimate
    * itself, not a tolerance.
    */
  def hllEstimate(regs: DataFrame): DataFrame =
    regs.groupBy(col("source"))
      .agg(
        count(lit(1)).cast("long").as("buckets_hit"),
        expr(s"sum(shiftleft(CAST(1 AS BIGINT), $HllScaleExp - m_j))").as("z_hit"))
      .select(col("source"), col("buckets_hit"),
        (col("z_hit") +
          (lit(HllM.toLong) - col("buckets_hit")) * lit(1L << HllScaleExp))
          .as("z_scaled"))
      .withColumn("est_distinct",
        expr(s"CAST('$HllAlphaNum' AS DECIMAL(38,0)) DIV " +
          s"(CAST($HllAlphaDen AS DECIMAL(38,0)) * z_scaled)"))

  def qSketchHll(spark: SparkSession, dir: String): DataFrame = {
    val src = sourceShingles(spark, dir)
    val exact = src
      .groupBy(col("source")).agg(count(lit(1)).as("exact_distinct"))
    hllEstimate(hllRegisters(src)).join(exact, Seq("source"))
      .select(col("source"), col("buckets_hit"), col("z_scaled"),
        col("est_distinct"), col("exact_distinct"))
      .withColumn("err_bp", errBp("est_distinct", "exact_distinct"))
      .orderBy(col("source"))
  }

  /** The register relation via the NATIVE aggregate
    * [[graft.functions.HllRegsAgg]]: one `(source, 256-byte sketch)` row
    * per source crosses the exchange instead of `sources × m` bucket
    * groups, then the sketch is unpacked back to `(source, bucket, m_j)`
    * rows (a sources×m-sized posexplode — report-scale). Spec-pinned
    * register-identical to [[hllRegisters]].
    */
  def hllRegistersNative(src: DataFrame): DataFrame =
    src
      .select(col("source"), h60(col("s")).as("h"))
      .groupBy(col("source"))
      .agg(graft.functions.HllRegsAgg(col("h"), HllM, HllP, HllScaleExp).as("regs"))
      .select(col("source"), posexplode(col("regs")).as(Seq("bucket", "m_j")))
      .filter(col("m_j") > 0)
      .select(col("source"), col("bucket").cast("int").as("bucket"),
        col("m_j").cast("int").as("m_j"))

  /** [[qSketchHll]] served by the native sketch aggregate — same output,
    * same oracle (the SQL register formulation IS the semantics spec the
    * aggregate must reproduce), different physical shape: the shuffle
    * carries whole mergeable sketches, the canonical 100 TB build.
    */
  def qSketchHllNative(spark: SparkSession, dir: String): DataFrame = {
    val src = sourceShingles(spark, dir)
    val exact = src
      .groupBy(col("source")).agg(count(lit(1)).as("exact_distinct"))
    hllEstimate(hllRegistersNative(src)).join(exact, Seq("source"))
      .select(col("source"), col("buckets_hit"), col("z_scaled"),
        col("est_distinct"), col("exact_distinct"))
      .withColumn("err_bp", errBp("est_distinct", "exact_distinct"))
      .orderBy(col("source"))
  }

  val qSketchHllSql: String = {
    s"""WITH sh AS (${shinglePostingsSql}),
       |src AS (
       |  SELECT DISTINCT d.source, sh.s
       |  FROM sh JOIN documents d ON sh.doc_id = d.doc_id
       |), hashed AS (
       |  SELECT source,
       |    CAST(concat('0x', substring(md5(s), 1, 15)) AS BIGINT) % $HllM AS bucket,
       |    CAST(concat('0x', substring(md5(s), 1, 15)) AS BIGINT) >> $HllP AS w
       |  FROM src
       |), regs AS (
       |  SELECT source, bucket,
       |    max(CASE WHEN w = 0 THEN $HllScaleExp
       |             ELSE $HllScaleExp - length(bin(w)) END) AS m_j
       |  FROM hashed GROUP BY 1, 2
       |), z AS (
       |  SELECT source, count(*) AS buckets_hit,
       |    CAST(sum(CAST(1 AS BIGINT) << CAST($HllScaleExp - m_j AS INTEGER)) AS BIGINT)
       |      + ($HllM - count(*)) * (CAST(1 AS BIGINT) << $HllScaleExp) AS z_scaled
       |  FROM regs GROUP BY 1
       |), exact AS (
       |  SELECT source, count(*) AS exact_distinct FROM src GROUP BY 1
       |)
       |SELECT z.source, CAST(buckets_hit AS BIGINT) AS buckets_hit, z_scaled,
       |  CAST(CAST('$HllAlphaNum' AS HUGEINT)
       |    // (CAST($HllAlphaDen AS HUGEINT) * z_scaled) AS BIGINT) AS est_distinct,
       |  exact_distinct,
       |  CASE WHEN est_distinct >= exact_distinct
       |       THEN (est_distinct - exact_distinct) * 10000 // exact_distinct
       |       ELSE -((exact_distinct - est_distinct) * 10000 // exact_distinct)
       |  END AS err_bp
       |FROM z JOIN exact USING (source)
       |ORDER BY source""".stripMargin
  }

  /** KMV (bottom-k) distinct-shingle cardinality per source: keep the k
    * SMALLEST distinct 60-bit hashes; if the k-th is h_k, the hashes are
    * uniform on [0, 2^60), so E = (k−1)·2^60 / h_k.
    *
    * The k-minima ride the native [[graft.plans.TopKPerKey]] operator:
    * its partial stage prunes every partition to ≤ k rows per source
    * BEFORE the exchange — the bottom-k sketch's mergeability expressed
    * as a physical plan property (the only full-width shuffle left is the
    * distinct over hashes, which at 100 TB is pre-filtered by a sampled
    * h < t threshold before it ever reaches the exchange; documented, not
    * implemented — the test vocabularies fit).
    */
  def qSketchKmv(spark: SparkSession, dir: String): DataFrame = {
    val src = sourceShingles(spark, dir)
    val hashed = src
      .select(col("source"), h60(col("s")).as("h"))
      .distinct() // 60-bit collisions would double-count a minimum
    val kth = graft.plans.TopKPerKey.perKey(
        hashed, Seq(col("source")), Seq(col("h").asc), KmvK)
      .filter(col("rnk") === KmvK)
      .select(col("source"), col("h").as("kth_min"))
    val exact = src
      .groupBy(col("source")).agg(count(lit(1)).as("exact_distinct"))
    kth.join(exact, Seq("source"))
      .select(col("source"), col("kth_min"),
        expr(s"CAST('$KmvNum' AS DECIMAL(38,0)) DIV kth_min").as("est_distinct"),
        col("exact_distinct"))
      .withColumn("err_bp", errBp("est_distinct", "exact_distinct"))
      .orderBy(col("source"))
  }

  val qSketchKmvSql: String =
    s"""WITH sh AS (${shinglePostingsSql}),
       |src AS (
       |  SELECT DISTINCT d.source, sh.s
       |  FROM sh JOIN documents d ON sh.doc_id = d.doc_id
       |), hashed AS (
       |  SELECT DISTINCT source,
       |    CAST(concat('0x', substring(md5(s), 1, 15)) AS BIGINT) AS h
       |  FROM src
       |), ranked AS (
       |  SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rnk
       |  FROM hashed
       |), kth AS (
       |  SELECT source, h AS kth_min FROM ranked WHERE rnk = $KmvK
       |), exact AS (
       |  SELECT source, count(*) AS exact_distinct FROM src GROUP BY 1
       |)
       |SELECT source, kth_min,
       |  CAST(CAST('$KmvNum' AS HUGEINT) // kth_min AS BIGINT) AS est_distinct,
       |  exact_distinct,
       |  CASE WHEN est_distinct >= exact_distinct
       |       THEN (est_distinct - exact_distinct) * 10000 // exact_distinct
       |       ELSE -((exact_distinct - est_distinct) * 10000 // exact_distinct)
       |  END AS err_bp
       |FROM kth JOIN exact USING (source)
       |ORDER BY source""".stripMargin

  /** Count-min sketch over the shingle posting stream, probed for the
    * top-${CmsTopK} document-frequency heavy hitters.
    *
    * Counter build: each posting increments d=4 counters, one per row r at
    * index `md5(r || ':' || shingle) mod w` — as a DataFrame this is an
    * explode to (r, idx) and ONE map-side combinable sum into d·w = 8192
    * counters: fixed-size state, the entire point at 100 TB (the exact
    * df relation this query also builds for ground truth is the full
    * shingle-keyed shuffle the sketch replaces).
    *
    * Probe: est(s) = min_r counter[r, idx_r(s)] ≥ df(s) always (counters
    * only over-count — the spec-pinned CMS invariant); the top-k
    * candidates come from the exact relation so the reported error is the
    * sketch's, not the candidate set's.
    */
  /** KMV SET OPERATIONS: pairwise source-vocabulary Jaccard estimated
    * from the per-source bottom-k sketches alone — the theta-sketch move.
    * `bottom-k(A ∪ B)` is recoverable from the parts (union the two
    * minima sets, re-take the k smallest — KMV's mergeability), and any
    * `h ∈ bottom-k(A ∪ B)` that belongs to A necessarily sits in
    * `bottom-k(A)` (it is below the union's k-th minimum, which is ≤ A's),
    * so intersection membership among the union's bottom-k is decidable
    * from sketch contents only. `Ĵ = |{bottom-k(A∪B)} ∩ A ∩ B| / k` —
    * when the union has fewer than k distinct hashes the sketch IS the
    * set and the estimate is exact.
    *
    * Scale: after the one bottom-k pass (same plan as [[qSketchKmv]]),
    * ALL O(sources²) pairwise overlaps are computed from sources × k
    * control-plane rows — no second corpus scan, no shingle-keyed
    * pair join. The exact Jaccard column is the comparison scan the
    * sketch replaces (a full vocabulary self-join).
    */
  def qSketchOverlap(spark: SparkSession, dir: String): DataFrame = {
    val src = sourceShingles(spark, dir)
    val hashed = src.select(col("source"), h60(col("s")).as("h")).distinct()
    val kmin = graft.plans.TopKPerKey.perKey(
        hashed, Seq(col("source")), Seq(col("h").asc), KmvK)
      .select(col("source"), col("h"))
      .localCheckpoint() // sources × k rows — control-plane
    val srcs = kmin.select(col("source")).distinct()
    val pairs = srcs.toDF("src_a")
      .join(broadcast(srcs.toDF("src_b")), col("src_a") < col("src_b"))
    val ua = pairs.join(kmin.toDF("src_a", "h"), Seq("src_a"))
      .select(col("src_a"), col("src_b"), col("h"), lit(1L).as("in_a"), lit(0L).as("in_b"))
    val ub = pairs.join(kmin.toDF("src_b", "h"), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("h"), lit(0L).as("in_a"), lit(1L).as("in_b"))
    val est = ua.unionByName(ub)
      .groupBy(col("src_a"), col("src_b"), col("h"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("src_a"), col("src_b")).orderBy(col("h"))))
      .filter(col("rnk") <= KmvK)
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_used"),
        sum(col("in_a") * col("in_b")).as("matches"))
      .withColumn("est_jaccard_bp", expr("matches * 10000 DIV n_used"))
    val exact = {
      val common = src.toDF("src_a", "s")
        .join(src.toDF("src_b", "s"), Seq("s"))
        .filter(col("src_a") < col("src_b"))
        .groupBy(col("src_a"), col("src_b")).agg(count(lit(1)).as("common"))
      val sizes = src.groupBy(col("source")).agg(count(lit(1)).as("n"))
      common
        .join(sizes.toDF("src_a", "na"), Seq("src_a"))
        .join(sizes.toDF("src_b", "nb"), Seq("src_b"))
        .withColumn("exact_jaccard_bp",
          expr("common * 10000 DIV (na + nb - common)"))
        .select(col("src_a"), col("src_b"), col("exact_jaccard_bp"))
    }
    est.join(exact, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"), col("n_used"), col("matches"),
        col("est_jaccard_bp"),
        coalesce(col("exact_jaccard_bp"), lit(0L)).as("exact_jaccard_bp"))
      .withColumn("err_bp",
        expr("""CASE WHEN est_jaccard_bp >= exact_jaccard_bp
               |THEN est_jaccard_bp - exact_jaccard_bp
               |ELSE -(exact_jaccard_bp - est_jaccard_bp) END""".stripMargin))
      .orderBy(col("src_a"), col("src_b"))
  }

  val qSketchOverlapSql: String =
    s"""WITH sh AS (${shinglePostingsSql}),
       |src AS (
       |  SELECT DISTINCT d.source, sh.s
       |  FROM sh JOIN documents d ON sh.doc_id = d.doc_id
       |), hashed AS (
       |  SELECT DISTINCT source,
       |    CAST(concat('0x', substring(md5(s), 1, 15)) AS BIGINT) AS h
       |  FROM src
       |), kmin AS (
       |  SELECT source, h FROM (
       |    SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rnk
       |    FROM hashed) WHERE rnk <= $KmvK
       |), prs AS (
       |  SELECT a.source AS src_a, b.source AS src_b
       |  FROM (SELECT DISTINCT source FROM kmin) a
       |  JOIN (SELECT DISTINCT source FROM kmin) b ON a.source < b.source
       |), u AS (
       |  SELECT src_a, src_b, h, max(in_a) AS in_a, max(in_b) AS in_b FROM (
       |    SELECT p.src_a, p.src_b, m.h, 1 AS in_a, 0 AS in_b
       |    FROM prs p JOIN kmin m ON m.source = p.src_a
       |    UNION ALL
       |    SELECT p.src_a, p.src_b, m.h, 0 AS in_a, 1 AS in_b
       |    FROM prs p JOIN kmin m ON m.source = p.src_b
       |  ) GROUP BY 1, 2, 3
       |), est AS (
       |  SELECT src_a, src_b, count(*) AS n_used,
       |    CAST(sum(in_a * in_b) AS BIGINT) AS matches,
       |    CAST(sum(in_a * in_b) AS BIGINT) * 10000 // count(*) AS est_jaccard_bp
       |  FROM (
       |    SELECT *, row_number() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rnk
       |    FROM u) WHERE rnk <= $KmvK
       |  GROUP BY 1, 2
       |), com AS (
       |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS common
       |  FROM src a JOIN src b ON a.s = b.s AND a.source < b.source
       |  GROUP BY 1, 2
       |), sz AS (
       |  SELECT source, count(*) AS n FROM src GROUP BY 1
       |), exact AS (
       |  SELECT c.src_a, c.src_b,
       |    c.common * 10000 // (sa.n + sb.n - c.common) AS exact_jaccard_bp
       |  FROM com c JOIN sz sa ON sa.source = c.src_a
       |             JOIN sz sb ON sb.source = c.src_b
       |)
       |SELECT e.src_a, e.src_b, e.n_used, e.matches,
       |  e.est_jaccard_bp, coalesce(x.exact_jaccard_bp, 0) AS exact_jaccard_bp,
       |  CASE WHEN e.est_jaccard_bp >= coalesce(x.exact_jaccard_bp, 0)
       |       THEN e.est_jaccard_bp - coalesce(x.exact_jaccard_bp, 0)
       |       ELSE -(coalesce(x.exact_jaccard_bp, 0) - e.est_jaccard_bp) END AS err_bp
       |FROM est e LEFT JOIN exact x ON x.src_a = e.src_a AND x.src_b = e.src_b
       |ORDER BY e.src_a, e.src_b""".stripMargin

  /** Histogram-quantile sketch: equi-width bin size (chars) and the
    * percentiles reported.
    */
  val HistW = 16L
  val HistPs: Seq[Int] = Seq(50, 90, 99)

  /** `(source, bin, cnt)` equi-width histogram of document lengths — the
    * mergeable state (cellwise SUM, like the CMS counters). At 100 TB the
    * shuffle carries `sources × bins` partial cells, not document rows.
    */
  def lengthHistogram(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), expr(s"n_chars DIV $HistW").as("bin"))
      .groupBy(col("source"), col("bin")).agg(count(lit(1)).as("cnt"))

  /** Approximate per-source length percentiles from the equi-width
    * histogram, compared against the exact order statistics.
    *
    * Estimator (all integer, engine-exact): for percentile p over n docs
    * the target rank is `r = (n·p + 99) DIV 100` (1-based ceil); the
    * carrying bin b* is the first whose running count reaches r, and
    * `est = b*·W + ((r − cum_before)·W) DIV (cnt(b*) + 1)` interpolates
    * inside the bin (strictly within [b*·W, (b*+1)·W), so the estimate
    * errs by less than one bin width — spec-pinned). The exact column is
    * the true rank-r order statistic, the full sort the sketch replaces:
    * the histogram build is one map-side combinable pass and the
    * percentile extraction touches `sources × bins` rows, while the exact
    * side must shuffle every document length into a per-source order.
    */
  def qSketchQuantile(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents").select(col("source"), col("n_chars"))
    val hist = lengthHistogram(docs)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("bin"))
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("source"))))
    val ps = spark.createDataFrame(HistPs.map(Tuple1(_))).toDF("p")
    val targets = cum.crossJoin(broadcast(ps))
      .withColumn("r", expr("(n * p + 99) DIV 100"))
      .filter(col("cum") >= col("r"))
      .withColumn("pick", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("source"), col("p")).orderBy(col("bin"))))
      .filter(col("pick") === 1)
      .select(col("source"), col("p"), col("r"),
        expr(s"bin * $HistW + ((r - (cum - cnt)) * $HistW) DIV (cnt + 1)").as("est_chars"))
    val exact = docs
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("n_chars"))))
      .crossJoin(broadcast(ps))
      .withColumn("n", max(col("rk")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("source"), col("p"))))
      .filter(col("rk") === expr("(n * p + 99) DIV 100"))
      .select(col("source"), col("p"), col("n_chars").as("exact_chars"))
    targets.join(exact, Seq("source", "p"))
      .select(col("source"), col("p").cast("int").as("p"), col("r"),
        col("est_chars"), col("exact_chars"))
      .withColumn("err_bp", errBp("est_chars", "exact_chars"))
      .orderBy(col("source"), col("p"))
  }

  val qSketchQuantileSql: String =
    s"""WITH ps AS (SELECT unnest([${HistPs.mkString(", ")}]) AS p),
       |hist AS (
       |  SELECT source, n_chars // $HistW AS bin, count(*) AS cnt
       |  FROM documents GROUP BY 1, 2
       |), cum AS (
       |  SELECT source, bin, cnt,
       |    sum(cnt) OVER (PARTITION BY source ORDER BY bin) AS cum,
       |    sum(cnt) OVER (PARTITION BY source) AS n
       |  FROM hist
       |), tgt AS (
       |  SELECT source, p, r, CAST(est_chars AS BIGINT) AS est_chars FROM (
       |    SELECT c.source, ps.p, (c.n * ps.p + 99) // 100 AS r,
       |      c.bin * $HistW + ((((c.n * ps.p + 99) // 100) - (c.cum - c.cnt)) * $HistW)
       |        // (c.cnt + 1) AS est_chars,
       |      row_number() OVER (PARTITION BY c.source, ps.p ORDER BY c.bin) AS pick
       |    FROM cum c CROSS JOIN ps
       |    WHERE c.cum >= (c.n * ps.p + 99) // 100
       |  ) WHERE pick = 1
       |), ranked AS (
       |  SELECT source, n_chars,
       |    row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rk,
       |    count(*) OVER (PARTITION BY source) AS n
       |  FROM documents
       |), exact AS (
       |  SELECT r.source, ps.p, r.n_chars AS exact_chars
       |  FROM ranked r CROSS JOIN ps
       |  WHERE r.rk = (r.n * ps.p + 99) // 100
       |)
       |SELECT t.source, CAST(t.p AS INTEGER) AS p, CAST(t.r AS BIGINT) AS r,
       |  t.est_chars, x.exact_chars,
       |  CASE WHEN t.est_chars >= x.exact_chars
       |       THEN (t.est_chars - x.exact_chars) * 10000 // x.exact_chars
       |       ELSE -((x.exact_chars - t.est_chars) * 10000 // x.exact_chars) END AS err_bp
       |FROM tgt t JOIN exact x ON x.source = t.source AND x.p = t.p
       |ORDER BY t.source, t.p""".stripMargin

  /** The CMS index of item `s` in row `r`. */
  private def cmsIdx(r: Column, s: Column): Column =
    pmod(h60(concat(r.cast("string"), lit(":"), s)), lit(CmsWidth)).cast("int")

  /** `(r, idx, c)` CMS counters from a weighted item relation `(s, df)` —
    * one map-side combinable sum into d·w cells. Mergeable: counters of a
    * union of streams are the cellwise SUM of the parts' counters
    * (spec-pinned).
    */
  def cmsCounters(weighted: DataFrame): DataFrame = {
    val rows = weighted.sparkSession.range(CmsRows).select(col("id").cast("int").as("r"))
    weighted.crossJoin(broadcast(rows))
      .select(col("r"), cmsIdx(col("r"), col("s")).as("idx"), col("df"))
      .groupBy(col("r"), col("idx")).agg(sum(col("df")).as("c"))
  }

  def qSketchCms(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val postings = TextDedup.shingles(docs, col("doc_id"), col("text"), Dedup.ShingleK)
    val df = TextDedup.materializeAndRelease(
      postings.groupBy(col("s")).agg(count(lit(1)).as("df")), postings)
    val rows = spark.range(CmsRows).select(col("id").cast("int").as("r"))
    val counters = cmsCounters(df)
    val top = df.orderBy(col("df").desc, col("s")).limit(CmsTopK)
    val probes = top.crossJoin(broadcast(rows))
      .select(col("s"), col("df"), col("r"), cmsIdx(col("r"), col("s")).as("idx"))
    probes
      .join(counters, Seq("r", "idx"))
      .groupBy(col("s"), col("df"))
      .agg(min(col("c")).as("est_df"))
      .select(col("s"), col("df").as("true_df"), col("est_df"),
        expr("(est_df - df) * 10000 DIV df").as("over_bp"))
      .orderBy(col("true_df").desc, col("s"))
  }

  val qSketchCmsSql: String =
    s"""WITH sh AS (${shinglePostingsSql}),
       |df AS (
       |  SELECT s, count(*) AS df FROM sh GROUP BY 1
       |), rows_r AS (SELECT unnest(range($CmsRows)) AS r),
       |counters AS (
       |  SELECT r,
       |    CAST(concat('0x', substring(md5(concat(CAST(r AS VARCHAR), ':', s)), 1, 15))
       |      AS BIGINT) % $CmsWidth AS idx,
       |    CAST(sum(df) AS BIGINT) AS c
       |  FROM df CROSS JOIN rows_r GROUP BY 1, 2
       |), top AS (
       |  SELECT s, df FROM df ORDER BY df DESC, s LIMIT $CmsTopK
       |), probes AS (
       |  SELECT s, df, r,
       |    CAST(concat('0x', substring(md5(concat(CAST(r AS VARCHAR), ':', s)), 1, 15))
       |      AS BIGINT) % $CmsWidth AS idx
       |  FROM top CROSS JOIN rows_r
       |)
       |SELECT p.s, p.df AS true_df, min(c.c) AS est_df,
       |  (min(c.c) - p.df) * 10000 // p.df AS over_bp
       |FROM probes p JOIN counters c ON p.r = c.r AND p.idx = c.idx
       |GROUP BY p.s, p.df
       |ORDER BY true_df DESC, s""".stripMargin

  /** AMS second-moment (self-join size) estimate: F2 = Σ_s df(s)² is
    * EXACTLY the posting self-join cost that the dedup planner's bounds
    * are built on (the Σ df² of [[TextDedup.jaccardPairs]]' scaladoc and
    * the capped-commons strategy decision) — this query estimates it from
    * a d×w SIGNED counter grid alone (Alon–Matias–Szegedy): each key
    * carries a ±1 hash sign (bit ${CmsWidth.toString.length} of the same
    * 60-bit hash that picks its cell, independent of the low index bits),
    * cells accumulate `Σ ±df`, and each row's Σ c² is an UNBIASED F2
    * estimate (colliding keys' cross terms carry random signs and cancel
    * in expectation — the plain unsigned CM grid instead inflates by
    * F1²/w, measured 7× on this corpus). The reported estimate is the
    * deterministic LOWER MEDIAN across the d rows; σ ≈ √(2/w)·F2 ≈ 3 %
    * per row at w=2048. A planner at 100 TB reads the answer off a
    * maintained signed grid (same sum-merge law as
    * [[graft.streaming.SketchStream.cmsCounterBatches]]) without ever
    * running the Σ df² scan it is deciding about.
    *
    * Magnitude envelope: |c| ≤ N postings, so Σ c² ≤ N² per row — at the
    * 10× probe N ≈ 2.6M ⇒ < 2^46, ANSI-safe in a long (lift to DECIMAL
    * beyond N ≈ 3·10⁹ per grid).
    */
  /** `(r, idx, c)` SIGNED AMS counter grid over a weighted key relation
    * `(k, w)` — the [[cmsCounters]] geometry with a ±1 sign drawn from the
    * bit just above the index bits of the same 60-bit hash. Grids built
    * from DIFFERENT relations with this one hash family support unbiased
    * INNER PRODUCTS: E[Σ_idx cA·cB] = Σ_k fA(k)·fB(k) (cross terms carry
    * independent random signs and cancel in expectation) — the equi-join
    * cardinality for (A, B) and the second moment F2 for (A, A). Same
    * cellwise sum-merge law as the unsigned grid.
    */
  def amsGrid(weighted: DataFrame): DataFrame = {
    val rows = weighted.sparkSession.range(CmsRows).select(col("id").cast("int").as("r"))
    weighted.crossJoin(broadcast(rows))
      .select(col("r"),
        expr(s"CAST(conv(substring(md5(concat(CAST(r AS STRING), ':', k)), 1, 15), 16, 10) AS BIGINT)")
          .as("h"), col("w"))
      .select(col("r"), pmod(col("h"), lit(CmsWidth)).cast("int").as("idx"),
        (col("w") * (lit(1L) - lit(2L) * shiftrightunsigned(col("h"), CmsIdxBits)
          .bitwiseAND(lit(1L)))).as("sw"))
      .groupBy(col("r"), col("idx")).agg(sum(col("sw")).as("c"))
  }

  /** The deterministic lower-median row aggregate of an AMS grid product:
    * per-row sum of `prodCol`, ranked, row `(d+1) DIV 2` selected.
    */
  private def amsLowerMedian(perRow: DataFrame, out: String): DataFrame =
    perRow
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("row_est"), col("r"))))
      .filter(col("rnk") === (CmsRows + 1) / 2) // lower median
      .select(col("row_est").as(out))

  def qSketchF2(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val postings = TextDedup.shingles(docs, col("doc_id"), col("text"), Dedup.ShingleK)
    val df = TextDedup.materializeAndRelease(
      postings.groupBy(col("s")).agg(count(lit(1)).as("df")), postings)
    val signed = amsGrid(df.select(col("s").as("k"), col("df").as("w")))
    val est = amsLowerMedian(
      signed.groupBy(col("r")).agg(sum(col("c") * col("c")).as("row_est")), "est_f2")
    val exact = df.agg(sum(col("df") * col("df")).as("exact_f2"))
    est.crossJoin(exact) // two 1-row relations — scalar attach
      .withColumn("err_bp", errBp("est_f2", "exact_f2"))
  }

  val qSketchF2Sql: String =
    s"""WITH sh AS (${shinglePostingsSql}),
       |df AS (
       |  SELECT s, count(*) AS df FROM sh GROUP BY 1
       |), rows_r AS (SELECT unnest(range($CmsRows)) AS r),
       |signed AS (
       |  SELECT r, h % $CmsWidth AS idx,
       |    CAST(sum(df * (1 - 2 * ((h >> $CmsIdxBits) & 1))) AS BIGINT) AS c
       |  FROM (
       |    SELECT r, df,
       |      CAST(concat('0x', substring(md5(concat(CAST(r AS VARCHAR), ':', s)), 1, 15))
       |        AS BIGINT) AS h
       |    FROM df CROSS JOIN rows_r)
       |  GROUP BY 1, 2
       |), est AS (
       |  SELECT CAST(row_f2 AS BIGINT) AS est_f2 FROM (
       |    SELECT row_f2, row_number() OVER (ORDER BY row_f2, r) AS rnk FROM (
       |      SELECT r, sum(c * c) AS row_f2 FROM signed GROUP BY 1))
       |  WHERE rnk = ${(CmsRows + 1) / 2}
       |), exact AS (
       |  SELECT CAST(sum(df * df) AS BIGINT) AS exact_f2 FROM df
       |)
       |SELECT est_f2, exact_f2,
       |  CASE WHEN est_f2 >= exact_f2 THEN (est_f2 - exact_f2) * 10000 // exact_f2
       |       ELSE -((exact_f2 - est_f2) * 10000 // exact_f2) END AS err_bp
       |FROM est CROSS JOIN exact""".stripMargin

  /** AMS equi-join CARDINALITY estimate — the query-optimizer primitive:
    * |events ⋈ orders ON user_id = o_custkey| estimated as the lower
    * median over rows of the INNER PRODUCT of the two relations' signed
    * grids (E[Σ_idx cA·cB] = Σ_k fA(k)·fB(k), the exact join size; per-row
    * σ² ≈ F2(A)·F2(B)/w). A cost-based planner consults exactly this
    * statistic to choose join order and strategy WITHOUT scanning the
    * join; at 100 TB both grids are maintained incrementally (the
    * [[graft.streaming.SketchStream]] sum-merge law applies unchanged to
    * signed cells) and the estimate is a d·w-row join of two tiny grids.
    * The exact column is the actual join count — the scan being priced.
    */
  def qSketchJoinsize(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
      .groupBy(col("user_id").cast("string").as("k")).agg(count(lit(1)).as("w"))
    val ord = table(spark, dir, "orders")
      .groupBy(col("o_custkey").cast("string").as("k")).agg(count(lit(1)).as("w"))
    val prod = amsGrid(ev).toDF("r", "idx", "ca")
      .join(amsGrid(ord).toDF("r", "idx", "cb"), Seq("r", "idx"))
      .groupBy(col("r")).agg(sum(col("ca") * col("cb")).as("row_est"))
    val est = amsLowerMedian(prod, "est_rows")
    val exact = table(spark, dir, "events").select(col("user_id"))
      .join(table(spark, dir, "orders").select(col("o_custkey")),
        col("user_id") === col("o_custkey"))
      .agg(count(lit(1)).as("exact_rows"))
    est.crossJoin(exact) // two 1-row relations — scalar attach
      .withColumn("err_bp", errBp("est_rows", "exact_rows"))
  }

  val qSketchJoinsizeSql: String =
    s"""WITH rows_r AS (SELECT unnest(range($CmsRows)) AS r),
       |ev AS (
       |  SELECT CAST(user_id AS VARCHAR) AS k, count(*) AS w FROM events GROUP BY 1
       |), ord AS (
       |  SELECT CAST(o_custkey AS VARCHAR) AS k, count(*) AS w FROM orders GROUP BY 1
       |), ga AS (
       |  SELECT r, h % $CmsWidth AS idx,
       |    CAST(sum(w * (1 - 2 * ((h >> $CmsIdxBits) & 1))) AS BIGINT) AS c
       |  FROM (SELECT r, w,
       |      CAST(concat('0x', substring(md5(concat(CAST(r AS VARCHAR), ':', k)), 1, 15))
       |        AS BIGINT) AS h
       |    FROM ev CROSS JOIN rows_r) GROUP BY 1, 2
       |), gb AS (
       |  SELECT r, h % $CmsWidth AS idx,
       |    CAST(sum(w * (1 - 2 * ((h >> $CmsIdxBits) & 1))) AS BIGINT) AS c
       |  FROM (SELECT r, w,
       |      CAST(concat('0x', substring(md5(concat(CAST(r AS VARCHAR), ':', k)), 1, 15))
       |        AS BIGINT) AS h
       |    FROM ord CROSS JOIN rows_r) GROUP BY 1, 2
       |), est AS (
       |  SELECT CAST(row_est AS BIGINT) AS est_rows FROM (
       |    SELECT row_est, row_number() OVER (ORDER BY row_est, r) AS rnk FROM (
       |      SELECT ga.r AS r, sum(ga.c * gb.c) AS row_est
       |      FROM ga JOIN gb ON ga.r = gb.r AND ga.idx = gb.idx GROUP BY 1))
       |  WHERE rnk = ${(CmsRows + 1) / 2}
       |), exact AS (
       |  SELECT count(*) AS exact_rows
       |  FROM events e JOIN orders o ON e.user_id = o.o_custkey
       |)
       |SELECT est_rows, exact_rows,
       |  CASE WHEN est_rows >= exact_rows THEN (est_rows - exact_rows) * 10000 // exact_rows
       |       ELSE -((exact_rows - est_rows) * 10000 // exact_rows) END AS err_bp
       |FROM est CROSS JOIN exact""".stripMargin

  /** The per-doc distinct 3-shingle postings `(doc_id, s)` — the DuckDB
    * mirror of [[TextDedup.shingles]] (the [[Dedup.qShingleDfProfileSql]]
    * idiom).
    */
  private def shinglePostingsSql: String =
    s"""SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(len(t) - ${Dedup.ShingleK - 1}),
       |    i -> array_to_string(t[i+1:i+${Dedup.ShingleK}], ' ')))) AS s
       |  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t
       |        FROM documents) tok
       |  WHERE len(t) >= ${Dedup.ShingleK}""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sketch_hll" -> (qSketchHll _),
    "q_sketch_hll_native" -> (qSketchHllNative _),
    "q_sketch_kmv" -> (qSketchKmv _),
    "q_sketch_cms" -> (qSketchCms _),
    "q_sketch_overlap" -> (qSketchOverlap _),
    "q_sketch_quantile" -> (qSketchQuantile _),
    "q_sketch_f2" -> (qSketchF2 _),
    "q_sketch_joinsize" -> (qSketchJoinsize _),
  )

  def oracle: Map[String, String] = Map(
    "q_sketch_hll" -> qSketchHllSql,
    "q_sketch_hll_native" -> qSketchHllSql,
    "q_sketch_kmv" -> qSketchKmvSql,
    "q_sketch_cms" -> qSketchCmsSql,
    "q_sketch_overlap" -> qSketchOverlapSql,
    "q_sketch_quantile" -> qSketchQuantileSql,
    "q_sketch_f2" -> qSketchF2Sql,
    "q_sketch_joinsize" -> qSketchJoinsizeSql,
  )
}
