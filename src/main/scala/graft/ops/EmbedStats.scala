package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Cluster-level embedding statistics: per-label centroids, centroid-pair
  * similarity, and within-cluster outliers — the corpus-curation views a
  * training pipeline derives from its embedding table (label here stands
  * for any grouping: source, topic cluster, dedup component).
  *
  * Determinism discipline (same as [[VectorSearch]]): float components
  * quantize once to exact longs `x_d = floor(v_d · 2^quantBits)`, and every
  * aggregate over them (per-dimension sums, dot products, squared
  * distances) is exact integer arithmetic — bit-identical at any
  * parallelism, replayable by the DuckDB oracle. The only float steps are
  * the final presentation divisions/sqrts, computed from identical integers
  * in both engines.
  *
  * Magnitude envelope (quantBits=14, dim=64): |x| < 2^14; a cluster of n
  * members has |S_d| < n·2^14, so the outlier statistic
  * `Σ_d (n·x_d − S_d)²` is < n²·2^30·64 = n²·2^36 — ANSI-safe in a long
  * for clusters up to n ≈ 2^13 (~8k) members; at larger cluster sizes drop
  * quantBits or lift the sums to DECIMAL(38,0).
  */
object EmbedStats {

  val QuantBits = 14
  private val scale = (1L << QuantBits).toDouble

  /** Exact-integer envelope ceilings (derivations in the scaladocs of
    * [[qEmbedOutliers]] / [[qEmbedPc1]]). Non-ANSI Spark would WRAP
    * silently past them — wrong answers, not errors — so the operators
    * guard the driving count with a raise_error branch: one codegen
    * conditional on a relation that is computed anyway, no extra pass.
    */
  val OutlierMaxMembers: Long = 1L << 13
  val PcMaxVectors: Long = 1L << 16

  /** Label-size ceiling for [[qEmbedCentroids]] (round-11 envelope audit,
    * SCALE.md): a centroid-sum component is ≤ M·2^[[QuantBits]], so the
    * norm accumulation Σ_d s² is ≤ M²·2^(2·QuantBits)·dim = M²·2^34 —
    * past 2^63 once M > ~2^14.5 members. This is the suite's CLOSEST
    * envelope (only ~8× headroom over the sf1 corpus, and reachable at
    * the next 10×), hence an active guard rather than a scaladoc note;
    * the dot side is covered by the same ceiling via Cauchy-Schwarz
    * (|Σ sa·sb| ≤ √(na2·nb2)). Fix past the ceiling: lift s to
    * DECIMAL(38,0) or drop QuantBits.
    */
  val CentroidMaxMembers: Long = 1L << 14

  private[ops] def envelopeGuard(n: org.apache.spark.sql.Column, ceiling: Long,
      what: String, fix: String)(value: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(n > lit(ceiling),
      raise_error(concat(lit(s"$what "), n.cast("string"),
        lit(s" exceeds the exact-integer envelope $ceiling; $fix"))))
      .otherwise(value)

  /** `(vec_id, label, d, x)` — embeddings flattened to quantized
    * per-dimension longs (d is 0-based).
    */
  private def quantized(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        posexplode(transform(col("embedding"),
          x => floor(x.cast("double") * lit(scale)).cast("long"))).as(Seq("d", "x")))

  /** Per-(label, dimension) component sums and member counts — the exact
    * integer sufficient statistic for every centroid-level view below.
    * Dimension-sized (|labels|·dim rows), so everything downstream of the
    * one corpus-sized aggregation is broadcast-scale.
    */
  private def labelSums(spark: SparkSession, dir: String): DataFrame =
    quantized(spark, dir)
      .groupBy(col("label"), col("d"))
      .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))

  /** Pairwise cosine similarity between label centroids — "which clusters
    * (sources, topics) overlap in embedding space". Cosine is
    * scale-invariant, so the centroid cosine equals the cosine of the raw
    * per-dimension SUMS: no division by n ever happens and the dot/norm
    * accumulations stay exact longs.
    *
    * Scale: one corpus scan collapses to the |labels|·dim sums relation;
    * the pair join and final aggregation are dimension-sized (never touch
    * corpus rows again).
    */
  def qEmbedCentroids(spark: SparkSession, dir: String): DataFrame = {
    val sums = labelSums(spark, dir)
    val norms = sums.groupBy(col("label"))
      .agg(sum(envelopeGuard(col("n"), CentroidMaxMembers,
        "embed centroids: label size", "lift s to DECIMAL(38,0) or drop quantBits")(
        col("s") * col("s"))).as("n2"), max(col("n")).as("n_members"))
    val pairs = sums.select(col("label").as("label_a"), col("d"), col("s").as("sa"))
      .join(sums.select(col("label").as("label_b"), col("d"), col("s").as("sb")), Seq("d"))
      .filter(col("label_a") < col("label_b"))
      .groupBy(col("label_a"), col("label_b"))
      .agg(sum(col("sa") * col("sb")).as("dot"))
    pairs
      .join(norms.select(col("label").as("label_a"), col("n2").as("na2")), Seq("label_a"))
      .join(norms.select(col("label").as("label_b"), col("n2").as("nb2")), Seq("label_b"))
      .select(col("label_a"), col("label_b"),
        round(col("dot").cast("double") /
          (sqrt(col("na2").cast("double")) * sqrt(col("nb2").cast("double"))), 6)
          .as("cos_sim"))
      .orderBy(col("label_a"), col("label_b"))
  }

  val qEmbedCentroidsSql: String =
    s"""WITH xq AS (
       |  SELECT vec_id, label,
       |    generate_subscripts(embedding, 1) AS d,
       |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * ${1L << QuantBits}) AS BIGINT) AS x
       |  FROM embeddings
       |), sums AS (
       |  SELECT label, d, CAST(sum(x) AS BIGINT) AS s FROM xq GROUP BY 1, 2
       |), norms AS (
       |  SELECT label, CAST(sum(s * s) AS BIGINT) AS n2 FROM sums GROUP BY 1
       |), pairs AS (
       |  SELECT a.label AS label_a, b.label AS label_b,
       |    CAST(sum(a.s * b.s) AS BIGINT) AS dot
       |  FROM sums a JOIN sums b ON a.d = b.d AND a.label < b.label
       |  GROUP BY 1, 2
       |)
       |SELECT p.label_a, p.label_b,
       |  round(CAST(p.dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))), 6) AS cos_sim
       |FROM pairs p
       |JOIN norms na ON na.label = p.label_a
       |JOIN norms nb ON nb.label = p.label_b
       |ORDER BY p.label_a, p.label_b""".stripMargin

  /** Top-3 outliers per label by squared distance to the label centroid —
    * the mislabeled/contaminated-cluster diagnostic. The statistic is the
    * n²-scaled exact integer `Σ_d (n·x_d − S_d)²` (= n²·‖x − S/n‖² with
    * the division cleared), so ranking needs no floats; ties break to the
    * smaller vec_id.
    *
    * Scale: quantized rows join the broadcast dimension-sized sums
    * relation on (label, d) — the corpus side never shuffles on a wide
    * key — then one per-vector aggregation and a bounded per-label top-3.
    */
  def qEmbedOutliers(spark: SparkSession, dir: String): DataFrame = {
    val sums = labelSums(spark, dir)
    val dev = quantized(spark, dir)
      .join(broadcast(sums), Seq("label", "d"))
      .groupBy(col("label"), col("vec_id"))
      .agg(sum(envelopeGuard(col("n"), OutlierMaxMembers,
        "embed outliers: cluster size", "drop quantBits or lift the sums to DECIMAL(38,0)")(
        (col("n") * col("x") - col("s")) * (col("n") * col("x") - col("s"))))
        .as("dist2"))
    val w = Window.partitionBy(col("label")).orderBy(col("dist2").desc, col("vec_id"))
    dev.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("label"), col("rnk").cast("long").as("rnk"), col("vec_id"), col("dist2"))
      .orderBy(col("label"), col("rnk"))
  }

  val qEmbedOutliersSql: String =
    s"""WITH xq AS (
       |  SELECT vec_id, label,
       |    generate_subscripts(embedding, 1) AS d,
       |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * ${1L << QuantBits}) AS BIGINT) AS x
       |  FROM embeddings
       |), sums AS (
       |  SELECT label, d, CAST(sum(x) AS BIGINT) AS s, count(*) AS n
       |  FROM xq GROUP BY 1, 2
       |), dev AS (
       |  SELECT q.label, q.vec_id,
       |    CAST(sum((m.n * q.x - m.s) * (m.n * q.x - m.s)) AS BIGINT) AS dist2
       |  FROM xq q JOIN sums m ON m.label = q.label AND m.d = q.d
       |  GROUP BY 1, 2
       |), ranked AS (
       |  SELECT dev.*,
       |    row_number() OVER (PARTITION BY label ORDER BY dist2 DESC, vec_id) AS rnk
       |  FROM dev
       |)
       |SELECT label, CAST(rnk AS BIGINT) AS rnk, vec_id, dist2
       |FROM ranked WHERE rnk <= 3
       |ORDER BY label, rnk""".stripMargin

  /** Quantization for the PC1 covariance path (coarser than the centroid
    * path: the covariance entries carry an extra n· factor, see envelope
    * on [[qEmbedPc1]]).
    */
  val PcQuantBits = 8
  val PcIters = 4

  /** Top-10 most-extreme vectors along the corpus's first principal
    * component — the "dominant variance direction" diagnostic (what single
    * axis explains this embedding table, and which documents sit at its
    * poles). Three stages:
    *
    *  1. DISTRIBUTED: the n²-scaled covariance `M = n·G − S·Sᵀ` from one
    *     corpus pass — the Gram matrix G via a map-side outer-product
    *     expansion (two chained posexplodes, ×dim² row amplification but
    *     map-side-combined before the dim²-sized shuffle; no self-join).
    *  2. CONTROL-PLANE: `M` is dim² longs (64×64 — bounded by schema, the
    *     same contract as the Lloyd centroid collects in [[VectorSearch]]),
    *     so the 4-round power iteration runs on the driver in exact integer
    *     arithmetic: `w = M·v`, then renormalize `v' = w DIV ((max|w| +
    *     1023) DIV 1024)` — divide-only normalization, no overflow; all
    *     three engines' (JVM, Spark, DuckDB) integer division truncates
    *     toward zero, so the oracle replays bit-for-bit.
    *  3. DISTRIBUTED: every vector scores `Σ_d x_d·v_d` against the
    *     literal component vector (map-side, exact longs), top-10 via
    *     TakeOrderedAndProject.
    *
    * Magnitude envelope: |x| < 2^8, so G ≤ n·2^16, M ≤ n²·2^17, and
    * `w = M·v ≤ dim·M·2^10` — safe in longs for n ≈ 2^16 vectors at
    * dim 64; beyond that subsample the covariance pass (the standard
    * move — covariance needs only a sketch of the corpus) or lift M to
    * DECIMAL(38,0).
    */
  def qEmbedPc1(spark: SparkSession, dir: String): DataFrame = {
    val pscale = (1L << PcQuantBits).toDouble
    val emb = table(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        transform(col("embedding"),
          x => floor(x.cast("double") * lit(pscale)).cast("long")).as("a"))
    val base = emb.select(col("vec_id"), posexplode(col("a")).as(Seq("d", "x")))
    val sums = base.groupBy(col("d")).agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
    val gram = emb.select(col("a"), posexplode(col("a")).as(Seq("d", "xd")))
      .select(col("d"), col("xd"), posexplode(col("a")).as(Seq("e", "xe")))
      .groupBy(col("d"), col("e")).agg(sum(col("xd") * col("xe")).as("g"))
    val cov = gram
      .join(sums.select(col("d"), col("s").as("sd"), col("n")), Seq("d"))
      .join(sums.select(col("d").as("e"), col("s").as("se")), Seq("e"))
      .select(col("d"), col("e"),
        envelopeGuard(col("n"), PcMaxVectors,
          "embed pc1: corpus size", "subsample the covariance pass or lift M to DECIMAL(38,0)")(
          col("n") * col("g") - col("sd") * col("se")).as("m"))
    val entries = cov.collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val dim = entries.keys.map(_._1).max + 1
    var v = Array.fill(dim)(1024L)
    for (_ <- 1 to PcIters) {
      val w = Array.tabulate(dim)(d => (0 until dim).map(e => entries((d, e)) * v(e)).sum)
      val div = ((w.map(math.abs).max max 1L) + 1023L) / 1024L
      v = w.map(_ / div)
    }
    val vLit = typedLit(v.toSeq)
    emb.select(col("vec_id"), col("label"),
        aggregate(zip_with(col("a"), vLit, (x, vv) => x * vv),
          lit(0L), (acc, t) => acc + t).as("pc1_score"))
      .orderBy(col("pc1_score").desc, col("vec_id"))
      .limit(10)
  }

  val qEmbedPc1Sql: String = {
    def iter(i: Int): String =
      s"""w$i AS (
         |  SELECT m.d, CAST(sum(m.m * v.v) AS BIGINT) AS w
         |  FROM m JOIN v${i - 1} v ON v.d = m.e GROUP BY 1
         |), mx$i AS (
         |  SELECT greatest((CAST(max(abs(w)) AS BIGINT) + 1023) // 1024, 1) AS dv FROM w$i
         |), v$i AS (
         |  SELECT d, CAST(w // dv AS BIGINT) AS v FROM w$i CROSS JOIN mx$i
         |)""".stripMargin
    s"""WITH xq AS (
       |  SELECT vec_id, label, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * ${1L << PcQuantBits}) AS BIGINT)) AS a
       |  FROM embeddings
       |), base AS (
       |  SELECT vec_id, generate_subscripts(a, 1) - 1 AS d, unnest(a) AS x FROM xq
       |), sums AS (
       |  SELECT d, CAST(sum(x) AS BIGINT) AS s, count(*) AS n FROM base GROUP BY 1
       |), g AS (
       |  SELECT p.d, q.e, CAST(sum(p.x * q.x) AS BIGINT) AS g
       |  FROM base p JOIN (SELECT vec_id, d AS e, x FROM base) q USING (vec_id)
       |  GROUP BY 1, 2
       |), m AS (
       |  SELECT g.d, g.e, sd.n * g.g - sd.s * se.s AS m
       |  FROM g JOIN sums sd ON sd.d = g.d JOIN sums se ON se.d = g.e
       |), v0 AS (
       |  SELECT d, CAST(1024 AS BIGINT) AS v FROM sums
       |), ${(1 to PcIters).map(iter).mkString(", ")}
       |SELECT b.vec_id, e.label, CAST(sum(b.x * v.v) AS BIGINT) AS pc1_score
       |FROM base b JOIN v$PcIters v USING (d) JOIN embeddings e USING (vec_id)
       |GROUP BY 1, 2
       |ORDER BY pc1_score DESC, vec_id LIMIT 10""".stripMargin
  }

  /** CLUSTER-QUALITY INDEX (Davies-Bouldin, squared-scatter variant): for
    * every label cluster, the worst ratio of combined within-cluster
    * scatter to centroid separation over all partners —
    * `R_ij = (S_i² + S_j²) / d²(c_i, c_j)` — the "are these clusters
    * actually separated?" verdict a pipeline runs before trusting labels
    * (or k-means output) for stratified sampling or semantic dedup. The
    * squared formulation keeps everything an exact RATIO OF INTEGERS:
    * with A_i = n_i·q_i − Σ_d s_i² (n· the squared scatter numerator) and
    * D_ij = Σ_d (s_i·n_j − s_j·n_i)², the ratio collapses to
    * `(A_i·n_j² + A_j·n_i²) / D_ij` — one double division + round(6) at
    * the very end, so the result hash-gates (a mean-|distance| flavor
    * would need a per-member sqrt and a float sum across the group:
    * order-dependent, unhashable).
    *
    * Cross terms reach (s·n)² ≈ 10^21 > 2^63, so the accumulations run in
    * DECIMAL(38,0) (DuckDB HUGEINT) — the envelope-audit escape hatch
    * applied, not just documented.
    *
    * Scale: one corpus scan → (labels·dim) sums + labels-sized q; the
    * pair join is labels²·dim rows — dimension-sized. Never touches
    * corpus rows twice.
    */
  def qClusterQuality(spark: SparkSession, dir: String): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    // ONE corpus pass: the per-(label, d) sums carry Σx² alongside Σx, so
    // scatter and separation both derive from this labels·dim relation
    val sums = quantized(spark, dir).groupBy(col("label"), col("d"))
      .agg(sum(col("x")).as("s"), sum((col("x") * col("x")).cast(dec38)).as("sq"),
        count(lit(1)).as("n"))
      .localCheckpoint() // labels·dim rows; three consumers below
    val a = sums.groupBy(col("label"))
      .agg(sum(col("s").cast(dec38) * col("s").cast(dec38)).as("s2"),
        sum(col("sq")).as("q"), max(col("n")).as("m"))
      .select(col("label"), col("m"),
        (col("m").cast(dec38) * col("q") - col("s2")).as("a"))
    val dd = sums.select(col("label").as("la"), col("d"),
        col("s").as("sa"), col("n").as("na"))
      .join(sums.select(col("label").as("lb"), col("d"),
        col("s").as("sb"), col("n").as("nb")), Seq("d"))
      .filter(col("la") < col("lb"))
      .select(col("la"), col("lb"), col("na"), col("nb"),
        ((col("sa").cast(dec38) * col("nb") - col("sb").cast(dec38) * col("na")) *
          (col("sa").cast(dec38) * col("nb") - col("sb").cast(dec38) * col("na"))).as("t"))
      .groupBy(col("la"), col("lb"), col("na"), col("nb"))
      .agg(sum(col("t")).as("dd"))
    val ratios = dd
      .join(broadcast(a.select(col("label").as("la"), col("a").as("aa"))), Seq("la"))
      .join(broadcast(a.select(col("label").as("lb"), col("a").as("ab"))), Seq("lb"))
      .select(col("la"), col("lb"),
        round((col("aa") * col("nb").cast(dec38) * col("nb").cast(dec38) +
          col("ab") * col("na").cast(dec38) * col("na").cast(dec38)).cast("double")
          / col("dd").cast("double"), 6).as("ratio"))
    val both = ratios.select(col("la").as("label"), col("lb").as("partner"), col("ratio"))
      .union(ratios.select(col("lb").as("label"), col("la").as("partner"), col("ratio")))
    val w = Window.partitionBy(col("label")).orderBy(col("ratio").desc, col("partner"))
    both.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(a.select(col("label"), col("m").as("n_members")), "label")
      .select(col("label"), col("n_members"), col("partner").as("worst_partner"),
        col("ratio").as("db_ratio"))
      .orderBy(col("label"))
  }

  val qClusterQualitySql: String = {
    val q = 1L << QuantBits
    s"""WITH xq AS (
       |  SELECT vec_id, label,
       |    generate_subscripts(embedding, 1) AS d,
       |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * $q) AS BIGINT) AS x
       |  FROM embeddings
       |), sums AS (
       |  SELECT label, d, CAST(sum(x) AS HUGEINT) AS s,
       |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sq, count(*) AS n
       |  FROM xq GROUP BY 1, 2
       |), a AS (
       |  SELECT label, m, CAST(m AS HUGEINT) * q - s2 AS a FROM (
       |    SELECT label, sum(s * s) AS s2, sum(sq) AS q, max(n) AS m
       |    FROM sums GROUP BY 1)
       |), dd AS (
       |  SELECT l.label AS la, r.label AS lb, max(l.n) AS na, max(r.n) AS nb,
       |    sum((l.s * r.n - r.s * l.n) * (l.s * r.n - r.s * l.n)) AS dd
       |  FROM sums l JOIN sums r ON l.d = r.d AND l.label < r.label
       |  GROUP BY 1, 2
       |), ratios AS (
       |  SELECT la, lb,
       |    round(CAST(x.a * CAST(nb AS HUGEINT) * nb + y.a * CAST(na AS HUGEINT) * na
       |        AS DOUBLE) / CAST(dd.dd AS DOUBLE), 6) AS ratio
       |  FROM dd JOIN a x ON x.label = dd.la JOIN a y ON y.label = dd.lb
       |), bidir AS (
       |  SELECT la AS label, lb AS partner, ratio FROM ratios
       |  UNION ALL SELECT lb, la, ratio FROM ratios
       |), pick AS (
       |  SELECT bidir.*, row_number() OVER (
       |    PARTITION BY label ORDER BY ratio DESC, partner) AS rn
       |  FROM bidir
       |)
       |SELECT p.label, CAST(a.m AS BIGINT) AS n_members,
       |  p.partner AS worst_partner, p.ratio AS db_ratio
       |FROM pick p JOIN a ON a.label = p.label
       |WHERE p.rn = 1
       |ORDER BY p.label""".stripMargin
  }

  /** INT8 QUANTIZATION CALIBRATION: per-dimension affine (min/max) int8
    * codebooks over the corpus plus the exact reconstruction-error
    * profile — the calibration pass a serving system runs before shipping
    * an 8-bit vector store. Runs ENTIRELY in the already-quantized
    * integer domain (`x = floor(v·2^14)`): `code = (x−min)·255 DIV range`,
    * `deq = min + code·range DIV 255`, so codes, dequantized values and
    * every error statistic are exact integers — no float rounding
    * conventions in play anywhere (the audit is of the quantizer, not of
    * float noise).
    *
    * Scale: min/max and the error sums are one map-side-combinable pass;
    * the 64-row extremes relation broadcasts back for the error
    * projection. Output is dim-sized.
    */
  def qQuantCalib(spark: SparkSession, dir: String): DataFrame = {
    val base = quantized(spark, dir)
    val ext = base.groupBy(col("d"))
      .agg(min(col("x")).as("vmin"), max(col("x")).as("vmax"),
        count(lit(1)).as("n_values"))
    base.join(broadcast(ext), "d")
      .select(col("d").cast("long").as("d"), col("n_values"),
        col("vmin"), col("vmax"),
        abs(col("x") - (col("vmin") +
          expr("(((x - vmin) * 255) DIV greatest(vmax - vmin, 1))" +
            " * greatest(vmax - vmin, 1) DIV 255"))).as("e"))
      .groupBy(col("d"), col("n_values"), col("vmin"), col("vmax"))
      .agg(sum(col("e")).as("sum_abs_err"), max(col("e")).as("max_err"))
      .withColumn("mean_err_micro", expr("sum_abs_err * 1000000 DIV n_values"))
      .select(col("d"), col("vmin"), col("vmax"), col("n_values"),
        col("sum_abs_err"), col("max_err"), col("mean_err_micro"))
      .orderBy(col("d"))
  }

  val qQuantCalibSql: String = {
    val q = 1L << QuantBits
    s"""WITH xq AS (
       |  SELECT vec_id,
       |    generate_subscripts(embedding, 1) - 1 AS d,
       |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * $q) AS BIGINT) AS x
       |  FROM embeddings
       |), ext AS (
       |  SELECT d, min(x) AS vmin, max(x) AS vmax, count(*) AS n_values
       |  FROM xq GROUP BY 1
       |), e AS (
       |  SELECT xq.d, ext.n_values, ext.vmin, ext.vmax,
       |    abs(x - (vmin + (((x - vmin) * 255) // greatest(vmax - vmin, 1))
       |      * greatest(vmax - vmin, 1) // 255)) AS e
       |  FROM xq JOIN ext USING (d)
       |)
       |SELECT CAST(d AS BIGINT) AS d, vmin, vmax,
       |  CAST(n_values AS BIGINT) AS n_values,
       |  CAST(sum(e) AS BIGINT) AS sum_abs_err, CAST(max(e) AS BIGINT) AS max_err,
       |  CAST(sum(e) * 1000000 // n_values AS BIGINT) AS mean_err_micro
       |FROM e
       |GROUP BY e.d, e.vmin, e.vmax, e.n_values
       |ORDER BY d""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embed_centroids" -> (qEmbedCentroids _),
    "q_embed_outliers" -> (qEmbedOutliers _),
    "q_embed_pc1" -> (qEmbedPc1 _),
    "q_cluster_quality" -> (qClusterQuality _),
    "q_quant_calib" -> (qQuantCalib _))

  def oracle: Map[String, String] = Map(
    "q_embed_centroids" -> qEmbedCentroidsSql,
    "q_embed_outliers" -> qEmbedOutliersSql,
    "q_embed_pc1" -> qEmbedPc1Sql,
    "q_cluster_quality" -> qClusterQualitySql,
    "q_quant_calib" -> qQuantCalibSql)
}
