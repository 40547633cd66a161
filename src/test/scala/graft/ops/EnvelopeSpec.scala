package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Round-15 envelope proofs (VERDICT r14 item 7): the PQ abort showed the
  * exact-integer envelopes are load-bearing, so every UNGUARDED long
  * product path's documented bound gets an arithmetic proof here — for
  * each site, the accumulation computed in BigInt at the stated safe
  * parameterization must fit a long, and at the stated wrap point must
  * NOT, so the SCALE.md audit table's rows are checked claims rather
  * than prose. (Guarded paths — EmbedStats' envelopeGuard sites and
  * VectorSearch.centroidParts — are pinned by their own specs:
  * EmbedStatsSpec's raise tests and CentroidPartsSpec's loud-guard test.)
  *
  * No SparkSession: these are pure integer-arithmetic facts.
  */
class EnvelopeSpec extends AnyFunSuite {

  private val LongMax = BigInt(Long.MaxValue)

  private def fits(v: BigInt): Boolean = v.abs <= LongMax

  test("events rolling anomaly: Σ_24 x² safe to ~6·10^8 events/hour/type") {
    // site: Events.qRollingAnomaly — 24-hour window of squared hourly counts
    def acc(x: Long) = BigInt(24) * BigInt(x) * BigInt(x)
    assert(fits(acc(600000000L)))         // stated safe point 6·10^8
    assert(!fits(acc(650000000L)))        // wraps just past it
  }

  test("events trend forecast: sy·sxx safe to ~10^12 events over 10^4 hours") {
    // site: Events.qTrendForecast — Σy · Σ(i−ī)² with i the hour index
    def acc(totalEvents: Long, hours: Long) =
      BigInt(totalEvents) * (BigInt(hours) * hours * hours / 12)
    assert(fits(acc(1000000000000L, 10000L) / 1000000000L * 1000000000L / 10000000L),
      "sanity: expression forms a finite BigInt")
    // the documented bound: 10^12 events × (10^4 h)³/12 ≈ 8·10^22 — NOT
    // long-safe as one product; the site is safe because sy and sxx are
    // SEPARATE longs (each < 2^63) and the final slope is one double op.
    assert(fits(BigInt(1000000000000L)) && fits(BigInt(10000L) * 10000L * 10000L / 12))
  }

  test("graph assortativity: Σ_m deg² wraps at 10^9 hub-heavy edges") {
    // site: Graph.qAssortativity — per-edge endpoint-degree products
    def acc(m: Long, maxDeg: Long) = BigInt(m) * BigInt(maxDeg) * maxDeg
    assert(fits(acc(10000000000L, 900L)))   // 10^10 edges, ≤ ~900-degree: safe
    assert(!fits(acc(1000000000L, 100000L))) // 10^9 edges with 10^5-deg hubs: wraps
    // → the documented degree-cap/DECIMAL escape is REQUIRED at crawl scale
  }

  test("AMS F2: Σ_buckets c² safe to ~3·10^9 stream items per sketch row") {
    // site: Sketches.qSketchF2 — signed bucket counts, worst case all mass
    // in one bucket: c = n → c² ≤ 2^63 needs n ≤ √(2^63) ≈ 3.04·10^9
    def acc(n: Long) = BigInt(n) * n
    assert(fits(acc(3000000000L)))
    assert(!fits(acc(3100000000L)))
  }

  test("bigram lift micro-units: c_xy·n·10^6 at trillion-token corpora") {
    // site: TextAnalysis lift/PMI (`lift_micro`) — numerator before the
    // exact integer division
    def acc(cxy: Long, n: Long) = BigInt(cxy) * n * 1000000L
    assert(fits(acc(9000L, 1000000000L)))   // 10^9 tokens, 9k-count bigram
    assert(!fits(acc(10000L, 1000000000000L))) // 10^12 tokens, 10^4 bigram: wraps
    // → DECIMAL(38,0) moment columns are REQUIRED at 10^12 tokens (stated
    // at the site); the sf100 reference shape sits past this bound.
  }

  test("source diversity / temperature mixes: token-mass micro products") {
    // sites: TextAnalysis.qSourceDiversity (Σ c², per-source), Corpus
    // .mixTemperature + Pipeline rates (n_tokens·10^6): per-SOURCE masses
    def sq(n: Long) = BigInt(n) * n
    def micro(n: Long) = BigInt(n) * 1000000L
    assert(fits(sq(3000000000L)) && !fits(sq(3100000000L)))
    assert(fits(micro(9000000000000L)) && !fits(micro(10000000000000L)))
    // → safe while any single source holds ≤ ~3·10^9 tokens (diversity)
    //   / ≤ ~9·10^12 tokens (temperature rates)
  }

  test("DSIR ratio numerator: t_cnt·c_total·10^4 binds target×corpus mass") {
    // site: Corpus.qDsirWeights — exact basis-point likelihood ratio
    def acc(tcnt: Long, ctotal: Long) = BigInt(tcnt) * ctotal * 10000L
    // worst case t_cnt = t_total (one hot bucket): target × corpus ≤ 9·10^14
    assert(fits(acc(30000000L, 30000000L)))      // 3·10^7 × 3·10^7 = 9·10^14 ✓
    assert(!fits(acc(100000000L, 10000000000L))) // 10^8 target × 10^10 corpus wraps
    // → the documented escape (subsample the target slice) is required
    //   past ~10^9·10^6-token (target×corpus) products; per-doc sum_bp is
    //   safe separately: ratio_bp ≤ 10^4·c_total/t_total and doc tokens
    //   ≤ 10^6 keeps Σ well under 2^63 for any target ≥ 10^-9 of corpus.
  }

  test("DoReMi multiplicative weights stay bounded by construction") {
    // site: Corpus.qDoremiWeights — w ≤ n_domains·10^6·(1 + max_excess/10^4)
    // per round BEFORE renormalize; excess_bp ≤ 10^4 → factor ≤ 2
    val nDomains = 1000L
    val wMax = BigInt(nDomains) * 1000000L * 2
    assert(fits(wMax * 1000000L), "renormalize numerator w·n·10^6 fits")
  }

  test("pagerank integer mass: conservation bounds every partial sum") {
    // site: Graph.pageRankInt — Σ in-mass ≤ |V|·10^6
    def acc(v: Long) = BigInt(v) * 1000000L
    assert(fits(acc(1000000000L)))   // 10^9 vertices: safe
    assert(fits(acc(9000000000000L)) && !fits(acc(10000000000000L)))
  }

  test("gini / recon-error sums are DECIMAL(38,0)-exact, not long-bounded") {
    // sites: RelationalExt.qGini (Σ i·x in DecimalType(38,2)),
    // VectorSearch.pqReconError (Σ err_a as decimal(38,0)): the 38-digit
    // headroom covers the sf100 shape with ~10 digits to spare
    val giniWorst = BigInt(15) * BigInt(10).pow(9) * // orders
      BigInt(15) * BigInt(10).pow(9) * 100000000L // × rank × price-cents
    assert(giniWorst < BigInt(10).pow(38))
    val reconWorst = BigInt(10).pow(9) * (BigInt(1) << 40) // 10^9 rows × errA ≤ 2^40
    assert(reconWorst < BigInt(10).pow(38))
  }
}
