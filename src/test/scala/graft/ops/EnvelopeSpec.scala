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

  test("events trend forecast: sy and sxx each fit a long; their product does not") {
    // site: Events.qTrendForecast — Σy · Σ(i−ī)² with i the hour index.
    // The site is safe BECAUSE sy and sxx are SEPARATE long accumulations
    // and the slope is one double op — the real invariant is that each
    // factor fits at the stated sf100 parameterization (10^12 events over
    // 10^4 hours) while the combined product would wrap, so folding them
    // into one long product would be a bug this row exists to forbid.
    val sy = BigInt(1000000000000L)                    // 10^12 events
    val sxx = BigInt(10000L) * 10000L * 10000L / 12    // Σ(i−ī)² ≈ h³/12
    assert(fits(sy), "sy must fit a long at 10^12 events")
    assert(fits(sxx), "sxx must fit a long at 10^4 hours")
    assert(!fits(sy * sxx),
      "the combined product wraps — it must never be formed as one long")
  }

  test("graph assortativity: DECIMAL(38,0) quadratic moments are safe at the sf100 shape") {
    // site: Graph.assortativity — round-16 escape (VERDICT r15 item 1b).
    // The OLD long accumulation of Σ deg_u·deg_v wrapped at crawl scale:
    def longAcc(m: Long, maxDeg: Long) = BigInt(m) * BigInt(maxDeg) * maxDeg
    assert(!fits(longAcc(1000000000L, 100000L)),
      "10^9 edges with 10^5-deg hubs wraps a long — why the escape exists")
    // The NEW decimal moments: Σx² ≤ 2m·maxdeg² and the cross-products
    // n·Σxy, (Σx)² must all stay under 10^38 at the sf100 shape
    // (10^10 edges, 10^5-degree hubs) — with orders of headroom:
    val dec38 = BigInt(10).pow(38)
    val m = BigInt(2) * BigInt(10).pow(10)             // directed edge rows (2m)
    val maxDeg = BigInt(100000)                        // crawl hub
    val sxx = m * maxDeg * maxDeg                      // Σx² worst case
    val sx = m * maxDeg                                // Σx worst case
    assert(sxx < dec38 && BigInt(10).pow(10) * sxx < dec38 && sx * sx < dec38,
      "all decimal moments fit 10^38 at sf100")
    // headroom: safe to ~7·10^8-degree hubs at 10^10 edges
    val hubLimit = BigInt(7) * BigInt(10).pow(8)
    assert(BigInt(10).pow(10) * (m * hubLimit * hubLimit) < dec38 * 10)
    // the linear marginal Σx = Σ_v deg² stays a LONG sum: safe while
    // 2m·maxdeg < 2^63 (maxdeg ≤ 4.6·10^8 at 10^10 edges), loud beyond
    assert(fits(m * maxDeg) && !fits(m * BigInt(5) * BigInt(10).pow(8)))
  }

  test("AMS F2: Σ_buckets c² safe to ~3·10^9 stream items per sketch row") {
    // site: Sketches.qSketchF2 — signed bucket counts, worst case all mass
    // in one bucket: c = n → c² ≤ 2^63 needs n ≤ √(2^63) ≈ 3.04·10^9
    def acc(n: Long) = BigInt(n) * n
    assert(fits(acc(3000000000L)))
    assert(!fits(acc(3100000000L)))
  }

  test("bigram lift: DECIMAL moments + saturated quotient are safe at any token scale") {
    // site: TextAnalysis.lmScored — round-16 escape (VERDICT r15 item 1a).
    // The OLD long numerator wrapped inside the sf100 shape:
    assert(!fits(BigInt(10000L) * 1000000000000L * 1000000L),
      "10^12 tokens × 10^4-count bigram wraps a long — why the escape exists")
    // The NEW decimal numerator c_xy·n·10^6 fits 10^38 while c_xy·n ≤
    // 10^32 — any corpus to ~10^16 tokens (worst case c_xy = n):
    val dec38 = BigInt(10).pow(38)
    val sf100Tokens = BigInt(2) * BigInt(10).pow(13)
    assert(sf100Tokens * sf100Tokens * 1000000L < dec38, "sf100 worst case fits")
    assert(BigInt(9) * BigInt(10).pow(15) * (BigInt(9) * BigInt(10).pow(15)) * 1000000L < dec38,
      "~10^16-token ceiling")
    // the denominator c_x·c_y fits decimal for any long-valued counts
    assert(sf100Tokens * sf100Tokens < dec38)
    // the per-position quotient lands in BIGINT through satFloorDiv
    // saturated at LiftCapMicro — bounded BY CONSTRUCTION, so no abort
    // path remains; the cap itself is far inside the long range and
    // unreachable below a double-hapax pair in a >10^9-token corpus:
    assert(fits(BigInt(graft.ops.TextAnalysis.LiftCapMicro)))
    assert(BigInt(graft.ops.TextAnalysis.LiftCapMicro) == BigInt(10).pow(9) * 1000000L)
    // per-doc Σ lift is summed in DECIMAL(38,0): ≤ 10^6 positions × cap
    assert(BigInt(10).pow(6) * graft.ops.TextAnalysis.LiftCapMicro < dec38)
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

  test("DSIR ratio: DECIMAL moments + saturated quotient are safe at the sf100 shape") {
    // site: Corpus.qDsirWeights — round-16 escape (VERDICT r15 item 1c).
    // The OLD long numerator t_cnt·c_total·10^4 wrapped inside sf100:
    assert(!fits(BigInt(100000000L) * 10000000000L * 10000L),
      "10^8 target × 10^10 corpus token-products wraps a long — why the escape exists")
    // The NEW decimal numerator fits 10^38 while target×corpus token
    // products ≤ 10^34 — any corpus to ~10^17 tokens each side:
    val dec38 = BigInt(10).pow(38)
    val sf100Tokens = BigInt(2) * BigInt(10).pow(13)
    assert(sf100Tokens * sf100Tokens * 10000L < dec38, "sf100 worst case fits")
    assert(BigInt(9) * BigInt(10).pow(16) * (BigInt(9) * BigInt(10).pow(16)) * 10000L < dec38,
      "~10^17-token ceiling")
    // the per-bucket quotient lands in BIGINT through satFloorDiv capped
    // at DsirRatioCapBp — bounded by construction; the per-doc Σ ratio
    // is summed in DECIMAL(38,0): ≤ 10^6 doc tokens × cap fits easily
    assert(fits(BigInt(graft.ops.Corpus.DsirRatioCapBp)))
    assert(BigInt(10).pow(6) * graft.ops.Corpus.DsirRatioCapBp < dec38)
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
