package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** The round-15 overflow-free centroid-distance reformulation
  * ([[VectorSearch.CentroidParts]] / partsDist): the g + r/n floor
  * decomposition must reproduce the exact mathematical distance with NO
  * cell-size ceiling below the loud N ≈ 2^28 driver guard — the r14
  * formulation's `2N·ΣSx` long product aborted the sf10 probe at ~31k
  * members per cell (quantBits = 14), which is exactly the cell
  * population a 10⁹-vector √n-bucketed store sits at.
  */
class CentroidPartsSpec extends SparkFunSuite {

  private val quantBits = 14
  private val dim = 64

  private def mkCentroid(n: Long, seed: Int): VectorSearch.Centroid = {
    val rnd = new scala.util.Random(seed)
    // component sums of n members each in [-2^qb, 2^qb): s_d ∈ n·[-2^qb, 2^qb)
    val s = Array.fill(dim)((rnd.nextDouble() * 2 - 1) * n * (1L << quantBits)).map(_.toLong)
    VectorSearch.Centroid(s, n)
  }

  private def mkX(seed: Int): Array[Long] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(dim)(((rnd.nextDouble() * 2 - 1) * (1L << quantBits)).toLong)
  }

  /** Exact rational Σ_d (x − s/n)² scaled by n², computed in BigInt —
    * the ground truth both formulations approximate at the final division.
    */
  private def exactScaled(c: VectorSearch.Centroid, x: Array[Long]): BigInt =
    (0 until dim).map { d =>
      val t = BigInt(c.n) * x(d) - c.s(d)
      t * t
    }.sum

  test("g/r decomposition is the exact floor split for positive and negative sums") {
    // 2·10^8 members with FULL-RANGE random component means is the
    // largest fixture inside the new Σ|s|·xmax dot envelope (ADVICE r15
    // guard — worst-case spread cells bound at n ≈ 2^28; realistic cells
    // with |mean| ≪ 4 reach far higher, and 250M at this spread now
    // correctly raises rather than risking a wrapped VecDotLong)
    for (seed <- 1 to 20; n <- Seq(1L, 2L, 7L, 1000L, 31000L, 200000000L)) {
      val c = mkCentroid(n, seed)
      val p = VectorSearch.centroidParts(c, quantBits)
      assert(p.n === n)
      (0 until dim).foreach { d =>
        assert(p.g(d) * n + p.r(d) === c.s(d), s"n=$n d=$d")
        assert(p.r(d) >= 0 && p.r(d) < n, s"n=$n d=$d")
      }
      assert(p.sumG2 === p.g.map(g => BigInt(g) * g).sum)
      assert(p.sumGR === p.g.zip(p.r).map { case (g, r) => BigInt(g) * r }.sum)
      assert(p.sumR2 === p.r.map(r => BigInt(r) * r).sum)
    }
  }

  test("partsDist matches the exact rational distance past the r14 abort point") {
    val s = spark
    import s.implicits._
    // 31k members/cell is where the r14 sf10 probe aborted; 2^20 is two
    // orders past it — both must now evaluate, no ANSI overflow anywhere
    for (n <- Seq(100L, 31000L, 1L << 20)) {
      val cents = (1 to 4).map(mkCentroid(n, _))
      val xs = (10 to 29).map(mkX)
      val df = xs.zipWithIndex
        .map { case (x, i) => (i.toLong, x.map(_.toDouble).toSeq) }
        .toDF("id", "xq")
        .withColumn("a2", graft.functions.VecDot(col("xq"), col("xq")).cast("long"))
      val distCols = cents.zipWithIndex.map { case (c, j) =>
        VectorSearch.partsDist(
          VectorSearch.centroidParts(c, quantBits), col("xq"), col("a2")).as(s"d$j")
      }
      val got = df.select(col("id") +: distCols: _*).collect()
        .map(r => r.getLong(0) -> (0 until 4).map(j => r.getDouble(j + 1))).toMap
      xs.zipWithIndex.foreach { case (x, i) =>
        (0 until 4).foreach { j =>
          val exact = BigDecimal(exactScaled(cents(j), x)) /
            (BigDecimal(cents(j).n) * BigDecimal(cents(j).n))
          val gotD = got(i.toLong)(j)
          assert((BigDecimal(gotD) - exact).abs <= exact.abs * 1e-12 + 1e-9,
            s"n=$n vec=$i cent=$j got=$gotD exact=$exact")
        }
      }
    }
  }

  test("the r14 formulation's long product genuinely overflows in this regime") {
    // documents WHY the reformulation exists: at n=31000, quantBits=14,
    // dim=64 the old 2N·Σ(S·x) term exceeds Long.MaxValue, so the exact-
    // integer path could not have produced these rows at all
    val n = 31000L
    val c = mkCentroid(n, 1)
    // a vector pointing along the centroid (the near-member case every
    // real cell is full of): no sign cancellation in Σ(S·x)
    val x = c.s.map(s => if (s >= 0) (1L << quantBits) - 1 else -((1L << quantBits) - 1))
    val sx = (0 until dim).map(d => BigInt(c.s(d)) * x(d)).sum
    assert((BigInt(2) * n * sx).abs > BigInt(Long.MaxValue),
      "fixture no longer exercises the overflow regime — raise n")
  }

  test("the driver guard fails loudly (not silently) past the documented envelope") {
    // Σr² ≤ dim·N² needs N² ≤ Long.Max/dim: build a centroid far past it
    val n = 1L << 32
    val s = Array.fill(dim)(n / 2 + 1) // r_d = n/2+1 → Σr² ≈ dim·n²/4 > Long.Max
    val ex = intercept[IllegalArgumentException] {
      VectorSearch.centroidParts(VectorSearch.Centroid(s, n), quantBits)
    }
    assert(ex.getMessage.contains("envelope"), ex.getMessage)
  }

  test("degenerate near-identical cell: the DOT guard fires even when r ≈ 0 (ADVICE r15)") {
    // the dedup regime: N ≈ 2^30 members all at the same point → r_d = 0,
    // so sumR2/sumGR pass trivially — but VecDotLong's Σx·s against this
    // centroid would wrap a long. The Σ|s|·2^(quantBits+2) guard must
    // raise LOUDLY instead of letting the dot wrap silently.
    val n = 1L << 30
    val s = Array.fill(dim)(n * (3L << quantBits)) // members identical at 3.0·2^qb
    assert((0 until dim).forall(d => s(d) % n == 0), "fixture: exact members, r=0")
    val sumR2 = BigInt(0) // by construction — the old guards see nothing
    assert(sumR2.isValidLong)
    val ex = intercept[IllegalArgumentException] {
      VectorSearch.centroidParts(VectorSearch.Centroid(s, n), quantBits)
    }
    assert(ex.getMessage.contains("dot envelope"), ex.getMessage)
  }
}
