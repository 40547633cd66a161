package graft.ops

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Pins the PassJoin blocking guarantee on controlled data: strings
  * mutated by ≤ maxDist random edits are always found (completeness —
  * the pigeonhole argument), pairs beyond the bound never appear
  * (the exact verify), and results are canonicalized unordered pairs.
  */
class FuzzyJoinSpec extends SparkFunSuite {

  private def mutate(s: String, nEdits: Int, rng: scala.util.Random): String = {
    var cur = s
    (1 to nEdits).foreach { _ =>
      val pos = rng.nextInt(cur.length)
      rng.nextInt(3) match {
        case 0 => cur = cur.updated(pos, ('a' + rng.nextInt(26)).toChar) // substitute
        case 1 => cur = cur.take(pos) + ('a' + rng.nextInt(26)).toChar + cur.drop(pos) // insert
        case 2 if cur.length > 5 => cur = cur.take(pos) + cur.drop(pos + 1) // delete
        case _ => ()
      }
    }
    cur
  }

  test("every planted <=2-edit variant is found (completeness)") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val bases = (1 to 30).map(i => s"canonical-record-name-$i-${"x" * (i % 7)}")
    val variants = bases.map(b => mutate(b, 1 + rng.nextInt(2), rng))
    val df = (bases ++ variants).toDF("name")
    val pairs = FuzzyJoin.selfJoin(df, col("name"), maxDist = 2)
      .collect().map(r => Set(r.getString(0), r.getString(1)))
    bases.zip(variants).filter { case (b, v) => b != v }.foreach { case (b, v) =>
      assert(pairs.contains(Set(b, v)), s"missed planted pair ($b, $v)")
    }
  }

  test("pairs beyond the distance bound never appear; output is canonical") {
    import spark.implicits._
    val df = Seq("alpha-record", "alpha-recorb", "totally-different-thing").toDF("name")
    val rows = FuzzyJoin.selfJoin(df, col("name"), maxDist = 2).collect()
    assert(rows.length === 1)
    assert(rows.head.getString(0) < rows.head.getString(1))
    assert(rows.head.getLong(2) === 1L)
  }

  test("entity resolution: chain cluster collapses to one entity, singletons dropped") {
    import spark.implicits._
    // a 3-member chain (A~A', A'~A'' each within 2 edits; A vs A'' is 4)
    // plus two unrelated names — one entity row expected
    val df = Seq(
      (10L, "weathered-spring-green-item"),
      (20L, "weathered-spring-grean-itam"),
      (30L, "weathered-spring-grean-ytam"),
      (40L, "midnight-lavender-chiffon"),
      (50L, "completely-other-product")
    ).toDF("rid", "name")
    val rows = FuzzyJoin.resolveEntities(df, col("name"), col("rid"), maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq == Seq((10L, "weathered-spring-green-item", 3L)))
  }
}
