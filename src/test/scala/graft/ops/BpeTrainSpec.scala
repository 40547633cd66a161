package graft.ops

import graft.SparkFunSuite

/** BPE merge induction pinned on the classic low/lower/newest/widest
  * corpus (Sennrich et al.'s worked example, adapted): every merge
  * round's arg-max pair and weighted count are hand-computed, including
  * a tie broken by the (count desc, pair asc) total order.
  */
class BpeTrainSpec extends SparkFunSuite {

  test("hand-computed merges: low/lower/newest/widest corpus") {
    import spark.implicits._
    // word freqs after tokenization: low 5, newest 3, lower 2, widest 1
    val docs = Seq(
      "low low low low low",
      "lower lower",
      "newest newest newest",
      "widest").toDF("text")
    val merges = BpeTrain.bpeMerges(docs, vocabWords = 100, rounds = 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // r1: (l,o)=7 ties (o,w)=7 → pair-asc tie-break picks (l,o)
    // r2: (lo,w)=7
    // r3: (e,s)=4 ties (s,t)=4 → (e,s)
    // r4: (es,t)=3+1=4 (newest + widest)
    assert(merges === Seq(
      (1, "l", "o", 7L),
      (2, "lo", "w", 7L),
      (3, "e", "s", 4L),
      (4, "es", "t", 4L)))
  }

  test("merges stop early when every word is a single symbol") {
    import spark.implicits._
    val docs = Seq("ab ab ab").toDF("text")
    val merges = BpeTrain.bpeMerges(docs, vocabWords = 10, rounds = 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // round 1 merges (a,b); nothing is adjacent afterwards
    assert(merges === Seq((1, "a", "b", 3L)))
  }
}
