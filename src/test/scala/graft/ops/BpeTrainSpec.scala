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

  test("encode applies the learned merges: hand-computed compression") {
    import spark.implicits._
    // Same Sennrich corpus as one source. Tracing all 10 rounds by hand:
    // r1 (l,o) r2 (lo,w) r3 (e,s) r4 (es,t) r5 (e,w) r6 (ew,est)
    // r7 (n,ewest) r8 (e,r) r9 (low,er) r10 (d,est) — low/lower/newest
    // all collapse to 1 symbol, widest to 3 (" w i dest ").
    // Before: 5·3 + 2·5 + 3·6 + 1·6 = 49 symbols; after: 5+2+3+3 = 13;
    // compression = (49-13)·10000 DIV 49 = 7346 bp.
    val docs = Seq(
      (1L, "low low low low low", "en", "s", 19L),
      (2L, "lower lower", "en", "s", 11L),
      (3L, "newest newest newest", "en", "s", 20L),
      (4L, "widest", "en", "s", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("bpe-encode")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = BpeTrain.qBpeEncode(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq(("s", 11L, 49L, 13L, 7346L)))
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
