package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** The end-to-end corpus build (round 11): domain checks on the packed
  * output, determinism across runs, and the stage-composition properties
  * the aggregate shape can still witness. The DuckDB oracle replaying all
  * ten stages is the correctness gate; these specs pin the contracts a
  * hash can't see (domains, eval exclusion, chunk accounting).
  */
class PipelineFullSpec extends SparkFunSuite {

  private val sf = "/root/testdata/sf0.001"

  test("pipeline composite: packed output domains and chunk accounting") {
    val rows = Pipeline.qPipelineFull(spark, sf).collect().toSeq
    assert(rows.nonEmpty)
    val splits = rows.map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 8), "shard ∈ [0,8)")
    assert(rows.forall(_.getLong(3) >= 1), "every chunk holds ≥1 doc")
    assert(rows.forall(r => r.getLong(5) <= r.getLong(6)), "min_doc ≤ max_doc")
    // stage 0 pins: the eval stand-in (doc_id ≡ 0 mod 20) never reaches
    // packing, so no chunk's id range can be a single eval doc
    assert(rows.forall(r => !(r.getLong(5) == r.getLong(6) && r.getLong(5) % 20 == 0)))
    // the gates really dropped documents: packed docs < train-corpus size
    val trainDocs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(pmod(col("doc_id"), lit(20)) =!= 0).count()
    assert(rows.map(_.getLong(3)).sum < trainDocs)
  }

  test("pipeline composite is deterministic across invocations") {
    val a = Pipeline.qPipelineFull(spark, sf).collect().toSeq
    val b = Pipeline.qPipelineFull(spark, sf).collect().toSeq
    assert(a == b)
  }

  test("packing invariant: chunk_id equals floor of the doc-order token prefix") {
    // within every (split, shard), chunk token totals reconstruct the
    // prefix sums: chunk c starts at the cumulative tokens of chunks < c
    val rows = Pipeline.qPipelineFull(spark, sf)
      .orderBy(col("split"), col("shard"), col("chunk_id")).collect().toSeq
    rows.groupBy(r => (r.getString(0), r.getLong(1))).foreach { case (_, chunks) =>
      var cum = 0L
      chunks.sortBy(_.getLong(2)).foreach { r =>
        assert(r.getLong(2) == cum / Corpus.PackBudget,
          s"chunk ${r.getLong(2)} should start at prefix $cum")
        cum += r.getLong(4)
      }
    }
  }
}
