package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** r15-ADVICE regression: [[PipelineOps.packedPrefixSums]] must not
  * NPE on a null `text`. The carry pass reads n_tokens with getLong,
  * so a null token count (size(tokens(null)) is null) would fail the
  * whole p6 job; the defined contract is that a null text counts 0
  * tokens — the row is still emitted and later same-shard docs see an
  * unshifted running sum. The harness corpus has no null texts, so
  * only a crafted frame exercises this path.
  */
class PackedPrefixSumsSpec extends SparkSuite {

  import spark.implicits._

  test("null text counts 0 tokens: no NPE, row emitted, carry unshifted") {
    val docs = Seq(
      (0L, "a b c"),          // shard 0: 3 tokens
      (2L, null: String),     // shard 0: null text -> 0 tokens
      (4L, "d e"),            // shard 0: 2 tokens
      (1L, "x y z w"),        // shard 1: 4 tokens
      (3L, null: String)      // shard 1: null text -> 0 tokens
    ).toDF("doc_id", "text")
    val out = PipelineOps.packedPrefixSums(docs, shards = 2L)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // (shard, n_tokens, start) — start is the same-shard prefix sum,
    // with the null doc contributing 0
    assert(out(0L) == ((0L, 3L, 0L)))
    assert(out(2L) == ((0L, 0L, 3L)))
    assert(out(4L) == ((0L, 2L, 3L)))
    assert(out(1L) == ((1L, 4L, 0L)))
    assert(out(3L) == ((1L, 0L, 4L)))
  }
}
