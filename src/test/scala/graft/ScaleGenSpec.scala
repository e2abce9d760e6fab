package graft

import org.apache.spark.sql.functions._

/** Pins [[ScaleGen.tiledEmbeddings]]' injectivity claim across the
  * full 128-copy envelope — the r14 shape remapped shift 0 to 1 for
  * reversed copies, which made copy 64 (raw shift 0) collide with
  * copy 119 (raw shift 1): the exact cross-copy duplicate pathology
  * the reversal was added to avoid (r14 ADVICE).
  */
class ScaleGenSpec extends SparkSuite {
  import spark.implicits._

  test("tiledEmbeddings: all 128 copies of one vector pairwise distinct") {
    // a generic (asymmetric) 64-dim vector: no rotation equals another,
    // and no rotation of its reversal equals any rotation of it
    val v = (1 to 64).map(i => i.toDouble)
    val df = Seq((0L, v)).toDF("vec_id", "embedding")
    val tiled = ScaleGen.tiledEmbeddings(df, vecStride = 1L, copies = 128)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toVector)
    assert(tiled.length == 128)
    // every copy keeps the full vector (the shift-0 slice arithmetic
    // must not drop or duplicate elements)
    tiled.foreach { case (id, e) =>
      assert(e.length == 64, s"copy $id has ${e.length} dims")
      assert(e.sorted == v.sorted.toVector, s"copy $id lost elements")
    }
    // pairwise distinct — in particular copies 64 (reversed, shift 0)
    // and 119 (reversed, shift 1), the r14 collision pair
    val dups = tiled.groupBy(_._2).filter(_._2.length > 1)
      .values.map(_.map(_._1).sorted.mkString(",")).toSeq
    assert(dups.isEmpty, s"duplicate copies: $dups")
  }

  test("tiledEmbeddings: copies beyond the cycle envelope are rejected") {
    val df = Seq((0L, Vector.fill(64)(0.5))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      ScaleGen.tiledEmbeddings(df, vecStride = 1L, copies = 129)
    }
  }
}
