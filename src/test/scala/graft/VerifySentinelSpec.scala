package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loud-failure contract of the Verify dump (round-6 verdict item 2): a
  * query that throws must leave an `_ERROR.json` sentinel in its output
  * dir — never vanish — and must not take the healthy queries with it.
  */
class VerifySentinelSpec extends SparkSuite {

  test("a throwing query leaves _ERROR.json; healthy queries still dump") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_vsent").toString
    val good = (s: SparkSession, _: String) => {
      import s.implicits._
      Seq((1, "a")).toDF("id", "s")
    }
    val broken = (_: SparkSession, _: String) =>
      throw new IllegalStateException("""deliberate "failure"
        with control chars""")
    val failed = Verify.dump(spark, "/nonexistent", out,
      Seq("ok_query" -> good, "broken_query" -> broken))
    assert(failed == Seq("broken_query"))

    // healthy query dumped parquet as usual
    assert(spark.read.parquet(s"$out/ok_query").count() == 1)

    // broken query: a sentinel with the message, no parquet, valid JSON
    val sentinel = new java.io.File(s"$out/broken_query/_ERROR.json")
    assert(sentinel.exists, "no _ERROR.json sentinel for the failed query")
    val node = graft.delta.ActionCodec.mapper.readTree(
      java.nio.file.Files.readString(sentinel.toPath))
    assert(node.get("query").asText == "broken_query")
    assert(node.get("error").asText.contains("deliberate \"failure\""))
    assert(!new java.io.File(s"$out/broken_query").listFiles()
      .exists(_.getName.endsWith(".parquet")))

    // a later SUCCESSFUL run must clear the stale sentinel: overwrite
    // parquet write replaces dir contents... it does NOT remove foreign
    // files, so dump() must — otherwise one bad round poisons the next
    val failed2 = Verify.dump(spark, "/nonexistent", out,
      Seq("broken_query" -> good))
    assert(failed2.isEmpty)
    assert(!new java.io.File(s"$out/broken_query/_ERROR.json").exists,
      "stale sentinel survived a successful re-dump")
    assert(spark.read.parquet(s"$out/broken_query").count() == 1)
  }
}
