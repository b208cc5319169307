package graft.functions

import graft.SparkSpec

class ExtensionsSpec extends SparkSpec {

  test("custom expressions are callable from SQL strings") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_simhash(array('the','quick','fox')) AS sh,
        |       graft_rolling_hash('hello') AS rh,
        |       graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                    array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c
        |""".stripMargin).head()
    assert(r.getLong(0) !== 0L)
    assert(r.getLong(1) === HashUtil.rollingHash(
      org.apache.spark.unsafe.types.UTF8String.fromString("hello")))
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("GraftExtensions installs all six SQL functions into a session") {
    // the shared test session is built by GraftSession, which sets
    // spark.sql.extensions=graft.functions.GraftExtensions
    val names = Seq(
      "graft_rolling_hash", "graft_simhash", "graft_cosine",
      "graft_word_shingles", "graft_char_shingles", "graft_minhash")
    val shingles = spark.sql(
      "SELECT size(graft_word_shingles(array('a','b','c','d'), 2)) AS n").head().getInt(0)
    assert(shingles === 3)
    val cnt = spark.sql("SELECT graft_char_shingles('abcabc', 3) AS n").head().getInt(0)
    assert(cnt === 3)
    names.foreach { n =>
      assert(spark.catalog.functionExists(n) ||
        spark.sessionState.functionRegistry.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier(n)), s"missing $n")
    }
  }
}
