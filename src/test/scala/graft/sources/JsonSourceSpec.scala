package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.SparkSpec

class JsonSourceSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("score", DoubleType)))

  private def write(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft-json")
    Files.write(dir.resolve("part-0.json"), lines.mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  test("explicit-schema read round-trips typed rows") {
    val path = write(Seq(
      """{"doc_id": 1, "text": "hello", "score": 0.5}""",
      """{"doc_id": 2, "text": "world", "score": 1.25}"""))
    val df = JsonSource.valid(JsonSource.read(spark, path, schema))
    assert(df.schema.fields.map(f => f.name -> f.dataType.typeName).toSeq ===
      Seq("doc_id" -> "long", "text" -> "string", "score" -> "double"))
    val rows = df.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(rows === Seq((1L, "hello", 0.5), (2L, "world", 1.25)))
  }

  test("malformed lines are quarantined, not dropped or fatal") {
    val path = write(Seq(
      """{"doc_id": 1, "text": "good", "score": 1.0}""",
      """{not json at all""",
      """{"doc_id": 3, "text": "also good", "score": 3.0}"""))
    // corrupt-column queries require a materialized parse (Spark restriction
    // on raw file scans — see JsonSource.corrupt)
    val df = JsonSource.read(spark, path, schema).cache()
    try df.count() finally ()
    assert(JsonSource.valid(df).count() === 2L)
    val bad = JsonSource.corrupt(df).collect()
      .map(_.getAs[String](JsonSource.CorruptCol))
    assert(bad.toSeq === Seq("{not json at all"))
  }

  test("inference compat mode types the same clean file") {
    val path = write(Seq("""{"doc_id": 7, "text": "x", "score": 2.5}"""))
    val df = JsonSource.read(spark, path, schema, inferSchema = true)
    val row = df.head()
    assert(row.getAs[Long]("doc_id") === 7L)
    assert(row.getAs[Double]("score") === 2.5)
  }
}
