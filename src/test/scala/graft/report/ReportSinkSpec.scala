package graft.report

import java.nio.file.Files

import graft.SparkSpec

class ReportSinkSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned parquet sink round-trips and prunes by partition dir") {
    val dir = Files.createTempDirectory("graft-report").toString
    val kpi = Seq(("UK", 1.5, 18.2), ("DE", 7.1, 22.9)).toDF("Country", "mae_model", "mae_baseline")
    ReportSink.parquet(kpi, s"$dir/kpi", partitionBy = Seq("Country"))
    val back = spark.read.parquet(s"$dir/kpi")
    assert(back.count() === 2)
    assert(Files.exists(java.nio.file.Paths.get(s"$dir/kpi/Country=UK")))
  }

  test("console sink (S4): show renders rows untruncated and printSchema the schema") {
    // the reference's console surface: show(n, truncate=False) + printSchema
    // (Sales_forecast_pyspark.py:78, 81)
    val df = Seq(("UK", 1234567890L), ("DE", 2L)).toDF("Country", "NetDailyQuantity")
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
      df.show(1, truncate = false)
      df.printSchema()
    }
    val text = out.toString("UTF-8")
    assert(text.contains("|Country|NetDailyQuantity|"), s"header missing:\n$text")
    assert(text.contains("1234567890"), "untruncated value missing")
    assert(text.contains("only showing top 1 row"), "row limit not applied")
    assert(text.contains("|-- Country: string (nullable = true)"), s"schema missing:\n$text")
    assert(text.contains("|-- NetDailyQuantity: long (nullable = false)"))
  }

  test("csv sink writes one header'd file") {
    val dir = Files.createTempDirectory("graft-report").toString
    ReportSink.csv(Seq((1, "a"), (2, "b")).toDF("id", "v"), s"$dir/out")
    val files = new java.io.File(s"$dir/out").listFiles().filter(_.getName.endsWith(".csv"))
    assert(files.length === 1)
    val lines = Files.readAllLines(files.head.toPath)
    assert(lines.get(0) === "id,v")
    assert(lines.size === 3)
  }
}
