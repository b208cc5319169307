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
