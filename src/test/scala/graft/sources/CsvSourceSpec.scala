package graft.sources

import java.nio.file.Files

import graft.SparkSpec

class CsvSourceSpec extends SparkSpec {

  private lazy val csvPath = {
    val dir = Files.createTempDirectory("graft-csv")
    val f = dir.resolve("retail.csv")
    Files.writeString(f,
      """InvoiceNo,StockCode,Description,Quantity,InvoiceDate,UnitPrice,CustomerID,Country
        |536365,85123A,HOLDER,6,12/1/10 8:26,2.55,17850,United Kingdom
        |536365,85123A,HOLDER,6,12/1/10 8:26,2.55,17850,United Kingdom
        |536366,71053,LANTERN,-2,1/4/11 10:00,3.39,,France
        |""".stripMargin)
    f.toString
  }

  test("explicit-schema read parses M/d/yy H:mm dates and keeps nullable CustomerID") {
    val df = CsvSource.readRetail(spark, csvPath)
    val rows = df.orderBy("InvoiceNo").collect()
    assert(rows.length === 3)
    assert(rows(0).getAs[java.sql.Date]("InvoiceDate").toString === "2010-12-01")
    assert(rows(2).getAs[java.sql.Date]("InvoiceDate").toString === "2011-01-04")
    assert(rows(2).isNullAt(rows(2).fieldIndex("CustomerID")))
    assert(rows(2).getAs[Int]("Quantity") === -2) // returns kept (net semantics)
  }

  test("cleaned() dedups exact rows and derives LineRevenue") {
    val df = CsvSource.cleaned(CsvSource.readRetail(spark, csvPath))
    assert(df.count() === 2) // 3 raw - 1 exact dup
    val uk = df.filter(org.apache.spark.sql.functions.col("InvoiceNo") === "536365").head()
    assert(math.abs(uk.getAs[Double]("LineRevenue") - 15.3) < 1e-9)
  }

  test("inferSchema compat mode yields the same parsed dates") {
    val a = CsvSource.readRetail(spark, csvPath, inferSchema = false)
      .select("InvoiceNo", "InvoiceDate").orderBy("InvoiceNo").collect().toSeq
    val b = CsvSource.readRetail(spark, csvPath, inferSchema = true)
      .select("InvoiceNo", "InvoiceDate").orderBy("InvoiceNo").collect().toSeq
    assert(a.map(_.toString) === b.map(_.toString))
  }
}
