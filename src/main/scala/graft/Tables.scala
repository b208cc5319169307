package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md) plus the
  * retail-shaped projection that feeds the forecast operators.
  *
  * The reference's data model is invoice lines keyed by
  * (Country, StockCode, InvoiceDate) (Sales_forecast_pyspark.py:69-74,147-164).
  * We project the TPC-H-ish testdata onto that shape:
  * Country = supplier's nation, StockCode = part key, InvoiceDate = ship date,
  * Quantity = l_quantity, UnitPrice = l_extendedprice,
  * LineRevenue = l_extendedprice * (1 - l_discount).
  *
  * Scale notes: supplier and nation are tiny dimensions — both joins are
  * explicit `broadcast`s, so the projection adds no shuffle over the lineitem
  * scan even at 100 TB. Column pruning pushes the 6-column read schema down to
  * the parquet scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  /** events.ts has shipped in two physical forms across testdata
    * generations: parquet TIMESTAMP(NANOS) (which Spark 4 refuses to read
    * as a timestamp — the legacy conf reads it as raw long nanos) and
    * plain TIMESTAMP(MICROS) (read natively as TIMESTAMP_NTZ). Sniff the
    * schema and normalize either to a session-zone TimestampType column. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventsTs(table(spark, dir, "events"))
  }

  /** Long nanos → exact integer DIV then timestamp_micros (a double divide
    * would lose precision at epoch-nanos magnitude ~1.7e18 > 2^53);
    * TIMESTAMP_NTZ micros → instant, reading the NTZ wall-clock AS UTC
    * regardless of the session zone: the wall-clock fields are re-assembled
    * with make_timestamp(..., 'UTC'), which never consults the session zone
    * — a session-zone cast (even after convert_timezone) resolves
    * DST-overlap wall-clocks to the earlier offset and would shift one hour
    * of events per year in any DST session zone. Already-TimestampType
    * passes through; anything else is a schema drift we want to fail on
    * here, not rows deep into a downstream query. */
  def normalizeEventsTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          make_timestamp(
            year(col("ts")), month(col("ts")), dayofmonth(col("ts")),
            hour(col("ts")), minute(col("ts")),
            expr("date_part('SECOND', ts)"), lit("UTC")))
      case org.apache.spark.sql.types.TimestampType => df
      case other =>
        throw new IllegalArgumentException(
          s"events.ts: expected TIMESTAMP / TIMESTAMP_NTZ / legacy long nanos, got $other")
    }
  /** documents/embeddings carry the corpus's heaviest per-row compute
    * (tokenize/shingle/hash; vector kernels) and are consumed by
    * whole-table scans, so they get the same scan-parallelism guard as
    * [[salesLines]] — a single-row-group fixture file otherwise runs the
    * entire tokenize/cosine stage 2-3-way on a 32-core host (measured:
    * q_dd8's pair build 3 tasks / 2.2 s per stage, q_dd13's tokenize 2
    * tasks — OPTIMIZATION_r15.md). At production scale scans have >> cores
    * splits and the guard is a no-op, so parquet filter pushdown on real
    * deployments is unaffected; the few pushable fixture filters
    * (doc_id < 60, vec_id = 0) trade a pushed scan of a tiny file for the
    * repartition — measured noise at bench scale. */
  def documents(spark: SparkSession, dir: String): DataFrame =
    parallelized(spark, table(spark, dir, "documents"))
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    parallelized(spark, table(spark, dir, "embeddings"))

  /** Local-bench parallelism guard: the testdata parquet is one row group,
    * so the scan (and everything before the first shuffle — broadcast joins,
    * partial aggregation) would run as a single task. When the scan yields
    * far fewer splits than cores, round-robin repartition the (small) input
    * once. At production scale scans have >> cores splits and this is a
    * no-op — the check is on actual partition count, not data size. */
  private def parallelized(spark: SparkSession, df: DataFrame): DataFrame = {
    // inputFiles is metadata-only; df.rdd.getNumPartitions would eagerly
    // instantiate the RDD lineage (a second analysis pass) on every call.
    val cores = spark.sparkContext.defaultParallelism
    if (df.inputFiles.length < cores / 2) df.repartition(cores) else df
  }

  /** Invoice-line-shaped view of lineitem (see object doc). */
  def salesLines(spark: SparkSession, dir: String): DataFrame = {
    val li = parallelized(spark, lineitem(spark, dir))
    val sup = supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val nat = nation(spark, dir).select("n_nationkey", "n_name")
    li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
      .select(
        nat("n_name").as("Country"),
        li("l_partkey").cast("string").as("StockCode"),
        to_date(li("l_shipdate")).as("InvoiceDate"),
        li("l_quantity").cast("long").as("Quantity"),
        li("l_extendedprice").as("UnitPrice"),
        (li("l_extendedprice") * (lit(1.0) - li("l_discount"))).as("LineRevenue"))
  }
}
