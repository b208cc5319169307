package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue is the Morton interleave (reference bit arithmetic)") {
    def morton(x: Int, y: Int, bits: Int): Long =
      (0 until bits).map(k => (((x >> k) & 1).toLong << (2 * k)) |
        (((y >> k) & 1).toLong << (2 * k + 1))).sum
    val pts = for (x <- 0 until 32; y <- 0 until 32) yield (x, y)
    val got = pts.toDF("x", "y")
      .withColumn("z", ZOrder.zValue($"x", $"y", 5))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    for ((x, y) <- pts)
      assert(got((x, y)) === morton(x, y, 5), s"mismatch at ($x,$y)")
  }

  test("z-ordered layout skips more files than a linear sort for a 2-D box filter") {
    // 64×64 grid, 4096 rows, 16 files: the z-layout gives each file a
    // ~16×16 rectangle; an x-sorted layout gives 4-column strips that a
    // mid-grid box filter must ALL touch on the y dimension.
    val rows = for (x <- 0 until 64; y <- 0 until 64) yield (x, y, x * 64 + y)
    val df = rows.toDF("x", "y", "payload")
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    ZOrder.writeZOrdered(df, "x", "y", 6, s"$dir/z", 16)
    df.repartitionByRange(16, $"x", $"y").sortWithinPartitions("x", "y")
      .write.mode("overwrite").parquet(s"$dir/linear")
    // per-file zone maps (min/max of x and y), as a parquet reader sees them
    def bboxes(path: String) = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("x").as("x0"), max("x").as("x1"), min("y").as("y0"), max("y").as("y1"))
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    // filter on the NON-sort dimension, y∈[40,47]: the x-sorted strips all
    // span the full y range so every file must be read; z-cells are bounded
    // in y too, so most files' zone maps miss the filter
    def touched(bb: Seq[(Int, Int, Int, Int)]) =
      bb.count { case (_, _, y0, y1) => y1 >= 40 && y0 <= 47 }
    val (z, lin) = (bboxes(s"$dir/z").toSeq, bboxes(s"$dir/linear").toSeq)
    assert(z.size === 16 && lin.size === 16)
    assert(touched(z) < touched(lin),
      s"z-layout touched ${touched(z)} files, linear ${touched(lin)} — no skipping win")
    // and the z layout is lossless
    assert(spark.read.parquet(s"$dir/z").count() === 4096L)
  }
}
