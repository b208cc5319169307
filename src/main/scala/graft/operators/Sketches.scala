package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005): a fixed depth×width
  * grid of counters summarizing a key-frequency distribution. The point at
  * scale is that the sketch is an ALGEBRAIC aggregate — each partition
  * builds its grid map-side, partial grids merge by cell-wise addition, and
  * the final structure is a few hundred rows no matter whether the input is
  * 60k events or a 100 TB stream (the same property the HLL register set
  * gives q_a13 for distinct counts). Point queries overestimate, never
  * underestimate: est(k) = min over rows j of cell (j, h_j(k)).
  *
  * Hashes are pairwise-independent multiply-shift forms
  * h_j(k) = ((a_j·k + b_j) mod p) mod width over the Mersenne prime
  * p = 2^61 − 1, with literal (a_j, b_j) so every engine reproduces the
  * grid exactly (keys and coefficients stay far below the int64 overflow
  * bound: a < 2^32, k < 2^31 ⇒ a·k < 2^63).
  */
object Sketches {

  /** 2^61 − 1. */
  val CmsPrime: Long = 2305843009213693951L

  /** Fixed multiply-shift coefficients; depth ≤ 4 draws from these. */
  val CmsA: Seq[Long] = Seq(2654435761L, 40503L, 2246822519L, 3266489917L)
  val CmsB: Seq[Long] = Seq(11L, 101L, 1009L, 10007L)

  /** h_j applied to a non-negative long key column. The key domain
    * [0, 2^31) is ENFORCED, not assumed: outside it the int64 multiply
    * would wrap silently in Spark while the DuckDB oracle errors on
    * overflow (and negative keys would yield negative buckets) — a latent
    * cross-engine divergence that must surface loudly instead (ADVICE
    * r7). The guard is a codegen'd branch on the already-loaded key. */
  def cmsBucket(key: Column, j: Int, width: Int): Column = {
    val guarded = when(key < 0L || key >= lit(1L << 31),
      raise_error(concat(
        lit("count-min key outside [0, 2^31): "), key.cast("string"))))
      .otherwise(key)
    ((lit(CmsA(j)) * guarded + lit(CmsB(j))) % lit(CmsPrime)) % lit(width)
  }

  /** Build the sketch: one (j, bucket, c) row per non-empty cell —
    * depth×width rows max, map-side combinable (a plain hash aggregate on a
    * 256-value grouping key). */
  def countMin(df: DataFrame, keyCol: String, depth: Int = 4, width: Int = 64): DataFrame = {
    require(depth <= CmsA.length, s"depth $depth > ${CmsA.length} fixed hash rows")
    df.select(posexplode(array(
        (0 until depth).map(j => cmsBucket(col(keyCol), j, width)): _*)))
      .withColumnsRenamed(Map("pos" -> "j", "col" -> "bucket"))
      .groupBy("j", "bucket").agg(count(lit(1)).as("c"))
  }

  /** Point-query `probes` (any frame with a long `keyCol`) against a
    * [[countMin]] sketch: appends `cms_n` = min over depth rows. The sketch
    * is broadcast — it is bounded by depth×width cells, so the probe side
    * (which may be huge) never shuffles. Empty cells have no sketch row;
    * the left join reads them as count 0, so a key absent from the build
    * set estimates 0 (min over ALL depth rows) instead of vanishing or
    * inheriting only its collided cells.
    *
    * Contract (ADVICE r7): probe ROWS are expected distinct — the final
    * aggregate groups by all probe columns, so duplicate probe rows
    * collapse to one output row (add a row-id column to keep them). Probe
    * columns named `__cms_j` / `__cms_bucket` / `__cms_c` are reserved;
    * the former bare j/bucket/c internals no longer collide with ordinary
    * probe schemas. */
  def cmsEstimate(
      sketch: DataFrame,
      probes: DataFrame,
      keyCol: String,
      depth: Int = 4,
      width: Int = 64): DataFrame = {
    val probeCols = probes.columns.toSeq
    val keyed = probes.select(col("*"), posexplode(array(
        (0 until depth).map(j => cmsBucket(col(keyCol), j, width)): _*)))
      .withColumnsRenamed(Map("pos" -> "__cms_j", "col" -> "__cms_bucket"))
    val cells = sketch.toDF("__cms_j", "__cms_bucket", "__cms_c")
    keyed.join(broadcast(cells), Seq("__cms_j", "__cms_bucket"), "left")
      .groupBy(probeCols.map(col): _*)
      .agg(min(coalesce(col("__cms_c"), lit(0L))).as("cms_n"))
  }
}
