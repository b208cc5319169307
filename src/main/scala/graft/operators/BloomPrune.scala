package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftColumn}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.types.BinaryType

/** Explicit bloom-filter semi-join pruning: build a compact bloom filter
  * over the (selective) dimension's join keys, push a `might_contain` test
  * into the fact-side scan, then run the exact join — false positives die
  * at the join, so the RESULT is identical to the plain join while the
  * fact rows surviving to the shuffle shrink to ≈ the matching set.
  *
  * This is the shape Spark's AQE runtime bloom filter
  * (`spark.sql.optimizer.runtime.bloomFilter.*`) injects when its size
  * thresholds trigger; making it a first-class operator lets a pipeline
  * apply it deterministically — at 100 TB the fact scan feeds the shuffle
  * only rows whose key might match, for the cost of one pass over the
  * small side plus an O(bits) broadcast that rides inside the plan as a
  * literal.
  *
  * The filter bytes are built with the PUBLIC `df.stat.bloomFilter`
  * (driver-held, bounded by `numBits`) and probed with Catalyst's native
  * `BloomFilterMightContain` — the same codegen'd predicate the runtime
  * filter uses, so the probe stays inside whole-stage codegen (no UDF). */
object BloomPrune {

  /** Serialized bloom filter over a LONG key column. `expectedItems` sizes
    * the bit array for the target false-positive rate; the driver holds
    * only the fixed-size bit array, never the keys. */
  def bloomBytes(
      dim: DataFrame,
      keyCol: String,
      expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = {
    val bf = dim.stat.bloomFilter(keyCol, expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Codegen'd probe of [[bloomBytes]] against a LONG key column; the raw
    * key probes directly because `stat.bloomFilter` inserted raw longs. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    GraftColumn(
      BloomFilterMightContain(Literal(bloom, BinaryType), GraftColumn.expr(key)))

  /** Fact rows whose `factKey` might match `dim`'s `dimKey` set: the bloom
    * pre-filter only (false positives included) — callers follow with the
    * exact join. `expectedItems` defaults to `dim.count()` — a full
    * scan-aggregate over the (filtered) dim, i.e. one extra dim pass on top
    * of the bloom build's. That is the right trade only because the dim is
    * the SMALL side by contract; production callers pass catalog stats or
    * any upper bound (oversizing a bloom just wastes bits, never
    * correctness). */
  def pruneFact(
      fact: DataFrame,
      factKey: String,
      dim: DataFrame,
      dimKey: String,
      expectedItems: Option[Long] = None,
      fpp: Double = 0.01): DataFrame = {
    val n = expectedItems.getOrElse(dim.count())
    val bloom = bloomBytes(dim, dimKey, math.max(n, 1L), fpp)
    fact.filter(mightContain(bloom, fact(factKey)))
  }
}
