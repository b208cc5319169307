package graft.queries

import graft.SparkSpec

/** q_tp6: the re-synchronization property that motivates content-defined
  * over fixed-width chunking. */
class CdcChunkSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private lazy val rows = Corpus.cdcPassageDedup(spark, d).collect()
    .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap

  test("prefix-shifted clones keep only head chunks (chunking re-syncs)") {
    // A clone is [x, y] ++ original tokens: shingle windows clear of the
    // prefix reproduce the original's boundaries shifted by 2, so every
    // clone chunk after the head (plus at most one mixed-window chunk)
    // equals an earlier original chunk and is dropped. Surviving clone
    // content must start with the prefix and be at most 2 chunks.
    val clones = rows.keys.filter(_ >= 3000000L)
    assert(clones.nonEmpty)
    clones.foreach { id =>
      val (nKept, _) = rows(id)
      assert(nKept <= 2L, s"clone $id kept $nKept chunks — chunking failed to re-sync")
    }
    // aggregate: the clones keep only head fragments — a small fraction of
    // what their originals keep. (Per-clone startsWith would over-assert:
    // two clones sharing a boilerplate opening dedup each other's head
    // chunk, leaving only a mixed-window fragment.)
    val cloneChars = clones.toSeq.map(rows(_)._2.length).sum
    val origChars = clones.toSeq.map(id => rows.get(id - 3000000L).map(_._2.length).getOrElse(0)).sum
    assert(cloneChars < origChars / 2,
      s"clones kept $cloneChars chars vs originals' $origChars — no re-sync benefit")
  }

  test("docs with globally unique content reassemble losslessly") {
    // The fixture corpus contains real duplicate documents (q_d2 tier), so
    // SOME chunk loss among natural docs is correct behavior; docs whose
    // content is unique must survive chunk->dedup->reassembly verbatim.
    val norm = graft.Tables.documents(spark, d)
      .selectExpr("doc_id", "regexp_replace(lower(trim(text)), '\\\\s+', ' ') AS n")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val textCounts = norm.values.groupBy(identity).map { case (t, g) => t -> g.size }
    val uniqueDocs = norm.filter { case (_, t) => textCounts(t) == 1 }
    val intactUnique = uniqueDocs.count { case (id, t) => rows.get(id).exists(_._2 == t) }
    // unique TEXT can still share individual chunks with other docs; the
    // overwhelming majority must be fully intact
    assert(intactUnique.toDouble / uniqueDocs.size > 0.75,
      s"only $intactUnique/${uniqueDocs.size} unique docs reassembled losslessly")
  }
}
