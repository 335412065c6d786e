package graft

/** The streaming SimHash near-dup must produce the batch twin's exact pair
  * set: q_simhash_banded (chunk-pair banded join, oracle-green since r15)
  * is the ground truth for q_tws_simhash_dedup's incremental emission. */
class NearDupStreamSpec extends GraftSpec {

  test("q_tws_simhash_dedup matches the batch q_simhash_banded pair set") {
    val stream = SparkEntry.queries("q_tws_simhash_dedup")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val batch = SparkEntry.queries("q_simhash_banded")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(stream.nonEmpty, "fixture has no near-dup pairs — vacuous parity")
    assert(stream == batch)
  }

  test("q_tws_simhash_dedup emits each pair exactly once") {
    val rows = SparkEntry.queries("q_tws_simhash_dedup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSet.size == rows.length, "duplicate pair emission")
    assert(rows.forall { case (a, b) => a < b }, "pair not ordered doc_a < doc_b")
  }
}
