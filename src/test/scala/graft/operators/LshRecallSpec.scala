package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Ties the approximate near-dup path to the exact one: every pair MinHash
  * LSH reports must be a true near-dup (precision 1.0 by construction —
  * candidates are exact-verified), and recall against the exhaustive
  * inverted-index Jaccard must stay high.
  */
class LshRecallSpec extends SparkSpec {

  test("q75 LSH pairs are a subset of q74 exact pairs with recall >= 0.8") {
    val exact = SparkEntry.queries("q74_ngram_jaccard")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("q75_minhash_lsh")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "exact pass found no near-dups — data drifted?")
    assert(lsh.subsetOf(exact), s"false positives: ${lsh -- exact}")
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall (${lsh.size}/${exact.size})")
  }
}
