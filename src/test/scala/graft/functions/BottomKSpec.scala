package graft.functions

import graft.SparkSpec

/** Sketch-semantics units for the typed Aggregators: properties the
  * end-to-end oracle gate cannot isolate — dedup inside KMV state, the
  * k-bound under reduce and merge, and merge associativity (the property
  * partial aggregation relies on).
  */
class BottomKSpec extends SparkSpec {

  test("KmvSketchAgg dedups inside the sketch and respects the k bound") {
    val a = KmvSketchAgg(4)
    // duplicates never grow the state
    val s1 = Seq(5L, 3L, 5L, 3L, 5L).foldLeft(a.zero)(a.reduce)
    assert(s1 == Seq(3L, 5L))
    // overflow keeps the k smallest distinct values
    val s2 = (10L to 1L by -1L).foldLeft(a.zero)(a.reduce)
    assert(s2 == Seq(1L, 2L, 3L, 4L))
    // an already-seen value arriving again at capacity changes nothing
    assert(a.reduce(s2, 2L) == Seq(1L, 2L, 3L, 4L))
  }

  test("KmvSketchAgg merge is associative, commutative, and dedups across sides") {
    val a = KmvSketchAgg(3)
    val x = Seq(1L, 4L, 9L)
    val y = Seq(1L, 2L, 9L)
    val z = Seq(3L, 4L, 5L)
    assert(a.merge(x, y) == Seq(1L, 2L, 4L))
    assert(a.merge(x, y) == a.merge(y, x))
    assert(a.merge(a.merge(x, y), z) == a.merge(x, a.merge(y, z)))
  }

  test("BottomKAgg keeps duplicates (multiset bottom-k), KMV does not") {
    val b = BottomKAgg(3)
    val multiset = Seq(2L, 2L, 7L).foldLeft(b.zero)(b.reduce)
    assert(multiset == Seq(2L, 2L, 7L))
    val kmv = Seq(2L, 2L, 7L).foldLeft(KmvSketchAgg(3).zero)(KmvSketchAgg(3).reduce)
    assert(kmv == Seq(2L, 7L))
  }
}
