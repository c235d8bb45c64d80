package graft

import org.apache.spark.sql.functions._

import graft.operators.{Caching, Graph}

/** Degree and PageRank semantics on hand-built graphs; hand-computed
  * fixed-point expectations pin the exact integer recurrence (the
  * cross-engine contract the oracle then re-checks on real pairs).
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def star = (2L to 5L).map(i => (1L, i)).toDF("doc_a", "doc_b")

  test("degrees: star hub has degree n-1, leaves 1; edges deduped after symmetrize") {
    val withDup = star.union(Seq((2L, 1L)).toDF("doc_a", "doc_b")) // reverse dup
    val d = Graph.degrees(withDup).as[(Long, Long)].collect().toMap
    assert(d === Map(1L -> 4L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("pageRank: exact fixed-point values on the star; 2-cycle is the conservation fixed point") {
    // hand-computed: pr0=10000 all; hub ← 4 leaf contribs, leaf ← hub/4
    //   iter1: hub 35500, leaf 3625
    //   iter2: hub 13825, leaf 9043
    //   iter3: hub 32246, leaf 4437
    val pr = Graph.pageRank(star, iters = 3)
    val m = pr.as[(Long, Long)].collect().toMap
    assert(m(1L) === 32246L)
    assert((2L to 5L).forall(m(_) === 4437L))
    Caching.releaseLocalCheckpoints(pr)
    // a 2-cycle conserves mass exactly: 1500 + 85% of 10000 = 10000
    val two = Graph.pageRank(Seq((7L, 9L)).toDF("doc_a", "doc_b"), iters = 5)
    assert(two.as[(Long, Long)].collect().toMap === Map(7L -> 10000L, 9L -> 10000L))
    Caching.releaseLocalCheckpoints(two)
  }

  test("pageRank releases every intermediate round; result releasable by the caller") {
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val pr = Graph.pageRank(star, iters = 3)
    pr.count()
    Caching.releaseLocalCheckpoints(pr)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    assert(leaked.isEmpty, s"pageRank leaked persistent RDDs: $leaked")
  }
}
