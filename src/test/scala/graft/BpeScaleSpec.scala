package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.sources.Tables

/** BPE training at production merge counts ([[TextAnalysis.bpeMergesIter]]):
  * parity with the unrolled form where both run, and the cost claim —
  * per-merge work is vocabulary-local (corpus scanned once), so k
  * merges cost ~linear in k, not quadratic.
  */
class BpeScaleSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)

  test("bpeMergesIter ≡ bpeMerges at the unrolled form's cap (k=8)") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("merge_rank")).collect().map(_.toSeq).toSeq
    assert(rows(TextAnalysis.bpeMergesIter(docs, 8)) ===
      rows(TextAnalysis.bpeMerges(docs, 8)))
  }

  test("k=100 merges run, stay deterministic, and cost ~linear in k") {
    // warm-up run so JIT/codegen compile lands outside the measurements
    TextAnalysis.bpeMergesIter(docs, 5).collect()
    def timed(k: Int): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = TextAnalysis.bpeMergesIter(docs, k).count()
      (n, (System.nanoTime() - t0) / 1e9)
    }
    val (n25, t25) = timed(25)
    val (n100, t100) = timed(100)
    info(f"k=25: $n25 merges in $t25%.1f s; k=100: $n100 merges in $t100%.1f s")
    assert(n25 === 25L, "vocabulary exhausted before 25 merges")
    // sf0.001's tiny vocabulary fully merges before 100 ranks (89 at
    // last measure) — exhaustion-then-stop is correct behavior; the
    // scale claim needs MANY merges, not the exact count
    assert(n100 >= 80L, s"vocabulary exhausted after only $n100 merges")
    // near-linear: PER-MERGE cost at ~n100 merges stays within 3x of
    // per-merge cost at 25 (the unrolled form's re-applied folds grow
    // per-merge cost ~linearly with rank ⇒ ~2-4x just from k, plus
    // analysis blowup). Generous bound absorbs host-noise bursts.
    assert(t100 / n100 <= math.max(t25 / n25, 0.02) * 3,
      f"per-merge cost ${t100 / n100}%.3f s at k=$n100 vs ${t25 / n25}%.3f s at k=25")
    // determinism: same input, same merge table
    val again = TextAnalysis.bpeMergesIter(docs, 25)
      .orderBy(col("merge_rank")).collect().map(_.toSeq).toSeq
    val first = TextAnalysis.bpeMergesIter(docs, 25)
      .orderBy(col("merge_rank")).collect().map(_.toSeq).toSeq
    assert(again === first)
  }
}
