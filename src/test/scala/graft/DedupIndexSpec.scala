package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** Persisted signature-index round-trip for incremental dedup: results
  * against a parquet-stored index must equal results against the
  * recomputed corpus — the production daily-delta shape where the
  * corpus is indexed once, not rescanned per delta.
  */
class DedupIndexSpec extends SparkSpec {
  import spark.implicits._

  test("stored index round-trip: dedupeAgainstIndex == dedupeAgainst on sf0.001") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") < 300)
    // delta = the real tail + an injected exact dup and near-dup of
    // corpus docs (new ids), so every code path fires
    val donor = corpus.filter(col("doc_id") === 7)
      .select(col("text")).as[String].head()
    val injected = Seq(
      (9001L, donor),                              // exact dup of corpus
      (9002L, donor + " extra"),                   // near-dup of corpus
      (9003L, "entirely novel delta document about nothing else at all " * 3)
    ).toDF("doc_id", "text")
    val delta = docs.filter(col("doc_id") >= 300).select(col("doc_id"), col("text"))
      .unionByName(injected)

    val direct = Dedup.dedupeAgainst(delta, corpus, thresholdPermille = 900)
      .select("doc_id").as[Long].collect().sorted

    val dir = java.nio.file.Files.createTempDirectory("dedup_index").toString
    Dedup.writeIndex(Dedup.buildIndex(corpus), dir)
    val stored = Dedup.readIndex(spark, dir)
    val viaIndex = Dedup.dedupeAgainstIndex(delta, stored, thresholdPermille = 900)
      .select("doc_id").as[Long].collect().sorted

    assert(viaIndex.sameElements(direct),
      s"stored-index result diverged: direct=${direct.length} viaIndex=${viaIndex.length}")
    // the injected dups were actually caught, the novel doc survived
    assert(!direct.contains(9001L) && !direct.contains(9002L))
    assert(direct.contains(9003L))
  }
}
