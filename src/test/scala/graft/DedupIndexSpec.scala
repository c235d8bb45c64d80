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

  test("bloom-pruned exact stage is result-identical to the unpruned plan") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") < 300)
    val delta = docs.filter(col("doc_id") >= 300).select(col("doc_id"), col("text"))
    val index = Dedup.buildIndex(corpus)
    val pruned = Dedup.dedupeAgainstIndex(delta, index, 900, bloomFpp = Some(0.01))
      .select("doc_id").as[Long].collect().sorted
    val plain = Dedup.dedupeAgainstIndex(delta, index, 900, bloomFpp = None)
      .select("doc_id").as[Long].collect().sorted
    assert(pruned.sameElements(plain))
  }

  test("compactIndex shrinks file counts, dedupes retried appends, preserves results") {
    import graft.jobs.IncrementalDedupJob
    val base = java.nio.file.Files.createTempDirectory("compact_idx").toString
    val (indexDir, outDir) = (s"$base/index", s"$base/out")
    val mk = (lo: Int) => (lo until lo + 20)
      .map(i => (i.toLong, (1 to 25).map(j => s"w$i-$j").mkString(" ")))
      .toDF("doc_id", "text")
    // three batches → per-batch appends
    IncrementalDedupJob.process(mk(0), "r", 0L, indexDir, outDir, 900, 3)
    IncrementalDedupJob.process(mk(100), "r", 1L, indexDir, outDir, 900, 3)
    IncrementalDedupJob.process(mk(200), "r", 2L, indexDir, outDir, 900, 3)
    // simulate an at-least-once index-append RETRY: re-append a copy of
    // the existing hash rows (materialized first — never read-while-
    // writing the same dir)
    val hPath = s"$indexDir/hashes"
    val dupRows = spark.read.parquet(hPath).collect().toSeq
    val dupSchema = spark.read.parquet(hPath).schema
    spark.createDataFrame(spark.sparkContext.parallelize(dupRows, 1), dupSchema)
      .write.mode("append").parquet(hPath)
    val distinctHashes = spark.read.parquet(hPath).distinct().count()
    assert(spark.read.parquet(hPath).count() === distinctHashes * 2)
    val delta = mk(300).unionByName(mk(100).limit(3)) // 3 known history dups
    def surviving(): Array[Long] = {
      val idx = Dedup.readIndex(spark, indexDir)
      Dedup.dedupeAgainstIndex(delta, idx, 900)
        .select("doc_id").as[Long].collect().sorted
    }
    def files(part: String): Int =
      new java.io.File(s"$indexDir/$part").listFiles((_, n) => n.endsWith(".parquet")).length
    val before = surviving()
    assert(before.length === 20 && before.forall(_ >= 300L))
    val filesBefore = files("hashes")
    assert(filesBefore >= 4, s"expected per-batch appends, got $filesBefore files")
    Dedup.compactIndex(spark, indexDir, targetBytes = 1L << 30)
    assert(files("hashes") === 1 && files("signatures") === 1 && files("token_sets") === 1)
    // the retried duplicate rows are gone, nothing else is
    assert(spark.read.parquet(hPath).count() === distinctHashes)
    assert(Dedup.readIndex(spark, indexDir).k === 3) // meta untouched
    assert(surviving().sameElements(before))
  }

  test("process applies quality+mojibake gates and reports the per-stage funnel") {
    import graft.jobs.IncrementalDedupJob
    val base = java.nio.file.Files.createTempDirectory("funnel").toString
    val (indexDir, outDir) = (s"$base/index", s"$base/out")
    // 25 distinct ~5-char tokens: quality 750 (length + token-len +
    // distinct bands), zero mojibake
    val goodText = (1 to 25).map(i => s"tok$i").mkString(" ")
    val batch1 = Seq(
      (1L, goodText),
      (2L, goodText),                          // exact dup of 1
      (3L, goodText.replace("tok1 ", "tokX ")), // near dup of 1 (token jaccard 923)
      (4L, "aa aa aa"),                        // low quality → gate
      (5L, ("� " * 40) + goodText)             // mojibake → gate
    ).toDF("doc_id", "text")
    val s1 = IncrementalDedupJob.process(batch1, "r", 0L, indexDir, outDir,
      thresholdPermille = 900, k = 3, minQuality = 500, maxMojibakePermille = 100)
    assert(s1 === Map("docs_in" -> 5L, "after_quality_gate" -> 3L,
      "after_exact_dedup" -> 2L, "after_near_dedup" -> 1L,
      "after_history_dedup" -> 1L))
    val batch2 = Seq(
      (10L, goodText),                                   // history dup → dropped
      (11L, (1 to 25).map(i => s"new$i").mkString(" "))  // novel → survives
    ).toDF("doc_id", "text")
    val s2 = IncrementalDedupJob.process(batch2, "r", 1L, indexDir, outDir,
      thresholdPermille = 900, k = 3, minQuality = 500, maxMojibakePermille = 100)
    assert(s2 === Map("docs_in" -> 2L, "after_quality_gate" -> 2L,
      "after_exact_dedup" -> 2L, "after_near_dedup" -> 2L,
      "after_history_dedup" -> 1L))
    val kept = spark.read.parquet(outDir).select("doc_id").as[Long].collect().sorted
    assert(kept === Array(1L, 11L))
  }

  test("IncrementalDedupJob dedupes each batch against the whole history, across queries") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("inc_dedup").toString
    val (indexDir, outDir) = (s"$base/index", s"$base/out")
    val textA = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val textB = "one two three four five six seven eight nine ten eleven twelve " +
      "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty " +
      "twentyone twentytwo twentythree twentyfour" // long enough that a
      // one-word edit stays above the 900-permille Jaccard bar (23/25)
    def run(runId: String, rows: (Long, String)*): Unit = {
      val mem = MemoryStream[(Long, String)]
      val q = graft.jobs.IncrementalDedupJob.start(
        mem.toDF().toDF("doc_id", "text"), runId, indexDir, outDir, s"$base/$runId",
        thresholdPermille = 900)
      try { mem.addData(rows: _*); q.processAllAvailable() } finally q.stop()
    }
    // run 1: doc 2 duplicates doc 1's content in-batch → 1 (min id) + 3 kept
    run("r1", (1L, textA), (2L, textA), (3L, textB))
    val after1 = spark.read.parquet(outDir).select("doc_id").as[Long].collect().toSet
    assert(after1 === Set(1L, 3L))
    // a SEPARATE run (own checkpoint + run id, e.g. the next day):
    // exact dup of A, near-dup of B, one novel doc — history lives in
    // the index, so the dups are caught beyond any watermark horizon,
    // and run r1's partitions are untouched (no batch-id collision)
    run("r2", (10L, textA), (11L, textB.replace("twelve", "dozen")),
      (12L, "completely novel content nothing shares these transitions at all"))
    val after2 = spark.read.parquet(outDir).select("doc_id").as[Long].collect().toSet
    assert(after2 === Set(1L, 3L, 12L), s"got $after2")
    // retry idempotency: re-running r2's batch 0 (same run id + batch
    // id, as a checkpoint replay would) must not double-append
    graft.jobs.IncrementalDedupJob.process(
      Seq((12L, "completely novel content nothing shares these transitions at all"))
        .toDF("doc_id", "text"), "r2", batchId = 0L, indexDir, outDir, 900, 3)
    val after3 = spark.read.parquet(outDir).select("doc_id").as[Long].collect()
    assert(after3.count(_ == 12L) === 1, "batch retry double-appended")
    assert(after3.toSet === Set(1L, 3L, 12L))
  }
}
