package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming near-duplicate detection within the watermark horizon:
  * in-horizon near-dup pairs are detected, out-of-horizon duplicates
  * pass (they are the nightly batch job's responsibility), and join
  * state is expired by the watermark (bounded state).
  */
class StreamingNearDedupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while seventeen green turtles " +
      "slowly cross a wide sunny road carrying small wooden boxes full of ripe fruit"
  private val nearDup = base.replace("ripe fruit", "ripe plums") // 1-token edit
  private val unrelated =
    "completely different content about distributed query engines shuffling " +
      "partitioned columnar batches across executor memory pools under pressure"

  test("in-horizon near-dup detected, out-of-horizon dup passes, state expires") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ts", "doc_id", "text")
    val pairs = Dedup.nearDupPairsStreaming(docs, "ts", within = "10 minutes",
      maxLateness = "5 minutes", thresholdPermille = 900)
    val q = pairs.writeStream.outputMode("append").format("memory")
      .queryName("near_dedup_out").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
      def at(min: Int) = Timestamp.valueOf(s"2024-01-01 10:00:00").toInstant
        .plusSeconds(min * 60L)
      def ts(min: Int) = Timestamp.from(at(min))
      mem.addData(
        (t0, 1L, base),            // in-horizon near-dup of 2
        (ts(2), 2L, nearDup),      //   "
        (ts(180), 3L, base))       // textual dup of 1 but 3h away → passes
      q.processAllAvailable()
      // advance the watermark far past everything → state expiry
      mem.addData((ts(360), 4L, unrelated))
      q.processAllAvailable()
      mem.addData((ts(400), 5L, unrelated + " again and again"))
      q.processAllAvailable()

      val got = spark.table("near_dedup_out")
        .select("doc_a", "doc_b").distinct().as[(Long, Long)].collect().toSet
      assert(got === Set((1L, 2L)),
        s"expected exactly the in-horizon near-dup pair, got $got")
      val removed = q.recentProgress.flatMap(_.stateOperators.map(_.numRowsRemoved)).sum
      assert(removed > 0L, "watermark never expired any join state rows")
    } finally q.stop()
  }

  test("batch-mode run agrees with the batch LSH + Jaccard pipeline") {
    val docs = Seq(
      (Timestamp.valueOf("2024-01-01 10:00:00"), 1L, base),
      (Timestamp.valueOf("2024-01-01 10:01:00"), 2L, nearDup),
      (Timestamp.valueOf("2024-01-01 10:02:00"), 3L, unrelated),
      (Timestamp.valueOf("2024-01-01 10:03:00"), 4L, base)
    ).toDF("ts", "doc_id", "text")
    val streamingForm = Dedup.nearDupPairsStreaming(docs, "ts", "1 hour", "5 minutes", 900)
      .select("doc_a", "doc_b").distinct().as[(Long, Long)].collect().toSet
    val sig = Dedup.minhashSignature(Dedup.shingled(docs, k = 3))
    val batchForm = Dedup.jaccardVerify(docs, Dedup.lshCandidatePairs(sig), 900)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(streamingForm === batchForm)
    assert(streamingForm === Set((1L, 2L), (1L, 4L), (2L, 4L)))
  }

  test("index probe: duplicates of PRE-INDEXED docs are caught in-stream, " +
    "exactly-once across restart") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("idx_probe").toString
    val (indexDir, outDir) = (s"$dir/index", s"$dir/out")
    // history corpus indexed BEFORE the stream starts — `base` is far
    // outside any watermark horizon by the time duplicates arrive
    val history = Seq((100L, base), (101L, unrelated)).toDF("doc_id", "text")
    Dedup.writeIndex(Dedup.buildIndex(history, k = 3), indexDir)
    def verdicts(): Map[Long, String] =
      spark.read.parquet(outDir).select("doc_id", "verdict")
        .as[(Long, String)].collect().toMap
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.IndexProbeDedup.start(
      mem.toDF().toDF("doc_id", "text"), "r1", indexDir, outDir,
      s"$dir/ckpt", thresholdPermille = 900)
    try {
      mem.addData((1L, base),      // exact clone of indexed 100
        (2L, nearDup),             // 1-token edit of indexed 100
        (3L, "entirely novel words about nothing indexed before today"))
      q.processAllAvailable()
    } finally q.stop()
    assert(verdicts() === Map(1L -> "dup_exact_index", 2L -> "dup_near_index",
      3L -> "unique"), s"got ${verdicts()}")
    // exactly-once: a replay of the SAME (run, batch) — what a
    // post-crash checkpoint restart does — overwrites its own
    // partition instead of double-appending
    graft.streaming.IndexProbeDedup.process(
      Seq((1L, base), (2L, nearDup),
        (3L, "entirely novel words about nothing indexed before today"))
        .toDF("doc_id", "text"),
      "r1", batchId = 0L, indexDir, outDir, thresholdPermille = 900)
    val rows = spark.read.parquet(outDir).select("doc_id").as[Long].collect()
    assert(rows.length === 3 && rows.toSet === Set(1L, 2L, 3L),
      s"replayed batch must not double-append, got ${rows.toSeq.sorted}")
    // restart the stream from the same checkpoint with NEW data: old
    // verdicts intact, the new batch probes the same index
    val mem2 = MemoryStream[(Long, String)]
    // (a fresh source after restart gets its own run id — batch ids
    // restart at 0 per checkpoint, the partition key disambiguates)
    val q2 = graft.streaming.IndexProbeDedup.start(
      mem2.toDF().toDF("doc_id", "text"), "r2", indexDir, outDir,
      s"$dir/ckpt2", thresholdPermille = 900)
    try {
      mem2.addData((10L, unrelated)) // exact clone of indexed 101
      q2.processAllAvailable()
    } finally q2.stop()
    val all = verdicts()
    assert(all(10L) === "dup_exact_index" && all.size === 4, s"got $all")
  }

  test("weighted index probe: repetition-aware verdicts in-stream, parity with the batch operator") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("idx_probe_w").toString
    val (indexDir, outW, outS) = (s"$dir/index", s"$dir/out_w", s"$dir/out_s")
    val history = Seq((100L, base), (101L, unrelated)).toDF("doc_id", "text")
    Dedup.writeIndex(Dedup.buildIndex(history, k = 3), indexDir)
    // same token SET as indexed 100, wildly different multiplicities:
    // the set measure calls it a dup (J_set = 1000), the bag measure
    // does not (Σmin ≈ |base| ≪ Σmax ≈ 6·|base|)
    val repeated = (1 to 6).map(_ => base).mkString(" ")
    val delta = Seq(
      (1L, base),     // exact clone → dup_exact_index under both measures
      (2L, repeated), // set-dup, bag-unique — the discriminating row
      (3L, nearDup))  // near under both (1-token edit barely moves either)
    // streaming pass with the WEIGHTED measure
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.IndexProbeDedup.start(
      mem.toDF().toDF("doc_id", "text"), "rw", indexDir, outW,
      s"$dir/ckpt_w", thresholdPermille = 600, weighted = true)
    try { mem.addData(delta: _*); q.processAllAvailable() } finally q.stop()
    val wStream = spark.read.parquet(outW).select("doc_id", "verdict")
      .as[(Long, String)].collect().toMap
    assert(wStream === Map(1L -> "dup_exact_index", 2L -> "unique",
      3L -> "dup_near_index"), s"weighted streaming verdicts: $wStream")
    // the SET probe on identical input calls the repeated doc a dup —
    // proving the weighted path actually consulted the stored bags
    graft.streaming.IndexProbeDedup.process(delta.toDF("doc_id", "text"),
      "rs", 0L, indexDir, outS, thresholdPermille = 600)
    val setV = spark.read.parquet(outS).select("doc_id", "verdict")
      .as[(Long, String)].collect().toMap
    assert(setV(2L) === "dup_near_index",
      s"set probe must collapse multiplicities and flag the repeated doc, got $setV")
    // parity: the streaming weighted survivors equal the batch
    // operator's survivors on the same delta + stored index
    val batchSurvivors = Dedup.dedupeAgainstIndexWeighted(
        delta.toDF("doc_id", "text"), Dedup.readIndex(spark, indexDir),
        thresholdPermille = 600)
      .select("doc_id").as[Long].collect().toSet
    assert(wStream.filter(_._2 == "unique").keySet === batchSurvivors,
      s"stream unique=${wStream.filter(_._2 == "unique").keySet} batch=$batchSurvivors")
    // an index stored WITHOUT bags fails fast on the weighted probe
    val old = Dedup.readIndex(spark, indexDir).copy(bags = None)
    val e = intercept[IllegalArgumentException] {
      Dedup.dedupeAgainstIndexWeighted(delta.toDF("doc_id", "text"), old, 600).collect()
    }
    assert(e.getMessage.contains("bags"))
  }

  test("winnow probe: an in-stream EXCERPT of an indexed doc is caught (Jaccard-invisible), " +
    "exactly-once on replay, streaming ≡ batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("winnow_probe").toString
    val (indexDir, outDir) = (s"$dir/index", s"$dir/out")
    val history = Seq((100L, base), (101L, unrelated)).toDF("doc_id", "text")
    Dedup.writeWinnowIndex(Dedup.buildWinnowIndex(history, k = 5, w = 4), indexDir)
    // an excerpt: a 40-char span of `base` buried in fresh padding —
    // token-set Jaccard vs base is far below any dedup threshold, but
    // the winnow guarantee (span ≥ w+k−1 = 8 chars) must catch it
    val excerpt = "totally fresh framing text " + base.substring(10, 50) +
      " and an unrelated conclusion follows here"
    val novel = "entirely novel words about nothing indexed before today at all"
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.WinnowProbeStream.start(
      mem.toDF().toDF("doc_id", "text"), "r1", indexDir, outDir,
      s"$dir/ckpt", minShared = 3)
    try {
      mem.addData((1L, excerpt), (2L, novel))
      q.processAllAvailable()
    } finally q.stop()
    def verdicts(): Map[Long, (String, Any)] =
      spark.read.parquet(outDir).select("doc_id", "verdict", "index_id")
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.get(2)))).toMap
    val v = verdicts()
    assert(v(1L)._1 === "excerpt_of_index" && v(1L)._2 === 100L, s"got $v")
    assert(v(2L)._1 === "unique", s"got $v")
    // exactly-once: replaying the same (run, batch) overwrites, not appends
    graft.streaming.WinnowProbeStream.process(
      Seq((1L, excerpt), (2L, novel)).toDF("doc_id", "text"),
      "r1", batchId = 0L, indexDir, outDir, minShared = 3)
    assert(spark.read.parquet(outDir).count() === 2L)
    // streaming ≡ batch: the same pairs surface via excerptAgainstIndex
    val batchHits = Dedup.excerptAgainstIndex(
        Seq((1L, excerpt), (2L, novel)).toDF("doc_id", "text"),
        Dedup.readWinnowIndex(spark, indexDir), minShared = 3)
      .select("new_id", "index_id").as[(Long, Long)].collect().toSet
    assert(batchHits.contains((1L, 100L)) && !batchHits.exists(_._1 == 2L))
  }

  test("winnow index lifecycle: stored census ≡ recount, segmented append is " +
    "probe-visible and replay-exactly-once, compact folds without changing verdicts") {
    val dir = java.nio.file.Files.createTempDirectory("winnow_life").toString
    val indexDir = s"$dir/index"
    Dedup.writeWinnowIndex(Dedup.buildWinnowIndex(
      Seq((100L, base), (101L, unrelated)).toDF("doc_id", "text"), k = 5, w = 4), indexDir)
    def census(): Map[Long, Long] = spark.read.parquet(s"$indexDir/postings")
      .groupBy(col("fp")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def storedDf(): Map[Long, Long] = Dedup.readWinnowIndex(spark, indexDir).df.get
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(storedDf() === census(), "stored census must equal a postings recount")
    // delta: a NEW history doc 102 whose excerpt arrives later
    val delta = "freshly appended corpus document where nineteen purple llamas " +
      "carefully guard ancient stone bridges spanning deep misty valleys at dawn"
    Dedup.winnowIndexAppend(Seq((102L, delta)).toDF("doc_id", "text"), indexDir, "s1")
    assert(storedDf() === census(), "append must keep the stored census exact")
    val probe = Seq((1L, "unrelated prologue text then " + delta.substring(20, 70) +
      " plus an original epilogue sentence closing things out")).toDF("doc_id", "text")
    def hits(): Set[(Long, Long)] = Dedup.excerptAgainstIndex(probe,
        Dedup.readWinnowIndex(spark, indexDir), minShared = 3)
      .select("new_id", "index_id").as[(Long, Long)].collect().toSet
    assert(hits() === Set((1L, 102L)), "appended doc must be probe-visible")
    // at-least-once replay of the SAME segment: partition overwrite, no dup postings
    val before = census()
    Dedup.winnowIndexAppend(Seq((102L, delta)).toDF("doc_id", "text"), indexDir, "s1")
    assert(census() === before, "replayed segment must overwrite, not append")
    assert(storedDf() === before)
    // compact folds every segment into base; postings dedup, df recount, verdicts stable
    Dedup.compactWinnowIndex(spark, indexDir)
    assert(spark.read.parquet(s"$indexDir/postings")
      .select(col("seg")).distinct().as[String].collect().toSeq === Seq("base"))
    assert(census() === before && storedDf() === before,
      "compaction must preserve the folded postings and census exactly")
    assert(hits() === Set((1L, 102L)), "compaction must not change probe verdicts")
    // the reserved segment id fails fast
    intercept[IllegalArgumentException] {
      Dedup.winnowIndexAppend(Seq((103L, delta)).toDF("doc_id", "text"), indexDir, "base")
    }
    // CRASH WINDOW: postings landed, df partition lost (simulated by
    // deleting it) — fingerprints missing from the census default to
    // df=1 and stay probe-visible; no silent false negatives
    val delta2 = "another appended history document in which twelve amber foxes " +
      "quietly map forgotten tunnels beneath the old observatory gardens tonight"
    Dedup.winnowIndexAppend(Seq((105L, delta2)).toDF("doc_id", "text"), indexDir, "s2")
    val dfSeg = new java.io.File(s"$indexDir/df/seg=s2")
    dfSeg.listFiles().foreach(_.delete()); assert(dfSeg.delete())
    val probe2 = Seq((9L, "prologue words then " + delta2.substring(15, 65) +
      " and a closing remark")).toDF("doc_id", "text")
    val crashHits = Dedup.excerptAgainstIndex(probe2,
        Dedup.readWinnowIndex(spark, indexDir), minShared = 3)
      .select("new_id", "index_id").as[(Long, Long)].collect().toSet
    // ((9,102) may also surface — the probe legitimately shares the
    // " document " gram run with doc 102; the invariant under test is
    // that the census-less segment's doc is NOT silently dropped
    assert(crashHits.contains((9L, 105L)),
      "a census-less segment must stay probe-visible (df defaults to 1)")
  }

  test("semantic probe: an in-stream PARAPHRASE of an indexed vector is caught " +
    "(text probes blind to it), exactly-once on replay, streaming ≡ batch, " +
    "full-probe ≡ brute force") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Similarity
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("sem_probe").toString
    val (indexDir, outDir) = (s"$dir/index", s"$dir/out")
    // two well-separated clusters in 4 dims; k-means with k=2 recovers them
    val history = Seq(
      (100L, Array(1.0f, 0.05f, 0f, 0f)), (101L, Array(0.95f, 0f, 0.05f, 0f)),
      (102L, Array(0f, 1.0f, 0f, 0.05f)), (103L, Array(0.05f, 0.95f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    Similarity.writeIvfFlatIndex(
      Similarity.ivfFlatBuild(history, k = 2, iters = 2), indexDir)
    val dupVec = Array(0.99f, 0.04f, 0.01f, 0f)   // ≈ indexed 100
    val novelVec = Array(0f, 0f, 1.0f, 0f)        // orthogonal to everything
    val mem = MemoryStream[(Long, Array[Float])]
    val q = graft.streaming.SemanticProbeStream.start(
      mem.toDF().toDF("vec_id", "embedding"), "r1", indexDir, outDir,
      s"$dir/ckpt", minCos = 0.9, nprobe = 1)
    try {
      mem.addData((1L, dupVec), (2L, novelVec))
      q.processAllAvailable()
    } finally q.stop()
    def verdicts(): Map[Long, (String, Any)] =
      spark.read.parquet(outDir).select("vec_id", "verdict", "match_id")
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.get(2)))).toMap
    val v = verdicts()
    assert(v(1L)._1 === "semantic_dup_index" && v(1L)._2 === 100L, s"got $v")
    assert(v(2L)._1 === "unique", s"got $v")
    // exactly-once: replaying the same (run, batch) overwrites, not appends
    graft.streaming.SemanticProbeStream.process(
      Seq((1L, dupVec), (2L, novelVec)).toDF("vec_id", "embedding"),
      "r1", batchId = 0L, indexDir, outDir, minCos = 0.9, nprobe = 1)
    assert(spark.read.parquet(outDir).count() === 2L)
    // streaming ≡ batch: ivfFlatScore surfaces the same hit set
    val idx = Similarity.readIvfFlatIndex(spark, indexDir)
    val batchHits = Similarity.ivfFlatScore(
        Seq((1L, dupVec), (2L, novelVec)).toDF("vec_id", "embedding"), idx, nprobe = 1)
      .filter(col("cos") >= 0.9)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    assert(batchHits.contains((1L, 100L)) && !batchHits.exists(_._1 == 2L))
    // nprobe = #cells recovers brute force exactly
    val probes = Seq((1L, dupVec), (2L, novelVec)).toDF("vec_id", "embedding")
    val full = Similarity.ivfFlatTopK(probes, idx, k = 3, nprobe = 2)
      .select("query_id", "cand_id", "cos").collect().toSet
    val brute = Similarity.bruteForceTopK(probes, history, k = 3)
      .select("query_id", "cand_id", "cos").collect().toSet
    assert(full === brute, "full-probe stored serving must equal brute force")
    // lifecycle: segmented append under the frozen centroids is
    // probe-visible, replay-exactly-once; compact folds to seg=base
    val novelDoc = Seq((104L, novelVec)).toDF("vec_id", "embedding")
    Similarity.ivfFlatAppend(novelDoc, indexDir, "s1")
    def cellCount(): Long = spark.read.parquet(s"$indexDir/cells").count()
    val nAfter = cellCount()
    assert(nAfter === 5L, "append must add exactly the delta rows")
    val v2 = graft.streaming.SemanticProbeStream.process(
      Seq((3L, Array(0.02f, 0f, 0.99f, 0f))).toDF("vec_id", "embedding"),
      "r2", batchId = 0L, indexDir, outDir, minCos = 0.9, nprobe = 2)
    assert(v2 === Map("semantic_dup_index" -> 1L),
      s"appended vector must be probe-visible, got $v2")
    Similarity.ivfFlatAppend(novelDoc, indexDir, "s1") // at-least-once replay
    assert(cellCount() === nAfter, "replayed segment must overwrite, not append")
    Similarity.compactIvfFlatIndex(spark, indexDir)
    assert(spark.read.parquet(s"$indexDir/cells")
      .select(col("seg")).distinct().as[String].collect().toSeq === Seq("base"))
    assert(cellCount() === nAfter, "compaction must preserve the folded cells")
    val v3 = graft.streaming.SemanticProbeStream.process(
      Seq((3L, Array(0.02f, 0f, 0.99f, 0f))).toDF("vec_id", "embedding"),
      "r3", batchId = 0L, indexDir, outDir, minCos = 0.9, nprobe = 2)
    assert(v3 === Map("semantic_dup_index" -> 1L),
      "compaction must not change probe verdicts")
    intercept[IllegalArgumentException] {
      Similarity.ivfFlatAppend(novelDoc, indexDir, "base")
    }
  }

  test("in-horizon semantic pairs: paraphrase pair detected, out-of-horizon copy " +
    "passes, state expires; cell assignment ≡ ivfAssign in batch mode") {
    import graft.operators.Similarity
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Array[Float])]
    // static pretrained centroids (two well-separated cells)
    val sample = Seq(
      (100L, Array(1.0f, 0.05f, 0f, 0f)), (101L, Array(0.95f, 0f, 0.05f, 0f)),
      (102L, Array(0f, 1.0f, 0f, 0.05f)), (103L, Array(0.05f, 0.95f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.ivfTrain(sample, k = 2, iters = 2)
    val pairs = Similarity.semanticPairsStreaming(
      mem.toDF().toDF("ts", "vec_id", "embedding"), cents, "ts",
      within = "10 minutes", maxLateness = "5 minutes", minCos = 0.95)
    val q = pairs.writeStream.outputMode("append").format("memory")
      .queryName("sem_pairs_out").start()
    try {
      def ts(min: Int) = Timestamp.from(
        Timestamp.valueOf("2024-01-01 10:00:00").toInstant.plusSeconds(min * 60L))
      val vA = Array(1.0f, 0.04f, 0f, 0f)
      val vA2 = Array(0.99f, 0.05f, 0.01f, 0f) // paraphrase of vA (cos ≈ 1)
      val vB = Array(0f, 0.99f, 0.02f, 0f)     // other cell
      mem.addData((ts(0), 1L, vA), (ts(2), 2L, vA2), // in-horizon pair
        (ts(3), 3L, vB),                             // different cell → no pair
        (ts(180), 4L, vA))                           // copy of 1, 3h away → passes
      q.processAllAvailable()
      mem.addData((ts(360), 5L, Array(0f, 0f, 0f, 1.0f)))
      q.processAllAvailable()
      mem.addData((ts(400), 6L, Array(0f, 0f, 1.0f, 0f)))
      q.processAllAvailable()
      val got = spark.table("sem_pairs_out")
        .select("id_a", "id_b").distinct().as[(Long, Long)].collect().toSet
      assert(got === Set((1L, 2L)),
        s"expected exactly the in-horizon paraphrase pair, got $got")
      val removed = q.recentProgress.flatMap(_.stateOperators.map(_.numRowsRemoved)).sum
      assert(removed > 0L, "watermark never expired any join state rows")
    } finally q.stop()
    // batch-mode: the per-row least-of-structs assignment is
    // value-identical to ivfAssign under the same centroids
    val batch = Seq(
      (Timestamp.valueOf("2024-01-01 10:00:00"), 10L, Array(0.9f, 0.1f, 0f, 0f)),
      (Timestamp.valueOf("2024-01-01 10:00:00"), 11L, Array(0.1f, 0.9f, 0f, 0.1f)),
      (Timestamp.valueOf("2024-01-01 10:00:00"), 12L, Array(0.5f, 0.5f, 0f, 0f)))
      .toDF("ts", "vec_id", "embedding")
    val streamed = Similarity.semanticPairsStreaming(batch, cents, "ts",
        "1 hour", "5 minutes", minCos = -1.0)
      .select("id_a", "cell").distinct()
      .union(Similarity.semanticPairsStreaming(batch, cents, "ts",
        "1 hour", "5 minutes", minCos = -1.0).select("id_b", "cell").distinct())
      .distinct().as[(Long, Long)].collect().toMap
    val direct = Similarity.ivfAssign(batch, cents)
      .select(col("vec_id"), col("cell").cast("long"))
      .as[(Long, Long)].collect().toMap
    streamed.foreach { case (id, cell) =>
      assert(direct(id) === cell, s"cell assignment diverged for $id")
    }
    assert(streamed.nonEmpty)
  }

  test("image probe: perceptual duplicates of INDEXED images caught in-stream, " +
    "lifecycle (append replay + compact) transparent, exactly-once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Multimodal
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("img_probe").toString
    val (indexDir, outDir) = (s"$dir/index", s"$dir/out")
    // lifecycle: base segment ids < 50, appended segment 50..99
    // (appended TWICE — at-least-once replay must fold away), compact
    val ids = (0L until 100L).toDF("doc_id")
    Multimodal.buildImageIndex(
      Multimodal.syntheticJpegAHashBlobs(ids.filter(col("doc_id") < 50)), indexDir)
    val delta = Multimodal.syntheticJpegAHashBlobs(
      ids.filter(col("doc_id") >= 50))
    Multimodal.appendImageIndex(delta, indexDir, "d1")
    Multimodal.appendImageIndex(delta, indexDir, "d1") // replay
    Multimodal.compactImageIndex(spark, indexDir)
    val stored = Multimodal.readImageIndex(spark, indexDir)
    assert(stored.count() === 100L, "replayed append must fold away")
    assert(spark.read.parquet(indexDir).select("seg").distinct()
      .as[String].collect().toSeq === Seq("base"), "compact must fold segments")
    // probe payloads: id 500 ≡ 16 (mod 121) — its fixture bytes are
    // IDENTICAL to indexed id 16 (the dc field cycles mod 121), a
    // guaranteed exact dup; a hand-made checkerboard JPEG whose
    // verdict the BATCH probe adjudicates (stream must agree); and a
    // garbage payload the decode gate refuses
    val dup = Multimodal.syntheticJpegAHashBlobs(Seq(500L).toDF("doc_id"))
      .select("blob").head().getAs[Array[Byte]](0)
    def checker(c: Int, bx: Int, by: Int): Array[Int] = {
      val a = new Array[Int](64)
      a(0) = if ((bx + by) % 2 == 0) 50 else -50
      a
    }
    val board = Multimodal.jpegAssemble(64, 64, 0, checker)
    val junk = Array.tabulate[Byte](64)(i => (i * 37 + 5).toByte)
    // batch adjudication of the checkerboard's expected verdict
    val boardHash = Multimodal.bmpAHash(board, 8).get._3
    val boardMatches = Multimodal.aHashProbe(
      Seq((600L, boardHash)).toDF("doc_id", "ahash"), stored, maxDistance = 1)
    val expectBoard =
      if (boardMatches.filter(col("hamming") === 0).count() > 0) "dup_exact_image"
      else if (boardMatches.count() > 0) "dup_near_image"
      else "unique"
    def verdicts(): Map[Long, String] =
      spark.read.parquet(outDir).select("doc_id", "verdict")
        .as[(Long, String)].collect().toMap
    val mem = MemoryStream[(Long, Array[Byte])]
    val q = graft.streaming.ImageProbeStream.start(
      mem.toDF().toDF("doc_id", "blob"), "r1", indexDir, outDir,
      s"$dir/ckpt", maxDistance = 1)
    try {
      mem.addData((500L, dup), (600L, board), (700L, junk))
      q.processAllAvailable()
    } finally q.stop()
    assert(verdicts() === Map(500L -> "dup_exact_image", 600L -> expectBoard,
      700L -> "undecodable"), s"got ${verdicts()}")
    // exactly-once: replaying the SAME (run, batch) — a post-crash
    // restart — overwrites its own partition, never double-appends
    graft.streaming.ImageProbeStream.process(
      Seq((500L, dup), (600L, board), (700L, junk)).toDF("doc_id", "blob"),
      "r1", batchId = 0L, indexDir, outDir, maxDistance = 1)
    val rows = spark.read.parquet(outDir).select("doc_id").as[Long].collect()
    assert(rows.length === 3 && rows.toSet === Set(500L, 600L, 700L),
      s"replayed batch must not double-append, got ${rows.toSeq.sorted}")
    // a fresh run against the same out dir: new verdicts join old ones
    val mem2 = MemoryStream[(Long, Array[Byte])]
    val q2 = graft.streaming.ImageProbeStream.start(
      mem2.toDF().toDF("doc_id", "blob"), "r2", indexDir, outDir,
      s"$dir/ckpt2", maxDistance = 1)
    try {
      // id 621 ≡ 16 (mod 121): another guaranteed exact dup
      mem2.addData((621L, Multimodal.syntheticJpegAHashBlobs(
        Seq(621L).toDF("doc_id")).select("blob").head().getAs[Array[Byte]](0)))
      q2.processAllAvailable()
    } finally q2.stop()
    val all = verdicts()
    assert(all(621L) === "dup_exact_image" && all.size === 4, s"got $all")
  }
}
