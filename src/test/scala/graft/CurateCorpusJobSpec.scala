package graft

import org.apache.spark.sql.functions._

import graft.jobs.CurateCorpusJob
import graft.operators.Dedup

/** End-to-end proof for the flagship curation pipeline: it must run to
  * completion on real testdata and its stats must partition the input.
  */
class CurateCorpusJobSpec extends SparkSpec {
  import spark.implicits._

  test("curate runs end-to-end on sf0.001 and stats partition the input") {
    val result = CurateCorpusJob.curate(spark, sf)
    val (out, stats) = (result.docs, result.stats)
    val n = out.count()
    assert(stats.input > 0)
    assert(n === stats.kept)
    assert(stats.input === stats.lowQuality + stats.exactDups + stats.nearDups + stats.kept,
      s"stats do not partition the input: $stats")
    assert(stats.kept > 0 && stats.kept <= stats.input)
    assert(out.columns.contains("fp"))
    assert(out.select("doc_id").distinct().count() === n)
  }

  test("curated output contains no exact duplicate texts") {
    val out = CurateCorpusJob.curate(spark, sf).docs
    val dupGroups = out.groupBy(md5(col("text").cast("binary"))).count()
      .filter(col("count") > 1).count()
    assert(dupGroups === 0L)
  }

  test("span-strip mode removes cross-doc repeated passages from kept docs") {
    val plain = CurateCorpusJob.curate(spark, sf)
    val stripped = CurateCorpusJob.curate(spark, sf, stripSpanTokens = 8)
    // same docs survive (strip follows the keep/drop decisions)...
    assert(stripped.stats === plain.stats)
    assert(stripped.docs.columns.sorted === plain.docs.columns.sorted)
    // ...but no cross-doc repeated 8-token span remains in the output
    val remaining = Dedup.repeatedSpans(
      stripped.docs.select("doc_id", "text"), spanTokens = 8).count()
    assert(remaining === 0L,
      s"$remaining docs still share an 8-token span after strip")
  }

  test("exact-components mode drops at least the linear pass's near-dups") {
    val linear = CurateCorpusJob.curate(spark, sf).stats
    val ccResult = CurateCorpusJob.curate(spark, sf, exactComponents = true)
    val (outCc, cc) = (ccResult.docs, ccResult.stats)
    // every pair's doc_b is a non-representative in its component, so
    // CC-dropped ⊇ linear-dropped
    assert(cc.nearDups >= linear.nearDups)
    assert(cc.kept === outCc.count())
    assert(cc.input === cc.lowQuality + cc.exactDups + cc.nearDups + cc.kept)
  }

  test("streaming curation: quality gate + in-horizon dedup + fingerprints") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val goodText = ("the quick brown fox jumps over a lazy dog and then " * 4).trim
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ts", "doc_id", "text")
    val out = graft.jobs.CurateStreamJob.curated(docs, "ts", "10 minutes", minQuality = 500)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("curate_stream_out").start()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    mem.addData(
      (t0, 1L, goodText),          // passes gate
      (t0, 2L, "a a a a a"),       // degenerate: fails every quality heuristic
      (t0, 3L, goodText))          // duplicate of 1 within horizon
    q.processAllAvailable()
    val got = spark.table("curate_stream_out")
    val ids = got.select("doc_id").as[Long].collect().toSet
    assert(ids === Set(1L))
    assert(got.columns.contains("fp") && got.columns.contains("text_hash"))
    q.stop()
  }

  test("streaming curation parquet sink survives restart without duplicates") {
    // file source + checkpoint = the real restart contract (a
    // MemoryStream is not replayable across restarts)
    val goodText = ("the quick brown fox jumps over a lazy dog and then " * 4).trim
    val inDir = java.nio.file.Files.createTempDirectory("curate_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("curate_out").toString + "/out"
    val ckpt = java.nio.file.Files.createTempDirectory("curate_ckpt").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def drop(id: Long, text: String): Unit =
      Seq((t0, id, text)).toDF("ts", "doc_id", "text")
        .write.mode("append").parquet(inDir)
    def run(): Unit = {
      val schema = spark.read.parquet(inDir).schema
      val docs = spark.readStream.schema(schema).parquet(inDir)
      val q = graft.jobs.CurateStreamJob.start(
        graft.jobs.CurateStreamJob.curated(docs, "ts", "10 minutes", 500), outDir, ckpt)
      q.processAllAvailable()
      q.stop()
    }
    drop(1L, goodText + " one")
    run()
    drop(2L, goodText + " two")
    run() // restart from the same checkpoint: batch 0 must not re-emit
    val ids = spark.read.parquet(outDir).select("doc_id").as[Long].collect().sorted
    assert(ids.sameElements(Array(1L, 2L)))
  }

  test("jaccardPairs refuses empty blocking columns") {
    val d = Seq((1L, "a b c")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](Dedup.jaccardPairs(d, Seq.empty, 900))
    assert(e.getMessage.contains("blocking"))
  }

  test("jaccardVerify scores an explicit candidate-pair set") {
    val d = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "w x y z"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("doc_a", "doc_b")
    val v = Dedup.jaccardVerify(d, pairs, 900).collect()
    assert(v.length === 1)
    assert(v.head.getAs[Long]("doc_a") === 1L && v.head.getAs[Long]("doc_b") === 2L)
    assert(v.head.getAs[Long]("jac_permille") === 1000L)
  }
}
