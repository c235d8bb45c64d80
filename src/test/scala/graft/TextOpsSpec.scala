package graft

import org.apache.spark.sql.functions._

import graft.operators.{Corpus, Dedup, TextAnalysis}

/** Semantics of the round-3 text operators: char shingles (code-point
  * counted), char-ngram near-dup pairs, bigram fluency, contamination
  * report. Cross-engine equality is covered by the oracle queries;
  * these pin edge cases the oracle data doesn't hit.
  */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("fitLinear recovers an exact linear relation as exact rationals") {
    // y = 3 + 2·x1 + 5·x2 exactly, non-collinear points → unique exact
    // solution: each numerator must be weight × denominator, as BigInt
    val pts = Seq((3L, 0L, 0L), (5L, 1L, 0L), (8L, 0L, 1L), (22L, 2L, 3L))
      .toDF("y", "x1", "x2")
    val m = TextAnalysis.fitLinear(pts, col("y"), col("x1"), col("x2"))
      .collect().map(r => r.getString(0) -> (BigInt(r.getString(1)), BigInt(r.getString(2))))
      .toMap
    assert(m("intercept")._2 > 0)
    assert(m("intercept")._1 === m("intercept")._2 * 3)
    assert(m("x1")._1 === m("x1")._2 * 2)
    assert(m("x2")._1 === m("x2")._2 * 5)
  }

  test("fitLinear on collinear features yields w_den = 0, not a wrong answer") {
    val pts = Seq((1L, 1L, 2L), (2L, 2L, 4L), (3L, 3L, 6L)).toDF("y", "x1", "x2")
    val dens = TextAnalysis.fitLinear(pts, col("y"), col("x1"), col("x2"))
      .select("w_den").as[String].collect()
    assert(dens.forall(_ == "0"))
  }

  test("linearResiduals: zero on an exact relation, flags an injected outlier") {
    val exact = Seq((1L, 3L, 0L, 0L), (2L, 5L, 1L, 0L), (3L, 8L, 0L, 1L), (4L, 22L, 2L, 3L))
      .toDF("doc_id", "y", "x1", "x2")
    val r0 = TextAnalysis.linearResiduals(exact, col("y"), col("x1"), col("x2"))
      .select("resid").as[String].collect()
    assert(r0.forall(_ == "0"))
    // an outlier makes SOME residual nonzero, and its own |resid| the largest
    val noisy = exact.union(Seq((5L, 1000L, 1L, 1L)).toDF("doc_id", "y", "x1", "x2"))
    val r1 = TextAnalysis.linearResiduals(noisy, col("y"), col("x1"), col("x2"))
      .collect().map(r => r.getLong(0) -> BigInt(r.getString(1)).abs).toMap
    assert(r1.values.exists(_ > 0))
    assert(r1.maxBy(_._2)._1 === 5L)
  }

  test("mojibake counts replacement and Latin-1 marker chars; clean text scores zero") {
    val df = Seq(
      (1L, "cafÃ© normal"),   // the UTF-8 é read as Latin-1: one Ã marker
      (2L, "plain ascii"),
      (3L, "��"),             // decoder gave up twice
      (4L, "")                // zero-length guard
    ).toDF("doc_id", "text")
    val m = TextAnalysis.mojibake(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(m(1L) === ((12L, 0L, 1L, 83L)))   // floor(1000/12)
    assert(m(2L) === ((11L, 0L, 0L, 0L)))
    assert(m(3L) === ((2L, 2L, 0L, 1000L)))
    assert(m(4L) === ((0L, 0L, 0L, 0L)))
  }

  test("char_shingles: code-point counted, short text → empty") {
    import graft.functions.CharShingles.char_shingles
    graft.plans.GraftExtensions.register(spark)
    val got = Seq(("abcd", 1L), ("ab", 2L), ("héllo", 3L)).toDF("t", "id")
      .select(col("id"), char_shingles(col("t"), 3).as("g"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) === Seq("abc", "bcd"))
    assert(got(2L) === Seq.empty)            // shorter than k
    assert(got(3L) === Seq("hél", "éll", "llo")) // chars, not bytes
  }

  test("char_shingles rejects non-positive and null k at analysis time") {
    graft.plans.GraftExtensions.register(spark)
    val df = Seq("abc").toDF("t")
    for (bad <- Seq("0", "-1", "CAST(NULL AS INT)")) {
      val e = intercept[org.apache.spark.sql.AnalysisException](
        df.selectExpr(s"char_shingles(t, $bad)").collect())
      assert(e.getMessage.contains("positive"), s"k=$bad: ${e.getMessage.take(200)}")
    }
  }

  test("charNgramPairs catches a punctuation edit word-level misses") {
    val a = "the quick brown fox jumps over the lazy dog near a riverbank today"
    val b = a.replace("dog near", "dog, near") // one comma inserted
    val docs = Seq((1L, a, "s"), (2L, b, "s"), (3L, "completely different text here", "s"))
      .toDF("doc_id", "text", "src")
    val charPairs = Dedup.charNgramPairs(docs, Seq("src"), thresholdPermille = 800, k = 5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(charPairs === Set((1L, 2L)))
    // word-level at the same bar: "dog," and "near" vs "dog" "near" differ
    val wordPairs = Dedup.jaccardPairs(docs, Seq("src"), thresholdPermille = 950)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(!wordPairs.contains((1L, 2L)))
  }

  test("zipfFit: an exact-Zipf corpus fits slope ≈ −1; a uniform corpus fits ≈ 0") {
    // token i appears ⌊40/i⌋ times → c ≈ 40/r → ln c = ln 40 − ln r
    val zipfText = (1 to 8).flatMap(i => Seq.fill(40 / i)(s"w$i")).mkString(" ")
    val uniText = (1 to 8).flatMap(i => Seq.fill(5)(s"u$i")).mkString(" ")
    val df = Seq((1L, "zipf", zipfText), (2L, "flat", uniText))
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.zipfFit(df)
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("zipf")._1 === 8L)
    assert(got("zipf")._2 > -1.15 && got("zipf")._2 < -0.85, got.toString)
    // equal counts: y constant → slope 0 exactly
    assert(got("flat")._2 === 0.0, got.toString)
  }

  test("pmiTop: hand-checked collocation, exact integer ranking, hapax floor") {
    // "aa bb" ×5 is the only bigram at the count floor; cc-pairs are
    // hapax and must drop. N = 20 tokens, c(aa)=c(bb)=5:
    // ratio = 5·20·10⁶/25 = 4·10⁶, pmi = ln 100 − ln 25 = ln 4
    val df = Seq((1L,
      "aa bb aa bb aa bb aa bb aa bb cc dd cc ee cc ff cc gg cc hh"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.pmiTop(df, k = 10, minCount = 5)
      .as[(String, String, Long, Long, Double)].collect()
    assert(got.length === 1)
    val (w1, w2, cab, ratio, pmi) = got.head
    assert((w1, w2, cab, ratio) === (("aa", "bb", 5L, 4000000L)))
    assert(pmi === math.rint((math.log(100) - math.log(25)) * 1e4) / 1e4)
  }

  test("editDistancePairs: one-typo pair found with exact distance; unrelated and length-gapped excluded") {
    val a = "the quick brown fox jumps over the lazy dog near a riverbank today"
    val docs = Seq(
      (1L, a),
      (2L, a.replace("quick", "quikc")),     // transposition: dist 2
      (3L, "completely different text with nothing shared at all here"),
      (4L, a + " " + ("padding " * 20).trim) // same prefix, length gap ≫ maxDist
    ).toDF("doc_id", "text").withColumn("src", lit("s"))
    val got = Dedup.editDistancePairs(docs, Seq("src"), maxDist = 3, k = 5)
      .pairs.select("doc_a", "doc_b", "dist").as[(Long, Long, Long)].collect()
    assert(got.toSet === Set((1L, 2L, 2L)), got.mkString(","))
  }

  test("bigramFluency: repeated transitions score high, unique ones low") {
    val docs = Seq(
      (1L, "a b a b a b"),   // transitions a-b / b-a dominate the corpus
      (2L, "a b a b"),
      (3L, "x y")            // unique transition → mean_freq 1
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bigramFluency(docs)
      .select("doc_id", "mean_freq").as[(Long, Long)].collect().toMap
    assert(got(3L) === 1L)
    assert(got(1L) > got(3L) && got(2L) > got(3L))
    // a one-token doc has no transitions and is absent
    assert(!TextAnalysis.bigramFluency(Seq((9L, "solo")).toDF("doc_id", "text"))
      .select("doc_id").as[Long].collect().contains(9L))
  }

  test("contaminationReport: permille math, zero-hit docs included, repeats count once") {
    val evals = Seq((100L, "e1 e2 e3 e4")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "e1 e2 e3 w1 w2"),             // grams: e1e2e3(hit), e2e3w1, e3w1w2, w1w2? n=3: e1e2e3 hit of 3 grams
      (2L, "clean text with no overlap"),
      (3L, "e1 e2 e3 e1 e2 e3 e1 e2 e3")  // leaked gram repeated — distinct per doc
    ).toDF("doc_id", "text")
    val got = Corpus.contaminationReport(train, evals, n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L)._1 === 3L && got(1L)._2 === 1L && got(1L)._3 === 333L)
    assert(got(2L)._2 === 0L && got(2L)._3 === 0L)
    // doc 3: grams {e1e2e3, e2e3e1, e3e1e2} distinct → 3 grams, 1 contaminated
    assert(got(3L)._1 === 3L && got(3L)._2 === 1L && got(3L)._3 === 333L)
  }

  test("modelQualityScore: exact integer logit, threshold keep, unknown feature rejected") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // "the aa bb" → n_tokens=3, n_distinct=3, n_stop=1,
    // mean_tok_len = floor(7*1000/3)=2333, stop=333, distinct=1000
    val docs = Seq((1L, "the aa bb")).toDF("doc_id", "text")
    val out = TextAnalysis.modelQualityScore(docs,
        Map("n_tokens" -> 10L, "stop_permille" -> 2L), biasBp = -500L)
      .select("logit_bp", "keep").as[(Long, Long)].collect().head
    assert(out._1 === -500L + 10L * 3 + 2L * 333) // = 196
    assert(out._2 === 1L)
    val strict = TextAnalysis.modelQualityScore(docs,
        Map("n_tokens" -> 10L), biasBp = -500L)
      .select("logit_bp", "keep").as[(Long, Long)].collect().head
    assert(strict._1 === -470L && strict._2 === 0L)
    intercept[IllegalArgumentException] {
      TextAnalysis.modelQualityScore(docs, Map("nope" -> 1L), 0L)
    }
  }

  test("merge_pair ≡ the aggregate-lambda SQL form (hand cases + randomized)") {
    import graft.functions.MergePair.merge_pair
    graft.plans.GraftExtensions.register(spark)
    def sqlForm(l: String, r: String): String = {
      def q(s: String) = "'" + s.replace("'", "''") + "'"
      s"aggregate(syms, CAST(array() AS array<string>), (acc, s) -> " +
        s"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = ${q(l)} AND s = ${q(r)} " +
        s"THEN concat(slice(acc, 1, size(acc) - 1), array(concat(${q(l)}, ${q(r)}))) " +
        s"ELSE concat(acc, array(s)) END)"
    }
    // hand cases: cascade re-eligibility, overlap greediness, no-op
    val hand = Seq(
      (Seq("a", "a", "a"), "a", "a", Seq("aa", "a")),
      (Seq("a", "a", "a", "a"), "a", "a", Seq("aa", "aa")),
      (Seq("aa", "a"), "aa", "a", Seq("aaa")),
      (Seq("x", "y", "x", "y"), "x", "y", Seq("xy", "xy")),
      (Seq("x"), "x", "x", Seq("x")),
      (Seq.empty[String], "x", "y", Seq.empty[String]))
    for ((in, l, r, want) <- hand) {
      val got = Seq(Tuple1(in)).toDF("syms")
        .select(merge_pair(col("syms"), l, r).as("m"))
        .as[Seq[String]].head()
      assert(got === want, s"in=$in l=$l r=$r")
    }
    // randomized differential vs the SQL lambda over a 3-symbol
    // alphabet (forces adjacent collisions), incl. quote-bearing syms
    val rnd = new scala.util.Random(4041)
    val alphabet = Seq("a", "b", "a'b")
    val rows = Seq.fill(300)(Seq.fill(2 + rnd.nextInt(10))(
      alphabet(rnd.nextInt(alphabet.length))))
    for (l <- alphabet; r <- alphabet) {
      val df = rows.map(Tuple1(_)).toDF("syms")
      val native = df.select(merge_pair(col("syms"), l, r).as("m"))
        .as[Seq[String]].collect().toSeq
      val viaSql = df.select(expr(sqlForm(l, r)).as("m"))
        .as[Seq[String]].collect().toSeq
      assert(native === viaSql, s"l=$l r=$r")
    }
  }

  test("merge_pair: null array elements pass through unmatched, no NPE") {
    graft.plans.GraftExtensions.register(spark)
    // SQL callers can hand array('a', NULL, ...): a null element must
    // behave like an unrelated symbol (break any straddle, survive in
    // place), not crash the executor scan loop
    val got = spark.sql(
      "SELECT merge_pair(array('a', NULL, 'a', 'a', NULL), 'a', 'a') AS m")
      .head().getSeq[String](0)
    assert(got === Seq("a", null, "aa", null), s"got $got")
    // null must not bridge an (l, r) pair across itself
    val split = spark.sql(
      "SELECT merge_pair(array('x', NULL, 'y'), 'x', 'y') AS m")
      .head().getSeq[String](0)
    assert(split === Seq("x", null, "y"), s"got $split")
  }

  test("lexicalStats: entropy 0 for one repeated token, ln n for all-distinct") {
    val df = Seq(
      (1L, "a a a a"),     // one type → H = 0
      (2L, "a b c d"),     // uniform over 4 → H = ln 4
      (3L, "a a b b"),     // uniform over 2 → H = ln 2
      (4L, "")             // empty → dropped
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lexicalStats(df).orderBy("doc_id")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(out.length === 3)
    assert(out(0) === ((1L, 4L, 1L, 250L, 0.0)))
    assert(out(1) === ((2L, 4L, 4L, 1000L, math.rint(math.log(4) * 1e4) / 1e4)))
    assert(out(2) === ((3L, 4L, 2L, 500L, math.rint(math.log(2) * 1e4) / 1e4)))
  }

  test("bigramPerplexity: add-one bigram LM matches hand computation") {
    // corpus: "a b", "a b", "a c", "z" — unigrams a:3 b:2 c:1 z:1 → V=4
    // bigram counts: (a b):2, (a c):1
    // doc 1/2 "a b": nll = ln(c1(a)+V) − ln(c12+1) = ln 7 − ln 3
    // doc 3  "a c": ln 7 − ln 2; doc 4 "z" has no bigrams → dropped
    val df = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "z"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramPerplexity(df).orderBy("doc_id")
      .as[(Long, Long, Double, Double)].collect()
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L))
    def q4(x: Double) = math.rint(x * 1e4) / 1e4
    val nllAB = math.log(7) - math.log(3)
    val nllAC = math.log(7) - math.log(2)
    assert(out(0)._2 === 1L && out(0)._3 === q4(nllAB) && out(0)._4 === q4(math.exp(nllAB)))
    assert(out(1)._3 === q4(nllAB))
    assert(out(2)._3 === q4(nllAC) && out(2)._4 === q4(math.exp(nllAC)))
    // higher-probability transition ⇒ lower perplexity
    assert(out(0)._4 < out(2)._4)
  }

  test("knPerplexity: interpolated Kneser-Ney matches hand computation and sums to one") {
    // corpus: "a b a b", "b a" → bigram types (a b):2, (b a):2, B = 2
    // context a: c1 = 2, N1+(a·) = 1; context b: c1 = 2, N1+(b·) = 1
    // continuation: N1+(·a) = 1, N1+(·b) = 1
    // every seen transition: p = (2−3/4)/2 + (3/4·1/2)·(1/2) = 13/16
    //   (integer form: num = (4·2−3)·2 + 3·1·1 = 13, den = 4·2·2 = 16)
    // conditional sums to 1: p(b|a) = 13/16, p(a|a) = λ(a)·pc(a) = 3/16
    val df = Seq((1L, "a b a b"), (2L, "b a")).toDF("doc_id", "text")
    val out = TextAnalysis.knPerplexity(df).orderBy("doc_id")
      .as[(Long, Long, Double, Double)].collect()
    def q4(x: Double) = math.rint(x * 1e4) / 1e4
    val nll = math.log(16.0) - math.log(13.0)
    assert(out.map(_._1).toSeq === Seq(1L, 2L))
    assert(out(0)._2 === 3L && out(1)._2 === 1L)
    assert(out(0)._3 === q4(nll) && out(1)._3 === q4(nll))
    assert(out(0)._4 === q4(math.exp(nll)))
  }

  test("knPerplexity ranks a collocation-bound word worse than add-one does") {
    // "san francisco" repeated makes `francisco` frequent but only
    // ever after `san`; a doc pairing it with a fresh context should
    // score WORSE (higher nll) under KN than the same doc under a
    // naive frequency measure ranks it. Pin the semantics: the unseen
    // -context transition's probability uses continuation mass only.
    val df = Seq(
      (1L, "san francisco san francisco san francisco"),
      (2L, "new francisco")).toDF("doc_id", "text")
    val out = TextAnalysis.knPerplexity(df).orderBy("doc_id")
      .as[(Long, Long, Double, Double)].collect()
    // doc 2's single bigram (new francisco) is a seen type (it IS in
    // the corpus) but with c12 = 1 vs doc 1's dominant types — KN
    // must rank doc 2 less fluent
    assert(out(0)._4 < out(1)._4)
  }

  test("stupidBackoff: all four tiers fire with hand-checked scores on a held-out split") {
    // train (even ids): "a b c a b d", "a b c" → N = 9
    //   unigrams a:3 b:3 c:2 d:1; bigrams "a b":3 "b c":2 "c a":1 "b d":1
    //   trigrams "a b c":2, "b c a":1, "c a b":1, "a b d":1
    // score (odd ids):
    //   doc 1 "a b c x": "a b c" tier1 (ln3−ln2); "b c x" OOV tier4
    //   doc 3 "d c a":   "d c a" tier2 via c("c a")=1, c(c)=2
    //   doc 5 "x d b":   "x d b" tier3 via c(b)=3
    val df = Seq((0L, "a b c a b d"), (2L, "a b c"),
      (1L, "a b c x"), (3L, "d c a"), (5L, "x d b")).toDF("doc_id", "text")
    val out = TextAnalysis.stupidBackoff(df).orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long, Double, Double)].collect()
    def q4(x: Double) = math.rint(x * 1e4) / 1e4
    val bo = math.log(5) - math.log(2)
    assert(out.map(_._1).toSeq === Seq(1L, 3L, 5L))
    // doc 1: 2 trigrams, 1 trigram hit, 1 OOV
    assert(out(0)._2 === 2L && out(0)._3 === 1L && out(0)._6 === 1L)
    assert(out(0)._7 === q4(((math.log(3) - math.log(2)) + (bo * 3 + math.log(9))) / 2))
    // doc 3: bigram-tier backoff
    assert(out(1)._4 === 1L)
    assert(out(1)._7 === q4(bo + (math.log(2) - math.log(1))))
    // doc 5: unigram-tier backoff
    assert(out(2)._5 === 1L)
    assert(out(2)._7 === q4(bo * 2 + (math.log(9) - math.log(3))))
  }

  test("perplexityBuckets: equal bands per stratum, tail is the worst band, keep drops it") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val out = TextAnalysis.perplexityBuckets(docs)
      .select("doc_id", "source", "ppl_q4", "bucket", "keep")
      .as[(Long, String, Double, Long, Boolean)].collect()
    assert(out.nonEmpty)
    // every scored doc in exactly one band 1..3; keep ⟺ not tail
    assert(out.forall(r => r._4 >= 1 && r._4 <= 3))
    assert(out.forall(r => r._5 === (r._4 < 3)))
    out.groupBy(_._2).foreach { case (src, rows) =>
      // equal-population bands (sizes differ by at most 1)
      val sizes = rows.groupBy(_._4).view.mapValues(_.length).values.toSeq
      assert(sizes.max - sizes.min <= 1, s"$src band sizes $sizes")
      // bands are ordered by perplexity: max(head) ≤ min(tail) etc.
      val byBand = rows.groupBy(_._4).view.mapValues(_.map(_._3)).toMap
      for (b <- 1L until 3L if byBand.contains(b) && byBand.contains(b + 1))
        assert(byBand(b).max <= byBand(b + 1).min + 1e-9, s"$src band $b order")
    }
    // the filter actually discriminates: dropped docs are more
    // perplexing on average than kept ones
    val (kept, dropped) = out.partition(_._5)
    assert(kept.map(_._3).sum / kept.length < dropped.map(_._3).sum / dropped.length)
  }

  test("wordpiece: fold ≡ driver greedy reference on random words; fertility bounded") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val vocab = TextAnalysis.wordpieceVocab(docs)
    val vset = vocab.select("piece").as[String].collect().toSet
    assert(vset.exists(_.length > 1), "top-k must include multi-char pieces")
    def ref(word: String): Long = {
      var pos = 0; var cnt = 0L
      while (pos < word.length) {
        val l = (4 to 1 by -1).find(l =>
          pos + l <= word.length && vset(word.substring(pos, pos + l))).getOrElse(1)
        pos += l; cnt += 1
      }
      cnt
    }
    // differential: random words (some with chars outside the corpus
    // alphabet — the unk path) against the distributed fold
    val rnd = new scala.util.Random(7)
    val alphabet = "abcdefgh_z"
    val words = (1 to 80).map(_ =>
      (1 to (1 + rnd.nextInt(12))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
      .distinct
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val got = TextAnalysis.wordpieceEncode(df, vocab)
      .select("doc_id", "n_wp_tokens").as[(Long, Long)].collect().toMap
    words.zipWithIndex.foreach { case (w, i) =>
      assert(got(i.toLong) === ref(w), s"greedy fold diverged on '$w'")
    }
    // corpus-wide fertility bounds: every word ≥ 1 token, every token ≥ 1 char
    val enc = TextAnalysis.wordpieceEncode(docs, vocab)
      .select("n_words", "n_wp_tokens", "n_chars")
      .as[(Long, Long, Long)].collect()
    enc.foreach { case (nw, nt, nc) => assert(nw <= nt && nt <= nc) }
    // the learned pieces actually compress: corpus-wide tokens < chars
    assert(enc.map(_._2).sum < enc.map(_._3).sum)
  }

  test("langSpans: a half-and-half doc splits at the boundary; pure docs get one span") {
    val aTok = "alpha beta gamma delta"
    val bTok = "omega sigma theta kappa"
    val docs = (
      (1 to 5).map(i => (i.toLong, "a", ((aTok + " ") * 5).trim)) ++
      (6 to 10).map(i => (i.toLong, "b", ((bTok + " ") * 5).trim)) ++
      Seq((11L, "a", ((aTok + " ") * 5) + ((bTok + " ") * 5).trim))
    ).toDF("doc_id", "lang", "text")
    // profileSize 4 keeps each profile to its own language's tokens
    // (doc 11's label-a contamination counts 5 vs the real tokens' 30)
    val spans = TextAnalysis.langSpans(docs, profileSize = 4, windowTokens = 10)
      .select("doc_id", "span_lang", "win_start", "win_end", "n_windows")
      .as[(Long, String, Long, Long, Long)].collect()
    // the 40-token mixed doc: windows 0-1 are language a, 2-3 are b
    val mixed = spans.filter(_._1 == 11L).sortBy(_._3).toSeq
    assert(mixed === Seq((11L, "a", 0L, 1L, 2L), (11L, "b", 2L, 3L, 2L)))
    // pure docs: exactly one span, the right language, covering all windows
    for (id <- Seq(1L, 6L)) {
      val s = spans.filter(_._1 == id).toSeq
      assert(s.length === 1, s"doc $id spans $s")
      assert(s.head._2 === (if (id <= 5) "a" else "b"))
      assert(s.head._3 === 0L && s.head._4 === 1L && s.head._5 === 2L)
    }
  }

  test("langSpansNarrow ≡ langSpans on real docs; streams through MemoryStream unchanged") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = graft.sources.Tables.documents(spark, sf)
    val profMap = TextAnalysis.langProfile(docs, 20)
    val narrow = TextAnalysis.explodeSpans(TextAnalysis.langSpansNarrow(docs, profMap, 10))
      .select("doc_id", "span_lang", "win_start", "win_end", "n_windows")
      .as[(Long, String, Long, Long, Long)].collect().toSet
    val batch = TextAnalysis.langSpans(docs, 20, 10)
      .select("doc_id", "span_lang", "win_start", "win_end", "n_windows")
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(narrow === batch, "narrow in-row segmentation must equal the shuffled form")
    assert(narrow.nonEmpty)
    // streaming: two live micro-batches produce exactly the batch spans
    val rows = docs.limit(40).select("doc_id", "text").as[(Long, String)].collect().toSeq
    val mem = MemoryStream[(Long, String)]
    val q = TextAnalysis.explodeSpans(TextAnalysis.langSpansNarrow(
        mem.toDF.toDF("doc_id", "text"), profMap, 10))
      .writeStream.outputMode("append").format("memory")
      .queryName("lang_spans_stream").start()
    mem.addData(rows.take(20): _*); q.processAllAvailable()
    mem.addData(rows.drop(20): _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("lang_spans_stream")
      .as[(Long, String, Long, Long, Long)].collect().toSet
    val ids = rows.map(_._1).toSet
    assert(streamed === batch.filter(s => ids(s._1)))
  }

  test("positional wordpiece: start/continuation classes split; fold ≡ reference") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val vocab = TextAnalysis.wordpieceVocabPositional(docs)
    val rows = vocab.select("piece", "at_start").as[(String, Long)].collect()
    val vs = rows.filter(_._2 == 1L).map(_._1).toSet
    val vc = rows.filter(_._2 == 0L).map(_._1).toSet
    assert(vs.nonEmpty && vc.nonEmpty)
    // the positional refinement is real on this corpus: at least one
    // piece earns exactly one of the two classes
    assert((vs diff vc).nonEmpty || (vc diff vs).nonEmpty,
      "positional classes identical — refinement vacuous")
    def ref(word: String): Long = {
      var pos = 0; var cnt = 0L
      while (pos < word.length) {
        val set = if (pos == 0) vs else vc
        val l = (4 to 1 by -1).find(l =>
          pos + l <= word.length && set(word.substring(pos, pos + l))).getOrElse(1)
        pos += l; cnt += 1
      }
      cnt
    }
    val rnd = new scala.util.Random(23)
    val alphabet = "abcdefgh_z"
    val words = (1 to 80).map(_ =>
      (1 to (1 + rnd.nextInt(12))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
      .distinct
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val got = TextAnalysis.wordpieceEncodePositional(df, vocab)
      .select("doc_id", "n_wp_tokens").as[(Long, Long)].collect().toMap
    words.zipWithIndex.foreach { case (w, i) =>
      assert(got(i.toLong) === ref(w), s"positional fold diverged on '$w'")
    }
  }

  test("wordpieceEncodeNarrow: streaming twin ≡ batch encode on live micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = graft.sources.Tables.documents(spark, sf).limit(60)
    val vocab = TextAnalysis.wordpieceVocab(graft.sources.Tables.documents(spark, sf))
    val pieces = vocab.select("piece").as[String].collect().toSeq
    val rows = docs.select("doc_id", "text").as[(Long, String)].collect().toSeq
    val mem = MemoryStream[(Long, String)]
    val stream = TextAnalysis.wordpieceEncodeNarrow(
      mem.toDF.toDF("doc_id", "text"), pieces)
    val q = stream.writeStream.outputMode("append").format("memory")
      .queryName("wp_stream_out").start()
    mem.addData(rows.take(30): _*); q.processAllAvailable()
    mem.addData(rows.drop(30): _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("wp_stream_out")
      .select("doc_id", "n_words", "n_chars", "n_wp_tokens", "compression_permille")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val batch = TextAnalysis.wordpieceEncode(docs, vocab)
      .select("doc_id", "n_words", "n_chars", "n_wp_tokens", "compression_permille")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed.size === 60)
  }

  test("perplexityBucketsApprox: no sort in the plan, decisions ≈ exact ntile") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val approx = TextAnalysis.perplexityBucketsApprox(docs)
    // THE scale claim, executable: banding via sketch boundaries +
    // broadcast range lookup has no window (per-stratum sort) at all
    val plan = approx.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "approx banding must not plan a Window sort")
    val a = approx.select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    val e = TextAnalysis.perplexityBuckets(docs)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(a.keySet === e.keySet)
    // at accuracy 10000 on ~500 docs/stratum the sketch boundary sits
    // at (or next to) the exact tercile — decisions agree on ≥ 97%
    val agree = a.count { case (id, k) => e(id) == k }.toDouble / a.size
    assert(agree >= 0.97, s"approx/exact keep agreement $agree")
  }

  test("unigram Viterbi achieves the minimum piece count; greedy MaxMatch can miss it") {
    // vocab from a corpus where greedy fails on "abcd": pieces "abc"
    // (greedy's first grab) and {"ab","cd"} both exist; greedy takes
    // "abc" + "d" = 2... construct the classic: word "abcde" with
    // vocab {"abcd","ab","cde"}: greedy = "abcd"+"e" = 2, optimal =
    // "ab"+"cde" = 2 — tie. True separation needs maxLen pieces the
    // greedy orphans: "abcd" with vocab {"abc","ab","cd"} only:
    // greedy: "abc"+"d"(OOV single) = 2 pieces; Viterbi: "ab"+"cd" =
    // 2 pieces — tie on count, but Viterbi's tot is higher (no
    // zero-score OOV). With "abcdx" and vocab {"abcd","ab","cdx"}:
    // greedy "abcd"+"x" = 2, Viterbi "ab"+"cdx" = 2 — again the win
    // shows in scores. Piece-COUNT separation: "aaab" with vocab
    // {"aaa","aa","ab"}: greedy "aaa"+"b" = 2, Viterbi "aa"+"ab" = 2.
    // MaxMatch ties on count here but loses score whenever its tail
    // falls to OOV singles — assert exactly that.
    import spark.implicits._
    val corpus = Seq((1L, "abc abc ab cd abcd")).toDF("doc_id", "text")
    val vocab = TextAnalysis.unigramVocab(corpus, v = 8, maxLen = 4)
    val enc = TextAnalysis.unigramEncode(corpus, vocab)
      .select("n_pieces", "total_score").as[(Long, Long)].head()
    // the optimum must never exceed the greedy piece count and its
    // score must be ≥ any single alternative; exact values pinned by
    // the oracle — here pin structural invariants
    assert(enc._1 >= 1L && enc._2 > 0L)
    // direct optimality check on the corpus: n_pieces ≤ n_chars and
    // ≥ n_words (each word needs ≥1 piece)
    val docs = graft.sources.Tables.documents(spark, sf)
    val full = TextAnalysis.unigramEncode(docs, TextAnalysis.unigramVocab(docs))
    val bad = full.filter(col("n_pieces") > col("n_chars") ||
      col("n_pieces") < col("n_words")).count()
    assert(bad === 0L)
    // Viterbi piece count is a true lower bound vs greedy WordPiece
    // over the same maxLen (vocabularies differ by construction, so
    // compare against greedy under the UNIGRAM vocab pieces): segment
    // each distinct word both ways and assert viterbi ≤ greedy
    val uv = TextAnalysis.unigramVocab(docs)
    val greedy = TextAnalysis.wordpieceEncodeNarrow(docs,
      uv.select("piece").as[String].collect().toSeq)
      .select(col("doc_id"), col("n_wp_tokens"))
    val both = full.select(col("doc_id"), col("n_pieces")).join(greedy, "doc_id")
    val worse = both.filter(col("n_pieces") > col("n_wp_tokens")).count()
    assert(worse === 0L, "Viterbi must never use more pieces than greedy MaxMatch")
    val strictlyBetter = both.filter(col("n_pieces") < col("n_wp_tokens")).count()
    assert(strictlyBetter > 0L, "on this corpus the optimum should beat greedy somewhere")
  }

  test("unigramEncodeNarrow (zero-shuffle streaming twin) equals the batch encode") {
    val docs = graft.sources.Tables.documents(spark, sf).limit(80)
    val vocab = TextAnalysis.unigramVocab(docs)
    val scores = vocab.select("piece", "score").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val narrow = TextAnalysis.unigramEncodeNarrow(docs, scores)
    // zero shuffle: no Exchange anywhere in the narrow plan
    assert(!narrow.queryExecution.executedPlan.toString.contains("Exchange"),
      "narrow unigram metering must not shuffle")
    val a = narrow.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = TextAnalysis.unigramEncode(docs, vocab)
      .select("doc_id", "n_words", "n_chars", "n_pieces", "total_score",
        "compression_permille")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("readability: hand-computed FK grade, fragment floors at one sentence") {
    import spark.implicits._
    // "the cat sat. the bird flew away!" — 7 words, 2 sentences,
    // vowel groups: the(1) cat(1) sat(1) the(1) bird(1) flew(1)
    // away(2, a + 'ay' run) = 8 syllables... count runs: a-w-a-y →
    // 'a','ay' = 2. fk = (390*7)//2 + (11800*8)//7 - 15590
    //    = 1365 + 13485 - 15590 = -740
    val m = graft.operators.TextAnalysis.readability(
      Seq((1L, "the cat sat. the bird flew away!"), (2L, "no punctuation here"))
        .toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(m(1L) === ((7L, 2L, 8L, (390L * 7 / 2) + (11800L * 8 / 7) - 15590L)))
    assert(m(2L)._2 === 1L, "no terminal punctuation floors at 1 sentence")
  }

  test("longest repeated substring: hand cases, overlap semantics, fuzz vs " +
    "brute force, zero shuffle") {
    import graft.operators.TextAnalysis.longestRepeatOf
    assert(longestRepeatOf("banana") === ((3, "ana")))     // overlapping "ana"
    assert(longestRepeatOf("aaaa") === ((3, "aaa")))       // max overlap
    assert(longestRepeatOf("abcdef") === ((0, "")))        // all unique
    assert(longestRepeatOf("abcabcab") === ((5, "abcab"))) // overlap at 0 and 3
    assert(longestRepeatOf("") === ((0, "")))
    assert(longestRepeatOf("x") === ((0, "")))
    // tie at max length → lexicographically smallest: "xy" vs "ab" both
    // repeat with length 2
    assert(longestRepeatOf("xy1xy2ab3ab") === ((2, "ab")))
    // fuzz: suffix-array answer ≡ brute force on small random strings
    val rnd = new scala.util.Random(42)
    def brute(s: String): (Int, String) = {
      val reps = for {
        l <- (s.length - 1) to 1 by -1
        subs = (0 to s.length - l).map(i => s.substring(i, i + l))
        counts = subs.groupBy(identity).filter(_._2.size >= 2)
        if counts.nonEmpty
      } yield (l, counts.keys.min)
      reps.headOption.getOrElse((0, ""))
    }
    for (trial <- 1 to 120) {
      val n = 1 + rnd.nextInt(40)
      val alpha = 2 + rnd.nextInt(4)
      val s = Array.fill(n)(('a' + rnd.nextInt(alpha)).toChar).mkString
      assert(longestRepeatOf(s) === brute(s), s"trial=$trial s=$s")
    }
    // frame form: null-safe, capped, narrow (no Exchange)
    import spark.implicits._
    val docs = Seq((1L, "banana"), (2L, null.asInstanceOf[String]),
      (3L, "zz" + ("uniq" * 1))).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.longestRepeat(docs, maxChars = 4)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    val m = out.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(m(1L) === ((1L, "a")), "cap at 4 chars: 'bana' repeats only 'a'")
    assert(m(2L) === ((0L, "")))
    assert(m(3L) === ((1L, "z")))
  }

  test("C4 line rules: terminal punctuation + min words per line, lorem/" +
    "brace page tells, kept-text md5, empty and null safe, zero shuffle") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "Good first line stays here.\nbad line\nAnother keeper asks a question?\nQuoted line ends \"\nFinal one is also complete!"),
      (2L, "Only one good line survives today.\nno\nnope again"),
      (3L, "This page uses Lorem Ipsum filler.\nGood line number two stands tall.\nGood line number three stands tall.\nGood line four is also quite fine."),
      (4L, "var x = { a: 1 }\nGood line number two stands tall.\nGood line number three stands tall.\nGood line four is also quite fine."),
      (5L, ""),
      (6L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = TextAnalysis.c4Rules(docs.na.fill(Map("text" -> "")))
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    val m = out.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6)))).toMap
    // doc 1: 5 lines; kept = 1 (5w '.'), 3 (5w '?'), 4 (4w '"'), 5 (5w '!')
    assert(m(1L) === ((5L, 4L, 19L, 0L, 0L, 1L)))
    // doc 2: only 1 kept < 3 → page dropped
    assert(m(2L) === ((3L, 1L, 6L, 0L, 0L, 0L)))
    // doc 3: 4 kept lines but lorem tell (case-insensitive) kills it
    assert(m(3L)._4 === 1L && m(3L)._6 === 0L)
    // doc 4: brace tell kills it despite 3 kept lines
    assert(m(4L)._5 === 1L && m(4L)._6 === 0L)
    // empty text: one empty line, nothing kept, md5('') pins the form
    assert(m(5L) === ((1L, 0L, 0L, 0L, 0L, 0L)))
    val md5s = out.collect().map(r => r.getLong(0) -> r.getString(7)).toMap
    assert(md5s(5L) === java.security.MessageDigest.getInstance("MD5")
      .digest("".getBytes("UTF-8")).map("%02x".format(_)).mkString)
  }

  test("longest repeated substring: codepoint semantics on non-BMP text " +
    "(surrogate pairs never split, lengths and ties count codepoints)") {
    import graft.operators.TextAnalysis.longestRepeatOf
    val cat = new String(Character.toChars(0x1F408))  // 🐈 U+1F408, 2 chars
    val dog = new String(Character.toChars(0x1F415))  // 🐕 U+1F415
    // 🐈a🐈a: the repeat is "🐈a" — 2 CODEPOINTS (4 UTF-16 units)
    assert(longestRepeatOf(cat + "a" + cat + "a") === ((2, cat + "a")))
    // tie-break is by codepoint value: U+1F408 (cat) > 'z' (0x7A) in
    // codepoint order even though its lead surrogate 0xD83D > 'z' too;
    // but vs a BMP char above the surrogate range, e.g. U+FFFD (�),
    // codepoint order says 🐈 (0x1F408) sorts AFTER U+FFFD while raw
    // UTF-16 unit order would sort the surrogate 0xD83D BEFORE 0xFFFD
    val rep = "�"
    val s = cat + cat + "1" + rep + rep  // repeats: "🐈" and "�", both len 1
    assert(longestRepeatOf(s) === ((1, rep)),
      "codepoint order: U+FFFD < U+1F408; UTF-16 unit order would flip this")
    // the maxChars cap slices codepoints: cap 3 over 🐈🐈🐈 keeps all
    // three cats (6 UTF-16 units), so the repeat is 🐈🐈 (len 2)
    import spark.implicits._
    val docs = Seq((1L, cat * 3), (2L, dog + cat + dog + cat + "tail"))
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.longestRepeat(docs, maxChars = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out(1L) === ((2L, cat * 2)),
      "a UTF-16 cap of 3 would have split the second cat's surrogate pair")
    assert(out(2L) === ((1L, dog)),
      "cap 3 keeps 🐕🐈🐕 — the repeat is 🐕, and 🐕 vs 🐈 tie never arises")
  }

  test("NFC audit: decomposed flags + composes, precomposed passes through, " +
    "zero shuffle, null-safe") {
    import spark.implicits._
    val docs = Seq(
      (1L, "café"),          // decomposed: e + combining acute
      (2L, "café"),           // precomposed
      (3L, "ガ"),        // KA + voiced mark → composes to GA
      (4L, "plain ascii"),
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.nfcAudit(docs)
    // narrow: no Exchange in the plan — composes into any scan
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"),
      "nfcAudit must not shuffle")
    val m = out.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(m(1L) === ((0L, 5L, 4L, "café")), "decomposed must compose")
    assert(m(2L) === ((1L, 4L, 4L, "café")), "precomposed is already NFC")
    assert(m(3L) === ((0L, 2L, 1L, "ガ")), "KA + voiced mark → GA")
    assert(m(4L) === ((1L, 11L, 11L, "plain ascii")))
    assert(m(5L) === ((1L, 0L, 0L, "")), "null text reads as empty")
    // the two encodings of é dedup to ONE key after normalization —
    // the ingest-gate property the audit exists for
    assert(out.filter($"doc_id" <= 2).select("nfc_text").distinct().count() === 1)
  }
}
