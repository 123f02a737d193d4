package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.TextAnalysis

/** Coverage for the heuristic language ID promised in TextAnalysis's
  * scaladoc, plus token-stat invariants. */
class TextSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf0001}
  import spark.implicits._

  test("language ID classifies crafted per-language docs correctly") {
    val crafted = Seq(
      (1L, "the and of to a the report", "en"),
      (2L, "el la de que y el cuento", "es"),
      (3L, "le la de et les le conte", "fr"),
      (4L, "der die und das ist der bericht", "de"),
      (5L, "shi zai he de le shi gushi", "zh"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.languageIdOn(crafted).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("predicted_lang")).toMap
    assert(out === Map(1L -> "en", 2L -> "es", 3L -> "fr", 4L -> "de", 5L -> "zh"))
  }

  test("corpus docs with any profile hit are classified en (only en stopwords occur)") {
    val rows = TextAnalysis.languageId(spark, sf0001).collect()
    val withHits = rows.filter(_.getAs[Int]("score") > 0)
    assert(withHits.length > 250, s"expected most docs to hit a profile, got ${withHits.length}")
    withHits.foreach { r =>
      assert(r.getAs[String]("predicted_lang") === "en", s"doc ${r.getAs[Long]("doc_id")}")
    }
  }

  test("token stats invariants: distinct <= total, avg length positive") {
    TextAnalysis.tokenStats(spark, sf0001).collect().foreach { r =>
      val (n, nd) = (r.getAs[Int]("n_tokens"), r.getAs[Int]("n_distinct_tokens"))
      assert(nd <= n && nd > 0)
      assert(r.getAs[Double]("avg_token_len") > 0)
    }
  }

  test("sequence packing: chunks tile the corpus token stream exactly") {
    val maxLen = 512
    val packed = TextAnalysis.packSequencesQuery(spark, sf0001, maxLen).collect()
    assert(packed.nonEmpty)
    // every chunk except the last is exactly full, and chunk coverage
    // sums to the corpus token count
    val byChunk = packed.groupBy(_.getAs[Long]("chunk_id")).view
      .mapValues(_.map(_.getAs[Long]("n_tok")).sum).toMap
    val lastChunk = byChunk.keys.max
    byChunk.foreach { case (c, n) =>
      if (c < lastChunk) assert(n === maxLen.toLong, s"chunk $c holds $n")
      else assert(n >= 1L && n <= maxLen.toLong)
    }
    // each doc's spans cover it fully and contiguously
    packed.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rows) =>
      val total = rows.map(_.getAs[Long]("n_tok")).sum
      assert(total === rows.head.getAs[Long]("n_tokens"))
    }
    // offsets are the exclusive prefix sum in doc_id order
    val docs = packed.map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("n_tokens"), r.getAs[Long]("offset"))).distinct.sortBy(_._1)
    docs.sliding(2).foreach {
      case Array((_, n0, o0), (_, _, o1)) => assert(o1 === o0 + n0)
      case _ => ()
    }
  }

  test("vocab OOV: rates in [0,1], oov <= tokens, and a full-size vocab zeroes OOV") {
    val docs = Tables(spark, sf0001, "documents")
    val rows = TextAnalysis.vocabOov(docs, vocabSize = 200).collect()
    assert(rows.length === docs.count())
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    // with the vocab as large as the token universe, nothing is OOV
    val all = TextAnalysis.vocabOov(docs, vocabSize = Int.MaxValue).collect()
    assert(all.forall(_.getLong(2) === 0L))
  }

  test("overlapping chunks tile each doc: full coverage, exact overlap") {
    val docs = Tables(spark, sf0001, "documents")
    val (size, overlap, step) = (64, 16, 48)
    val chunks = TextAnalysis.chunkOverlap(docs, size, overlap).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val nToks = docs.select(col("doc_id"),
        org.apache.spark.sql.functions.size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    chunks.groupBy(_._1).foreach { case (doc, cs) =>
      val n = nToks(doc)
      val sorted = cs.sortBy(_._2)
      // chunk count = ceil(n / step); every chunk except possibly the
      // last is full-size; the k-th starts at k*step
      assert(sorted.length === (n - 1) / step + 1)
      sorted.foreach { case (_, k, len) =>
        assert(len === math.min(size, n - k * step))
      }
    }
  }

  test("curation keep-list = dedup keepers ∩ quality-ok, by construction") {
    val kept = TextAnalysis.curationKeep(spark, sf0001).collect()
      .map(_.getLong(0)).toSet
    val ok = TextAnalysis.qualityScores(spark, sf0001).collect()
      .filter(_.getString(4) == "ok").map(_.getLong(0)).toSet
    val keepers = graft.dedup.Dedup.exactDedup(spark, sf0001).collect()
      .map(_.getLong(1)).toSet
    assert(kept === (ok intersect keepers))
    assert(kept.nonEmpty && kept.size < ok.size.max(keepers.size))
  }

  test("tfidf: <= k rows per doc, corpus-wide tokens (df == N) score 0") {
    val docs = Tables(spark, sf0001, "documents")
    val rows = TextAnalysis.tfidfTop(docs, k = 3).collect()
    val perDoc = rows.groupBy(_.getLong(0)).values.map(_.length)
    assert(perDoc.forall(_ <= 3) && perDoc.exists(_ == 3))
    assert(rows.forall(_.getDouble(2) >= 0.0), "ln(N/df) >= 0 since df <= N")
  }

  test("subword tokenizer peels punctuation into standalone tokens") {
    val toks = Seq("don't stop. really!?")
      .toDF("text")
      .select(TextAnalysis.tokensSubword(col("text")).as("toks"))
      .collect().head.getSeq[String](0)
    assert(toks === Seq("don", "'", "t", "stop", ".", "really", "!", "?"))
    // subword count can only grow vs whitespace tokens on the corpus
    val joined = TextAnalysis.subwordStats(spark, sf0001)
      .join(TextAnalysis.tokenStats(spark, sf0001), "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Int]("n_subwords") >= r.getAs[Int]("n_tokens"))
    }
  }

  test("BPE merges: greedy overlap rule, merge-on-merged, exhaustion stop") {
    // "aaa" holds TWO (a,a) positions (Sennrich pair counting) but
    // greedy application merges only the first: ["aa", "a"]
    val docs = Seq((1L, "aa aa aaa"), (2L, "")).toDF("doc_id", "text")
    val m = TextAnalysis.bpeMerges(docs, k = 10).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    // round 1: (a,a) weight 4 = 1+1 from the two "aa" + 2 from "aaa";
    // round 2: the leftover ["aa","a"] pairs (aa,a) once; then no
    // pairs remain anywhere -> the loop stops short of k
    assert(m === Array((1, "a", "a", "aa", 4L), (2, "aa", "a", "aaa", 1L)))
  }

  test("BPE on the corpus: k rounds, non-increasing counts, chained merges well-formed") {
    val m = TextAnalysis.bpeMerges(
      Tables(spark, sf0001, "documents"), k = 10).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(m.length === 10)
    assert(m.map(_._1).toSeq === (1 to 10))
    // the argmax count can never rise round over round: every pair a
    // merge creates occurs at most as often as the pair just merged
    m.sliding(2).foreach { case Array(a, b) =>
      assert(b._5 <= a._5, s"counts must be non-increasing: $a then $b") }
    // merged symbol is the concatenation, and any multi-char side must
    // itself be a previously produced merge (the BPE vocab property)
    val produced = scala.collection.mutable.Set[String]()
    m.foreach { case (_, l, r, merged, _) =>
      assert(merged === l + r)
      Seq(l, r).filter(_.length > 1).foreach(s =>
        assert(produced.contains(s), s"side $s not a prior merge"))
      produced += merged
    }
  }

  test("substring dedup: planted cross-doc span flagged window-exactly, self-repeats are not dups") {
    val span = (1 to 25).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, s"$span unique1 filler " + (1 to 30).map(i => s"a$i").mkString(" ")),
      (2L, s"prefix1 prefix2 $span tail " + (1 to 30).map(i => s"b$i").mkString(" ")),
      (3L, (1 to 60).map(i => s"c$i").mkString(" "))) // no shared spans
      .toDF("doc_id", "text")
    val out = TextAnalysis.substringDup(docs, w = 20).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // the 25-token shared span holds exactly 6 complete 20-gram
    // positions (25 - 20 + 1); both carriers flag exactly those
    assert(out(1L)._2 === 6L, s"doc 1 dup windows: ${out(1L)}")
    assert(out(2L)._2 === 6L, s"doc 2 dup windows: ${out(2L)}")
    assert(out(3L)._2 === 0L, "distinct doc must carry no dup windows")
  }

  test("decontamination: only docs sharing a 13-gram with the holdout are flagged") {
    val bench = (1 to 20).map(i => s"q$i").mkString(" ")
    val docs = Seq(
      (0L, bench), // the "benchmark" doc (doc_id ≡ 0 mod 10)
      (7L, s"stolen $bench answer " + (1 to 20).map(i => s"x$i").mkString(" ")),
      (8L, (1 to 40).map(i => s"y$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.decontaminate(docs, w = 13, benchEvery = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.contains(7L) && out(7L) >= 1L, "contaminated doc must be flagged")
    assert(!out.contains(8L), "clean doc must be absent from the flag list")
  }

  test("Bloom decontamination is bit-identical to the exact path on the corpus") {
    val docs = Tables(spark, sf0001, "documents")
    val exact = TextAnalysis.decontaminate(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val bloom = TextAnalysis.decontaminateBloom(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(exact.nonEmpty, "fixture must actually contaminate (empty proves nothing)")
    assert(bloom.toSeq === exact.toSeq,
      "bloom pre-filter + exact verify must equal the exact semi-join")
  }

  test("Bloom pre-filter prunes clean grams: no false negatives, bounded pass rate") {
    // hand corpus: one bench doc, one contaminated doc, many clean docs
    val bench = (1 to 20).map(i => s"q$i").mkString(" ")
    val clean = (1 to 50).map { d =>
      ((d * 10 + 1).toLong, (1 to 30).map(i => s"c${d}w$i").mkString(" "))
    }
    val docs = (Seq((0L, bench), (7L, s"pre $bench post")) ++ clean)
      .toDF("doc_id", "text")
    val flagged = TextAnalysis.decontaminateBloom(docs, fpp = 0.001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // no false negatives: the contaminated doc carries the full bench
    // inside it, so at least (20-13+1)=8 of its windows hit
    assert(flagged.contains(7L) && flagged(7L) >= 8L, s"missed contamination: $flagged")
    // exact verify kills every Bloom false positive: clean docs absent
    assert(flagged.keySet === Set(7L), s"false positives survived: ${flagged.keySet}")
  }

  test("served BM25 is bit-identical to the fresh-tokenization path") {
    val fresh = TextAnalysis.bm25TopK(Tables(spark, sf0001, "documents")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val served = TextAnalysis.bm25Served(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(served.toSeq === fresh.toSeq,
      "the persisted-index path must reproduce the fresh path exactly")
  }

  test("pipeline manifest = curation keepers minus holdout minus contaminated, by construction") {
    val kept = TextAnalysis.curationKeep(spark, sf0001).collect().map(_.getLong(0)).toSet
    val contaminated = TextAnalysis.decontaminate(Tables(spark, sf0001, "documents"))
      .collect().map(_.getLong(0)).toSet
    val manifest = TextAnalysis.pipelineManifest(spark, sf0001).collect().map(_.getLong(0)).toSet
    assert(manifest === kept.filter(_ % 10 != 0).diff(contaminated),
      "manifest must be exactly the set-algebra of its stages")
    assert(manifest.nonEmpty, "empty manifest proves nothing")
    // the composition must actually exclude something at each stage on
    // this corpus, or the fixture cannot catch a broken join
    assert(kept.exists(_ % 10 == 0) || kept.exists(contaminated.contains),
      "fixture must exercise at least one exclusion path")
  }

  test("production semantic manifest keeps every doc the exact-leg manifest keeps") {
    // round-12 VERDICT item 1a keep-parity gate: the production
    // manifest routes its semantic leg through the constant-occupancy
    // cells rung, whose exact-cosine-checked candidate edges are a
    // subset of the exact rung's — components only ever split, so the
    // approximate keep-set (and hence the manifest, an intersection
    // with legs shared verbatim) is a SUPERSET of the exact one.
    val exactM = TextAnalysis.pipelineManifestSemantic(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    val prodM = TextAnalysis.pipelineManifestSemanticLsh(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    assert(exactM.nonEmpty, "empty exact manifest proves nothing")
    assert(exactM.subsetOf(prodM),
      s"production manifest dropped exact-kept docs: ${(exactM -- prodM).take(5)}")
  }

  test("BM25: rare terms beat common, shorter docs beat longer at equal tf") {
    // query doc 0 carries one rare and one common term. df(rare)=3,
    // df(common)=8 over N=10; hand-scored: doc 9 (rare, dl=1) ≈ 1.457,
    // doc 1 (rare, dl=3) ≈ 0.974, docs 3-8 (common, dl=2) ≈ 0.263,
    // doc 2 (common, dl=3) ≈ 0.220
    val docs = (Seq(
      (0L, "rare common"),
      (1L, "rare f1 f2"),
      (2L, "common g1 g2"),
      (9L, "rare")) ++
      (3L to 8L).map(i => (i, s"common h$i")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(docs, nQueries = 1, k = 10).collect()
    val ranked = out.sortBy(_.getAs[Int]("rank"))
      .map(r => (r.getAs[Long]("cand_id"), r.getAs[Double]("bm25")))
    assert(ranked.head._1 === 9L, s"idf+length-norm must rank the short rare doc first: ${ranked.toSeq}")
    assert(ranked(1)._1 === 1L, s"rare beats common at any length: ${ranked.toSeq}")
    assert(ranked.last._1 === 2L, s"long common-only doc must rank last: ${ranked.toSeq}")
    assert(math.abs(ranked.head._2 - 1.457) < 0.01, s"hand-scored value drifted: ${ranked.head}")
    // scores strictly positive and non-increasing
    assert(ranked.forall(_._2 > 0.0))
    assert(ranked.zip(ranked.tail).forall { case (a, b) => a._2 >= b._2 })
  }

  test("BPE apply: merges shrink token counts, bounds hold, ordered replay matters") {
    // "abab": merge list ((a,b) then (ab,ab)) tokenizes to ONE symbol
    // only if replayed in order; chars = 4, so 1 < n_bpe < chars
    val docs = Seq((1L, "abab ab cd")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeTokenize(docs, Seq(("a", "b"), ("ab", "ab"))).collect()
    assert(out.length === 1)
    // abab -> [abab]; ab -> [ab]; cd -> [c, d]  => 4 subwords, 3 words
    assert(out.head.getAs[Long]("n_bpe_tokens") === 4L)
    assert(out.head.getAs[Long]("n_words") === 3L)
    // corpus: every doc's subword count is between its word count
    // (full merges) and its character count (no merges)
    val docsCorpus = Tables(spark, sf0001, "documents")
    val stats = TextAnalysis.bpeTokenizeQuery(spark, sf0001).collect()
    assert(stats.nonEmpty)
    stats.foreach { r =>
      assert(r.getAs[Long]("n_bpe_tokens") >= r.getAs[Long]("n_words"))
      assert(r.getAs[Double]("tokens_per_word") >= 1.0)
    }
  }

  test("repetition stats: hand-checked fractions on crafted docs, zero on too-short docs") {
    // doc 1: "x y x y x y" (11 chars) — top 2-gram "x y" appears 3×,
    // mass 3*3=9 → 9/11; "y x" appears only 2× and loses on count.
    // top 3-gram "y x y" (beats "x y x" lexicographically at
    // equal count 2): mass 2*5=10 → 10/11. No 5-gram repeats (grams
    // "x y x y x" and "y x y x y" once each) → dup5 = 0.
    // doc 2: 4 tokens — no 5-grams at all → dup5 coalesces to 0.
    val docs = Seq(
      (1L, "x y x y x y", 11L),
      (2L, "p q r s", 7L))
      .toDF("doc_id", "text", "n_chars")
    val out = TextAnalysis.repetitionStats(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Double]("top2_frac") === math.rint(9.0 / 11 * 1e4) / 1e4)
    assert(out(1L).getAs[Double]("top3_frac") === math.rint(10.0 / 11 * 1e4) / 1e4)
    assert(out(1L).getAs[Double]("dup5_frac") === 0.0)
    assert(out(2L).getAs[Double]("dup5_frac") === 0.0)
    // a degenerate loop doc CAN exceed 1.0 (overlaps counted per
    // occurrence) — the documented non-fraction case
    val loop = Seq((3L, "a a a a a a a a a a", 19L)).toDF("doc_id", "text", "n_chars")
    val l = TextAnalysis.repetitionStats(loop).collect().head
    assert(l.getAs[Double]("dup5_frac") > 1.0)
  }

  test("pmi lift ranks always-adjacent bigrams above incidental ones") {
    // corpus "a b a b" + "c d c d": U=8 (each word count 2), B=6,
    // c(a,b)=c(c,d)=2, c(b,a)=c(d,c)=1
    // lift(a,b) = 2*64/(6*2*2) = 16/3 ≈ 5.3333; lift(b,a) half that
    val docs = Seq((1L, "a b a b"), (2L, "c d c d")).toDF("doc_id", "text")
    val got = TextAnalysis.pmiBigrams(docs, minCount = 1, k = 10).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq === Seq(
      (1, "a", "b", 2L, 5.3333), (2, "c", "d", 2L, 5.3333),
      (3, "b", "a", 1L, 2.6667), (4, "d", "c", 1L, 2.6667)))
  }

  test("lm perplexity: hand-computed add-half bigram NLL on a symmetric corpus") {
    // corpus "a b a b" + "c d c d": V=4 (αV=2 at α=0.5); every word
    // count 2; c(a,b)=c(c,d)=2, c(b,a)=c(d,c)=1
    // doc 1 terms: ln(4/2.5), ln(4/1.5), ln(4/2.5); doc 2 symmetric
    val docs = Seq((1L, "a b a b"), (2L, "c d c d")).toDF("doc_id", "text")
    val got = TextAnalysis.lmPerplexity(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val nll = BigDecimal(
      (2 * math.log(4 / 2.5) + math.log(4 / 1.5)) / 3.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ppl = BigDecimal(math.exp(nll))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq === Seq((1L, 3L, nll, ppl), (2L, 3L, nll, ppl)))
  }

  test("lm perplexity: a doc of corpus-frequent bigrams scores lower than a rare-bigram doc") {
    val docs = Seq(
      (1L, "x y x y x y x y"), (2L, "x y x y x y x y"),
      (3L, "y x q z")).toDF("doc_id", "text")
    val byDoc = TextAnalysis.lmPerplexity(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(byDoc(1L) === byDoc(2L))
    assert(byDoc(1L) < byDoc(3L))
  }

  test("token entropy: uniform, degenerate, and mixed distributions on hand values") {
    val docs = Seq(
      (1L, "a a b b"),       // H = ln 2
      (2L, "a a a a"),       // H = 0
      (3L, "a b c d"))       // H = ln 4
      .toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) === ((4L, 2L, r4(math.log(2)))))
    assert(got(2L) === ((4L, 1L, 0.0)))
    assert(got(3L) === ((4L, 4L, r4(math.log(4)))))
  }

  test("inverted index: df/tf and sorted capped postings on hand docs") {
    val docs = Seq((3L, "b a b"), (1L, "a b"), (2L, "a")).toDF("doc_id", "text")
    val got = TextAnalysis.invertedIndex(docs, cap = 2).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got("a") === ((3L, 3L, "1,2")))   // cap=2 drops doc 3
    assert(got("b") === ((2L, 3L, "1,3")))   // sorted despite arrival order
  }

  test("curation score: gates fire on the planted junk docs, reasons name them") {
    // 20 normal docs sharing a common phrase, one keyword-stuffed doc
    // (zero entropy), one rare-bigram doc (high perplexity)
    val normal = (1L to 20L).map(i => (i, "the quick brown fox jumps over the lazy dog"))
    val stuffed = (100L, "spam spam spam spam spam spam spam spam")
    val weird = (101L, "zq xv qk vj kx jz qv xz")
    val docs = (normal :+ stuffed :+ weird).toDF("doc_id", "text")
    val got = TextAnalysis.curationScore(docs).collect()
      .map(r => r.getLong(0) -> (r.getInt(5), r.getString(6))).toMap
    assert((1L to 20L).forall(got(_) === ((1, "ok"))))
    assert(got(100L)._1 === 0)
    assert(got(100L)._2.contains("entropy_low"))
    assert(got(101L)._1 === 0)
    assert(got(101L)._2.contains("ppl_high"))
  }

  test("feature hash: tf mass equals token count, buckets bounded, md5-pinned") {
    val docs = Seq((1L, "hello world hello")).toDF("doc_id", "text")
    val rows = TextAnalysis.featureHash(docs).collect()
    assert(rows.map(_.getLong(2)).sum === 3L)
    assert(rows.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 256))
    // bucket is pinned to the md5 definition, not an engine hash
    def bucket(w: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16) % 256).toInt
    }
    val byBucket = rows.map(r => (r.getInt(1), r.getLong(2))).toMap
    assert(byBucket(bucket("hello")) === 2L)
    assert(byBucket(bucket("world")) === 1L)
  }

  test("mix rebalance: rates hit the equal-share budget and sampling tracks them") {
    val out = TextAnalysis.mixRebalance(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5)))
    val total = out.map(_._3).sum.toDouble
    val share = total / (2.0 * out.length)
    out.foreach { case (src, nDocs, charsBefore, rate, nKept, charsKept) =>
      val want = math.min(1.0, share / charsBefore)
      assert(math.abs(rate - want) <= 5e-5, s"$src rate $rate != $want")
      assert(nKept <= nDocs && charsKept <= charsBefore)
      if (rate >= 1.0) {
        assert(nKept === nDocs, s"$src at rate 1 must keep everything")
        assert(charsKept === charsBefore)
      } else {
        // kept char mass ~ rate * charsBefore; docs are small so the
        // binomial spread is wide at sf0.001 — allow a loose band
        assert(charsKept > 0, s"$src kept nothing at rate $rate")
        assert(math.abs(charsKept - rate * charsBefore) <=
          0.5 * charsBefore * rate + 2000,
          s"$src kept $charsKept vs expected ${rate * charsBefore}")
      }
    }
    // the whole point: thinned corpus lands near half the original mass
    val keptTotal = out.map(_._6).sum.toDouble
    assert(keptTotal < total, "rebalance must shrink an imbalanced corpus")
  }

  test("ppl buckets: per-language terciles are near-balanced and ordered") {
    val rows = TextAnalysis.pplBuckets(spark, sf0001).collect()
      .map(r => (r.getString(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
        r.getString(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, ppl, t1, t2, bucket) =>
      assert(t1 <= t2, "tercile thresholds out of order")
      val want = if (ppl <= t1) "head" else if (ppl <= t2) "middle" else "tail"
      assert(bucket === want, s"bucket $bucket inconsistent with ppl=$ppl t1=$t1 t2=$t2")
    }
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val n = rs.length
      val byBucket = rs.groupBy(_._5).view.mapValues(_.length).toMap
      for (b <- Seq("head", "middle", "tail")) {
        val c = byBucket.getOrElse(b, 0)
        assert(math.abs(c - n / 3.0) <= math.max(3, n / 6.0),
          s"$lang bucket $b count $c far from tercile of $n")
      }
    }
  }

  test("Welch t-test flags a planted long-doc source and not a matched one") {
    // sources a/b: same length distribution (no significance); source
    // c: 10x longer docs (must flag). n_chars integers keep the
    // sufficient statistics exact.
    val docs = ((0 until 40).map(i => (i.toLong, "a", 100L + (i % 5))) ++
      (0 until 40).map(i => (100L + i, "b", 100L + (i % 5))) ++
      (0 until 40).map(i => (200L + i, "c", 1000L + (i % 5))))
      .toDF("doc_id", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft_ttest_").toString
    docs.withColumn("text", lit("x")).withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextAnalysis.sourceTTest(spark, tmp).collect()
      .map(r => r.getString(0) -> ((r.getDouble(4), r.getInt(6)))).toMap
    assert(got.keySet === Set("a", "b", "c"))
    assert(got("c")._2 === 1 && got("c")._1 > 10,
      s"the long source must flag hard: ${got("c")}")
    // a and b each tested against a rest that INCLUDES c, so both
    // shift significantly low — the flag direction carries the sign
    assert(got("a")._1 < 0 && got("b")._1 < 0)
    assert(math.abs(got("a")._1 - got("b")._1) < 0.5,
      "twin sources must test nearly identically")
  }

  test("logreg quality classifier ranks the target class nearly perfectly") {
    val rows = TextAnalysis.logregScores(spark, sf0001).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3), r.getInt(4)))
    assert(rows.nonEmpty)
    val (pos, neg) = rows.partition(_._1 == 1)
    assert(pos.nonEmpty && neg.nonEmpty, "fixture must contain both classes")
    val meanP = pos.map(_._3).sum / pos.length
    val meanN = neg.map(_._3).sum / neg.length
    assert(meanP > meanN + 0.1,
      s"training must separate the classes: p(quality)=$meanP vs p(other)=$meanN")
    // AUC via the rank-sum form — the metric a filter threshold is
    // chosen against downstream
    val ranked = rows.sortBy(r => (r._2, r._1)).zipWithIndex
    val posRankSum = ranked.collect { case (r, i) if r._1 == 1 => (i + 1).toLong }.sum
    val auc = (posRankSum - pos.length.toLong * (pos.length + 1) / 2).toDouble /
      (pos.length.toLong * neg.length)
    assert(auc > 0.95, s"quality ranking must be near-separable: AUC=$auc")
    // prediction is the exact integer sign of the score
    rows.foreach(r => assert(r._4 === (if (r._2 >= 0) 1 else 0)))
  }

  test("shard plan: a seed-stable permutation covering exactly the manifest") {
    val manifest = TextAnalysis.pipelineManifest(spark, sf0001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val plan = TextAnalysis.shardPlan(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(plan.map(_._1).toSet === manifest, "plan must cover the manifest exactly")
    assert(plan.length === manifest.size, "one row per doc")
    assert(plan.forall(t => t._2 >= 0 && t._2 < 16))
    plan.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1 to rows.length).toSeq,
        s"shard $shard positions must be contiguous from 1")
    }
    // determinism: a second evaluation is bit-identical
    val again = TextAnalysis.shardPlan(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(again.toSeq === plan.toSeq)
  }

  test("boilerplate: shared source header flags, unique text does not") {
    // source a: 10 docs share an 8-token header (df=10, floor is
    // df*5 >= 10) followed by 8 unique tokens — gram 1 is the pure
    // header (boiler), grams 2..9 span into the unique tail (df=1).
    // source b: fully unique docs, zero boilerplate.
    val docs = (0 until 10).flatMap { i =>
      val header = (1 to 8).map(k => s"h$k").mkString(" ")
      val tailA = (1 to 8).map(k => s"a${i}x$k").mkString(" ")
      val tailB = (1 to 16).map(k => s"b${i}x$k").mkString(" ")
      Seq((i.toLong, "a", s"$header $tailA"), (100L + i, "b", tailB))
    }.toDF("doc_id", "source", "text")
    val got = TextAnalysis.boilerplate(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(got.size === 20)
    (0 until 10).foreach { i =>
      assert(got(i.toLong) === (("a", 9L, 1L, 0.1111)), s"doc $i: ${got(i.toLong)}")
      assert(got(100L + i) === (("b", 9L, 0L, 0.0)), s"doc ${100 + i}")
    }
  }

  test("temperature sampling flattens the source distribution monotonically") {
    val rows = TextAnalysis.mixTemperature(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getAs[Double]("share"),
        r.getAs[Double]("p_temp"), r.getAs[Double]("upsample")))
    assert(rows.length >= 2)
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-4, "shares must sum to 1")
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4, "probabilities must sum to 1")
    // upsample = share^(alpha-1)/Z is strictly decreasing in share:
    // low-resource sources are boosted, high-resource ones thinned
    val byShare = rows.sortBy(_._2)
    byShare.sliding(2).foreach { case Array(lo, hi) =>
      if (lo._2 < hi._2)
        assert(lo._4 >= hi._4, s"upsample not monotone: $lo vs $hi")
    }
    if (byShare.head._2 < byShare.last._2) {
      assert(byShare.head._4 > 1.0, "smallest source must be upsampled")
      assert(byShare.last._4 < 1.0, "largest source must be downsampled")
    }
  }

  test("budget fill: kept set == independent Scala greedy prefix per source") {
    val got = TextAnalysis.budgetFill(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    // independent recompute: md5 hash order per source, cumulative
    // chars BEFORE the doc under the equal-share budget
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val total = got.map(_._3).sum
    val nsrc = got.map(_._2).distinct.length
    val budget = total.toDouble / (2L * nsrc)
    val expectKept = got.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val ordered = rows.sortBy(r => (md5hex(s"fill:${r._1}"), r._1))
      ordered.scanLeft(0L)(_ + _._3).zip(ordered)
        .filter { case (before, _) => before < budget }
        .map(_._2._1)
    }.toSet
    assert(got.filter(_._4).map(_._1).toSet === expectKept)
    // the fill bites: every source keeps something but not everything
    got.groupBy(_._2).foreach { case (src, rows) =>
      val kept = rows.count(_._4)
      assert(kept > 0, s"$src kept nothing")
      assert(kept < rows.length || rows.map(_._3).sum <= budget + rows.map(_._3).max,
        s"$src kept everything against a binding budget")
    }
  }

  test("naive bayes: confusion matrix covers exactly the held-out docs") {
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("lang")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def hex2(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      f"${d(0) & 0xff}%02x"
    }
    val test = docs.filter { case (id, _) => hex2(s"nb:$id") >= "cc" }
    val cm = TextAnalysis.nbClassify(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val labels = docs.map(_._2).toSet
    // every cell uses known labels, counts partition the test split
    assert(cm.forall { case (t, p, _) => labels.contains(t) && labels.contains(p) })
    assert(cm.map(_._3).sum === test.length.toLong)
    val perTrue = cm.groupBy(_._1).map { case (l, xs) => l -> xs.map(_._3).sum }
    val wantPerTrue = test.groupBy(_._2).map { case (l, xs) => l -> xs.length.toLong }
    assert(perTrue === wantPerTrue, "rows per true label must match the held-out split")
    // run-stable (the model is a deterministic function of the split)
    val cm2 = TextAnalysis.nbClassify(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(cm.toSeq === cm2.toSeq)
  }

  test("PII redaction: counts, exact redacted strings, and in-text PII detection") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // doc 0 plants all three categories (0 ≡ 0 mod 3, 5, 7); doc 1
    // plants nothing but carries an IN-TEXT email the detector must
    // find; doc 2 is clean end to end.
    val docs = Seq(
      (0L, "plain words here"),
      (1L, "write to a.b-c@mail.co now"),
      (2L, "nothing sensitive"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.piiRedactOn(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_email"), r.getAs[Int]("n_phone"), r.getAs[Int]("n_ip")),
          r.getAs[Int]("clean_len"), r.getAs[String]("clean_fp"))).toMap
    val clean0 = "plain words here contact <EMAIL> call <PHONE> from <IP>"
    val clean1 = "write to <EMAIL> now"
    val clean2 = "nothing sensitive"
    assert(out(0L) === (((1, 1, 1), clean0.length, md5hex(clean0).take(16))))
    assert(out(1L) === (((1, 0, 0), clean1.length, md5hex(clean1).take(16))))
    assert(out(2L) === (((0, 0, 0), clean2.length, md5hex(clean2).take(16))))
  }

  test("corpus report columns reconcile with their standalone families") {
    val rep = TextAnalysis.corpusReport(spark, sf0001).collect()
    val totDocs = rep.map(_.getAs[Long]("n_docs")).sum
    assert(totDocs === Tables(spark, sf0001, "documents").count())
    val totKept = rep.map(_.getAs[Long]("n_kept")).sum
    assert(totKept === TextAnalysis.pipelineManifest(spark, sf0001).count())
    val totOk = rep.map(_.getAs[Long]("n_quality_ok")).sum
    assert(totOk === TextAnalysis.qualityScores(spark, sf0001)
      .filter(col("quality_class") === "ok").count())
    val totPii = rep.map(_.getAs[Long]("n_pii")).sum
    assert(totPii === TextAnalysis.piiRedact(spark, sf0001)
      .agg(sum(col("n_email") + col("n_phone") + col("n_ip"))).head().getLong(0))
    assert(rep.forall(r => r.getAs[Long]("n_kept") <= r.getAs[Long]("n_quality_ok")),
      "kept docs are a subset of quality-ok docs per source")
  }

  test("semantic manifest == text manifest ∩ embedding keepers (set identity)") {
    val manifest = TextAnalysis.pipelineManifest(spark, sf0001).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val semKept = graft.similarity.Similarity.semanticKeep(spark, sf0001).collect()
      .filter(_.getAs[Boolean]("is_kept")).map(_.getAs[Long]("vec_id")).toSet
    val got = TextAnalysis.pipelineManifestSemantic(spark, sf0001).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(got === (manifest intersect semKept))
    assert(got.nonEmpty, "empty results validate nothing")
    assert(got !== manifest, "the semantic gate must actually remove something here")
  }

  test("contamination span masking merges overlapping windows and splits disjoint regions") {
    // w=3: a shared 4-token phrase at positions p..p+3 produces hit
    // windows p and p+1, which must MERGE into one span [p, p+3].
    // doc 0 is the benchmark (0 mod 10); doc 1 carries the phrase
    // twice, separated by >w unique tokens -> exactly two spans.
    val phrase = "alpha beta gamma delta"
    val docs = Seq(
      (0L, s"$phrase filler0"),
      (1L, s"u1 u2 $phrase m1 m2 m3 m4 m5 $phrase t1 t2"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.maskContamination(docs, w = 3).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("span_start"),
        r.getAs[Int]("span_end"), r.getAs[Int]("span_tokens")))
    // doc 1 tokens: u1 u2 alpha beta gamma delta m1..m5 alpha beta gamma delta t1 t2
    // phrase 1 at 3..6 -> windows 3,4 -> span [3,6]; phrase 2 at 12..15 -> span [12,15]
    assert(out.toSeq === Seq((1L, 3, 6, 4), (1L, 12, 15, 4)))
  }

  test("DSIR weights rank target-vocabulary docs above mixed and off-target docs") {
    // target (en) speaks {alpha beta gamma}; off-target (de) speaks
    // {zeta eta theta}; doc 4 mixes both. Token counts are inflated
    // (60/doc) so the add-0.5·dim smoothing term cannot drown the
    // signal the way it would on a 5-token toy corpus.
    val docs = Seq(
      (0L, List.fill(20)("alpha beta gamma").mkString(" "), "en"),
      (1L, List.fill(20)("alpha beta gamma").mkString(" "), "en"),
      (2L, List.fill(20)("zeta eta theta").mkString(" "), "de"),
      (3L, List.fill(20)("zeta eta theta").mkString(" "), "de"),
      (4L, List.fill(10)("alpha beta zeta eta").mkString(" "), "de"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.dsirWeightsOn(docs, topN = 5).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("rank"), r.getAs[Long]("score_micro")))).toMap
    // identical target docs tie on score -> doc_id breaks the tie
    assert(out(0L)._1 === 1 && out(1L)._1 === 2)
    assert(out(0L)._2 === out(1L)._2)
    assert(out(4L)._1 === 3, s"mixed doc should sit between: $out")
    assert(out(2L)._1 === 4 && out(3L)._1 === 5)
    // signs: target docs positive, off-target negative
    assert(out(0L)._2 > 0 && out(2L)._2 < 0 && out(4L)._2 < 0)
  }
}
