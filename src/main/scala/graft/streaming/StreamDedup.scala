package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming incremental deduplication — the online form of the batch
  * Dedup pack, for pipelines that ingest documents continuously and must
  * drop (or mark) duplicates against EVERYTHING seen so far, not just the
  * current micro-batch. No reference analogue (the reference streams
  * blockchain rows, not documents); this is the training-data-pipeline
  * extension the builder brief asks for, expressed through Structured
  * Streaming's keyed state like every other stateful operator here.
  *
  * Two layers, mirroring the batch design:
  *
  *  1. `markDuplicates` — EXACT dedup. Keyed by content hash; state per
  *     key is one long (the first-seen doc_id). First arrival becomes the
  *     canonical document, every later arrival is emitted marked
  *     `is_dup` with its canonical pointer — the streaming unification of
  *     the batch `min(doc_id) OVER (PARTITION BY md5(text))` program
  *     (registered as s04, oracle-checked).
  *
  *  2. `candidatePairs` — NEAR-dup. The online LSH index: keyed by
  *     MinHash (band, band-key) bucket — `Dedup.bandKeyRows`, the same
  *     banding as batch — with the bucket's doc_id list as state. A new
  *     arrival emits one candidate pair per previously-indexed bucket
  *     member, exactly the pairs batch banding would produce, but
  *     incrementally as documents arrive. Verification is deliberately
  *     NOT in the state op: candidates are a narrow (doc_a, doc_b)
  *     stream that downstream joins against the persisted shingle/
  *     signature silver per micro-batch (`foreachBatch` + the batch
  *     verify join) — state stays O(bucket size), never holds text.
  *
  * Scale: exact-dedup state is one long per DISTINCT document — the
  * smallest possible record of "what have I seen" short of a Bloom
  * filter (which trades false-positive drops; swap in if approximate is
  * acceptable). LSH state is doc_id lists over uniformly-hashed buckets,
  * the same distribution the batch groupBy relies on. Both key spaces
  * shard across the state store by hash, so a 1000-executor cluster
  * splits them evenly; for unbounded streams attach a
  * `GroupStateTimeout.ProcessingTimeTimeout` TTL to age out cold keys
  * (duplicates arrive close in time in practice — CC dumps are
  * processed dump-by-dump).
  */
object StreamDedup {

  /** Input to exact dedup: the content hash is computed upstream as a
    * column (md5/xxhash64 of the text), so state never sees text. */
  case class HashedDoc(doc_id: Long, h: String)
  case class DedupMark(doc_id: Long, canonical_id: Long, is_dup: Boolean)

  /** Input to the online LSH index: one row per (doc, band) from
    * `Dedup.bandKeyRows`. */
  case class BandRow(doc_id: Long, band: Int, bkey: Long)
  case class CandPair(doc_a: Long, doc_b: Long)

  /** First-seen-wins exact dedup over a stream of hashed documents.
    * Within one micro-batch group, arrival order is pinned to doc_id
    * order so the operator is deterministic under batch re-splits (the
    * restart-equivalence property the spec asserts). */
  def markDuplicates(docs: Dataset[HashedDoc]): Dataset[DedupMark] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.h)
      .flatMapGroupsWithState[Long, DedupMark](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[HashedDoc], state: GroupState[Long]) =>
          var canon = state.getOption.getOrElse(Long.MinValue)
          val out = rows.toSeq.sortBy(_.doc_id).map { d =>
            if (canon == Long.MinValue) {
              canon = d.doc_id
              DedupMark(d.doc_id, d.doc_id, is_dup = false)
            } else DedupMark(d.doc_id, canon, is_dup = true)
          }
          state.update(canon)
          out.iterator
      }
  }

  /** Online LSH candidate generation: each arriving (doc, band) row is
    * paired against every doc_id already in its bucket, then indexed.
    * Pairs are emitted (min, max)-normalized; the same pair surfacing
    * from several bands yields duplicates in the stream (exactly as
    * batch banding does before its `distinct()`) — the downstream
    * verify step dedups, keeping this op append-only and watermark-free.
    *
    * Hot-bucket cap (the streaming twin of the batch star contraction,
    * Dedup.DefaultBucketCap): a bucket's state stops growing at
    * `bucketCap` members; arrivals into a saturated bucket pair ONLY
    * against the bucket's minimum doc_id. Per-arrival work and per-key
    * state both stay O(cap) — a 100k-member near-identical cluster
    * (standard in web crawl) emits O(n) star pairs instead of O(n²),
    * every document still surfaces in at least one candidate pair, and
    * the downstream connected-components step still sees one cluster.
    * Recall inside a mixed mega bucket is approximate above the cap,
    * exactly as documented on the batch generators. */
  def candidatePairs(bands: Dataset[BandRow],
      bucketCap: Int = graft.operators.Dedup.DefaultBucketCap)
      : Dataset[CandPair] = {
    import bands.sparkSession.implicits._
    bands.groupByKey(r => (r.band, r.bkey))
      .flatMapGroupsWithState[Vector[Long], CandPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, Long), rows: Iterator[BandRow],
            state: GroupState[Vector[Long]]) =>
          var have = state.getOption.getOrElse(Vector.empty[Long])
          val out = Vector.newBuilder[CandPair]
          rows.toSeq.sortBy(_.doc_id).foreach { r =>
            if (!have.contains(r.doc_id)) {
              if (have.size >= bucketCap) {
                // saturated: star pair against the bucket representative;
                // state stays capped so per-key state is O(bucketCap)
                val rep = have.min
                out += (if (rep < r.doc_id) CandPair(rep, r.doc_id)
                        else CandPair(r.doc_id, rep))
              } else {
                have.foreach { id =>
                  out += (if (id < r.doc_id) CandPair(id, r.doc_id)
                          else CandPair(r.doc_id, id))
                }
                have = have :+ r.doc_id
              }
            }
          }
          state.update(have)
          out.result().iterator
      }
  }
}
