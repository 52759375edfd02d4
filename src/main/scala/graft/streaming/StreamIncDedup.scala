package graft.streaming

import org.apache.spark.sql.{Dataset, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One v2 document entering the incremental-dedup stream: content hash
  * precomputed upstream (the narrow projection that would arrive from the
  * snapshot delta feed), stamped with its arrival phase. */
case class IncDoc(doc_id: Long, h: String, phase: Int)

/** Per-hash dedup state. `fromV1` distinguishes a v1-seeded group (whose
  * arrivals are `carried` members or `matched_v1` joins) from a group
  * first created by the delta (all of whose members are `new_group` —
  * the same labeling as the batch CorpusOps.incrementalDedup).
  * `members` is the v1 member-id list, needed ONLY for the
  * carried-vs-matched distinction; a deployment that doesn't need it
  * keeps O(1) state per hash. */
case class HashState(canonical: Long, members: Seq[Long], fromV1: Boolean)

case class IncVerdict(doc_id: Long, h: String, canonical: Long,
    src: String, phase: Int)

/** STREAMING twin of CorpusOps.incrementalDedup — the snapshot-delta
  * dedup as a stateful stream, with the v1 hash→canonical index loaded
  * as flatMapGroupsWithState INITIAL STATE (the Spark-native way to
  * start a stream from a batch silver instead of replaying it).
  *
  * Frozen-canonical semantics match the batch operator exactly: a hash
  * known to v1 answers with v1's canonical forever; an unknown hash is
  * claimed by its first arrival (doc_id order within a batch group), and
  * every member of such a group is `new_group`. With doc_id-ordered
  * arrival the emitted verdicts equal the batch operator's rows for ANY
  * batch split (StreamIncDedupSpec pins both). */
object StreamIncDedup {

  def initialState(v1: Dataset[(Long, String)])
      : KeyValueGroupedDataset[String, HashState] = {
    import v1.sparkSession.implicits._
    v1.groupByKey(_._2)
      .mapGroups { (h, it) =>
        val ids = it.map(_._1).toSeq.sorted
        h -> HashState(ids.head, ids, fromV1 = true)
      }
      .groupByKey(_._1)
      .mapValues(_._2)
  }

  def verdicts(v2: Dataset[IncDoc],
      init: KeyValueGroupedDataset[String, HashState])
      : Dataset[IncVerdict] = {
    import v2.sparkSession.implicits._
    v2.groupByKey(_.h)
      .flatMapGroupsWithState[HashState, IncVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout, init) {
        (h: String, it: Iterator[IncDoc], state: GroupState[HashState]) =>
          var cur = state.getOption
          val out = it.toSeq.sortBy(_.doc_id).map { d =>
            cur match {
              case Some(hs) if hs.fromV1 =>
                val src =
                  if (hs.members.contains(d.doc_id)) "carried"
                  else "matched_v1"
                IncVerdict(d.doc_id, h, hs.canonical, src, d.phase)
              case Some(hs) =>
                IncVerdict(d.doc_id, h, hs.canonical, "new_group", d.phase)
              case None =>
                cur = Some(HashState(d.doc_id, Seq.empty, fromV1 = false))
                IncVerdict(d.doc_id, h, d.doc_id, "new_group", d.phase)
            }
          }
          cur.foreach(state.update)
          out.iterator
      }
  }
}
