package graft.index

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.codec.PostingCodec

/**
 * Segment merge — the north star's "segment merge as a sort-merge of
 * term dictionaries" (BASELINE.json:6), the analog of the reference's
 * `SegmentMerger` + `TieredMergePolicy` [8x index/SegmentMerger.java,
 * TieredMergePolicy.java].
 *
 * Doc-range segments use global dense docIDs, so the reference's
 * `MergeState.DocMap` offset remap is the identity here; the merge work
 * that remains is the real one: k-way merge of the per-segment sorted
 * term dictionaries and re-blocking of each term's posting stream.
 * Spark-first realization: the blocks of the merge group are
 * range-partitioned by (new_segment, term) and sorted by
 * (term, first_doc_id) — which IS a distributed sort-merge over the
 * term dictionaries — then re-encoded into fresh 128-doc blocks. Input
 * blocks of the same term arrive doc-ordered (segments cover disjoint
 * ascending doc ranges), so re-encode is a streaming concat.
 */
object Merger {

  /** IndexWriter.addIndexes(Directory...) [8x index/IndexWriter.java
    * addIndexes(Directory...)]: append a FOREIGN index's segments
    * WHOLESALE — no re-analysis, no block re-encode; only the incoming
    * segment ids rebase past the receiving index's max (the reference
    * copies segment files and bumps the segment infos). DocIDs here are
    * data-derived, so for disjoint corpora (the addIndexes contract —
    * the reference likewise assumes the caller isn't duplicating docs)
    * the blocks pass through byte-identical and post-add queries equal
    * a fresh build of the union corpus. The term dictionary is
    * re-derived from the union postings (dictionary-sized aggregate).
    */
  def addIndexes(spark: SparkSession, a: IndexView, b: IndexView): IndexView = {
    import spark.implicits._
    val off = a.postings.agg(max("segment_id")).head().getInt(0) + 1
    val p2 = b.postings.map(r => r.copy(segment_id = r.segment_id + off))
    val d2 = b.docmeta.map(r => r.copy(segment_id = r.segment_id + off))
    val postings = a.postings.union(p2)
    IndexView(postings, Indexer.buildTerms(postings), a.docmeta.union(d2))
  }

  /** SolrCloud SPLITSHARD (range split) [8x solr/core .../cloud/api/
    * collections/SplitShardCmd.java; index/IndexSplitter contrib]: the
    * index splits at a doc-range midpoint into two sub-shards. Doc-range
    * block contiguity makes this almost free: a block entirely on one
    * side passes through BYTE-IDENTICAL to that side; only the (at most
    * one per term per segment) blocks STRADDLING the midpoint decode,
    * route their entries, and re-encode — the reference streams every
    * doc through its sub-shard router; here the router is a block-range
    * comparison. Each side re-derives its term dictionary (stats must
    * reflect only its own docs — per-shard df/ctf, the LocalStatsCache
    * world).
    */
  def splitShard(spark: SparkSession, view: IndexView,
                 mid: Long): (IndexView, IndexView) = {
    import spark.implicits._
    def sideView(left: Boolean): IndexView = {
      val pass = view.postings.filter(b =>
        if (left) b.last_doc_id < mid else b.first_doc_id >= mid)
      val straddle = view.postings.filter(b =>
        b.first_doc_id < mid && b.last_doc_id >= mid)
      val entries: Dataset[PostingInput] = straddle.flatMap { b =>
        val d = PostingCodec.decode(b.docs, b.freqs, b.norms)
        val hasPos = b.positions.nonEmpty
        val ps = if (hasPos) PostingCodec.decodePositions(b.positions, d.freqs)
                 else null
        Iterator.tabulate(d.docIds.length) { i =>
          PostingInput(b.segment_id, b.term, d.docIds(i),
            d.freqs(i), d.norms(i).toInt & 0xff,
            if (hasPos) ps(i) else Array.emptyIntArray)
        }.filter(e => if (left) e.doc_id < mid else e.doc_id >= mid)
      }
      val postings = pass.union(Indexer.buildPostings(spark, entries))
      val docmeta = view.docmeta.filter(m =>
        if (left) m.doc_id < mid else m.doc_id >= mid)
      IndexView(postings, Indexer.buildTerms(postings), docmeta)
    }
    (sideView(left = true), sideView(left = false))
  }

  /** Merge segments into coarser ones: every `factor` consecutive
    * doc-range segments collapse into one new segment
    * (new_segment = segment_id / factor — the simple tier shape). For
    * size-tiered candidate selection use [[MergePolicy.select]] +
    * [[mergeByMapping]].
    *
    * `tombstones`: optional (doc_id) frame of deleted docs to PURGE
    * during the merge (the reference reclaims deletes at merge time
    * [8x index/SegmentMerger.java via liveDocs]): their postings and
    * docmeta rows are dropped before re-encode, so post-merge term
    * stats genuinely shrink.
    */
  def merge(spark: SparkSession, view: IndexView, factor: Int,
            tombstones: Option[org.apache.spark.sql.DataFrame] = None): IndexView = {
    require(factor >= 1)
    mergeByMapping(spark, view, _ / factor, tombstones)
  }

  /** Merge ARBITRARY segment groups: `remap` sends each old segment id
    * to its merge target (identity for segments left alone). Segment
    * doc-ranges are disjoint, so any grouping preserves the per-segment
    * search invariants — block order inside a merged segment is
    * restored by first_doc_id, not block_id.
    *
    * Only the MERGE GROUP is rewritten (the reference merges only the
    * selected segments [8x index/SegmentMerger.java]; a tier sweep of a
    * few NRT segments must not rewrite the whole index at 100 TB):
    * a segment is "touched" iff its group has >= 2 members, its id is
    * remapped, or — when purging — it contains a tombstoned doc (so the
    * purge stays complete; Lucene likewise rewrites exactly the
    * segments whose liveDocs it reclaims). Untouched segments' block
    * rows pass through BYTE-IDENTICAL (test-enforced in MergerSpec).
    */
  def mergeByMapping(spark: SparkSession, view: IndexView, remap: Int => Int,
                     tombstones: Option[org.apache.spark.sql.DataFrame] = None): IndexView = {
    import spark.implicits._

    // metadata-scale driver step: one segment id per ~segSize docs
    val segIds = view.postings.select("segment_id").distinct().as[Int].collect()
    val groupSize: Map[Int, Int] =
      segIds.groupBy(remap).map { case (t, ss) => t -> ss.length }
    val tombSegs: Set[Int] = tombstones match {
      case None    => Set.empty
      case Some(t) =>
        view.docmeta.toDF().join(t.select(col("doc_id")).distinct(), Seq("doc_id"))
          .select("segment_id").distinct().as[Int].collect().toSet
    }
    val touched: Set[Int] =
      segIds.filter(s => remap(s) != s || groupSize(remap(s)) >= 2).toSet ++ tombSegs
    // small touched sets → isin (partition-prunable on a durable index);
    // huge sweeps → broadcast-set lambda filter (isin's expression tree
    // doesn't scale past ~1k literals)
    def split(ds: Dataset[PostingBlockRow], in: Boolean): Dataset[PostingBlockRow] =
      if (touched.size <= 1024) {
        val p = col("segment_id").isin(touched.toSeq: _*)
        ds.filter(if (in) p else !p)
      } else {
        val b = spark.sparkContext.broadcast(touched)
        ds.filter(r => b.value.contains(r.segment_id) == in)
      }

    // decode only the touched blocks back to posting entries, retarget
    // the segment id, and re-run the block build (same machinery = same
    // invariants)
    val entries: Dataset[PostingInput] = split(view.postings, in = true).flatMap { b =>
      val d = PostingCodec.decode(b.docs, b.freqs, b.norms)
      // positions-off indexes (IndexOptions.DOCS_AND_FREQS analog) have
      // empty position payloads with nonzero freqs — don't decode them
      val hasPos = b.positions.nonEmpty
      val ps = if (hasPos) PostingCodec.decodePositions(b.positions, d.freqs) else null
      Iterator.tabulate(d.docIds.length) { i =>
        PostingInput(remap(b.segment_id), b.term, d.docIds(i),
          d.freqs(i), d.norms(i).toInt & 0xff,
          if (hasPos) ps(i) else Array.emptyIntArray)
      }
    }
    val live = tombstones match {
      case None    => entries
      case Some(t) =>
        entries.join(t.select(col("doc_id")).distinct(), Seq("doc_id"), "left_anti")
          .as[PostingInput]
    }
    val merged =
      if (touched.isEmpty) view.postings
      else Indexer.buildPostings(spark, live).union(split(view.postings, in = false))
    // untouched segments have identity remap by construction, so the
    // docmeta map is a no-op for them; tombSegs ⊆ touched keeps the
    // global docmeta purge consistent with the postings purge
    val remapped = view.docmeta.map(m => m.copy(segment_id = remap(m.segment_id)))
    val docmeta = tombstones match {
      case None    => remapped
      case Some(t) =>
        remapped.join(t.select(col("doc_id")).distinct(), Seq("doc_id"), "left_anti")
          .as[DocMetaRow]
    }
    IndexView(merged, Indexer.buildTerms(merged), docmeta)
  }
}

/** Size-tiered merge-candidate selection — re-derivation of the
  * reference's `TieredMergePolicy` [8x index/TieredMergePolicy.java]:
  * segments are considered smallest-first and greedily grouped into
  * merges of up to `maxMergeAtOnce` members whose combined size stays
  * under the `maxMergedDocs` cap — so small segments (NRT micro-batch
  * flushes) are swept up aggressively while already-large segments are
  * left alone, and no merge ever produces an over-cap segment.
  */
object MergePolicy {

  /** Per-segment doc counts (one tiny agg over docmeta). */
  def segmentDocCounts(view: IndexView): Map[Int, Long] =
    view.docmeta.toDF().groupBy("segment_id").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap

  /** Greedy size-tiered selection. Returns the remap (old segment id →
    * merge target = the group's min id); identity entries are omitted.
    * Only groups of >= 2 segments are emitted (a singleton "merge" is a
    * no-op rewrite the policy never schedules).
    */
  def select(segDocs: Map[Int, Long], maxMergeAtOnce: Int = 10,
             maxMergedDocs: Long = Indexer.DefaultSegmentSize * 16): Map[Int, Int] = {
    require(maxMergeAtOnce >= 2)
    val bySize = segDocs.toSeq.sortBy { case (id, n) => (n, id) }
    val mapping = scala.collection.mutable.Map.empty[Int, Int]
    var group = List.empty[Int]
    var groupDocs = 0L
    def close(): Unit = {
      if (group.size >= 2) {
        val target = group.min
        group.foreach(s => mapping(s) = target)
      }
      group = Nil; groupDocs = 0L
    }
    bySize.foreach { case (sid, n) =>
      if (group.size >= maxMergeAtOnce || groupDocs + n > maxMergedDocs) close()
      if (n <= maxMergedDocs) { group ::= sid; groupDocs += n }
    }
    close()
    mapping.toMap
  }
}
