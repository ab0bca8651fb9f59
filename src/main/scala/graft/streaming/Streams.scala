package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured Streaming surface (SURVEY §2.10). The reference is
  * batch-only; its semantics — "pick up whatever files exist now,
  * archive so they aren't re-ingested" — are exactly the file source
  * with `Trigger.AvailableNow` + checkpointed progress. The `events`
  * computations below are the streaming twins of `graft.ops.Events`
  * (same logical plans, plus watermarks for state eviction).
  *
  * Scale notes: state stores are keyed by (user_id | window), both
  * bounded; watermarks bound retained state; `AvailableNow` gives
  * batch-sized catch-up without an always-on cluster.
  */
object Streams {

  /** Tumbling hourly counts with late-data handling: events later than
    * `watermark` behind the max seen ts are dropped and their windows
    * finalized. */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("hour_start"), col("n"))

  /** Gap-based sessionization via the native session_window — the
    * streaming twin of `Events` e04. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  final case class Ev(user_id: Long, ts: java.sql.Timestamp)
  final case class UserSessions(user_id: Long, n_events: Long, n_sessions: Long)
  // not `private`: the state encoder's generated code must reach it
  final case class SessState(nEvents: Long, nSessions: Long, lastUs: Long)

  /** Custom keyed state via mapGroupsWithState: running per-user event
    * and session counts (new session when the gap exceeds `gapUs`).
    * Demonstrates arbitrary stateful processing where session_window's
    * built-in semantics don't fit. */
  def userSessionState(events: Dataset[Ev], gapUs: Long = 30L * 60 * 1000000)
      (implicit spark: SparkSession): Dataset[UserSessions] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessState, UserSessions](
        GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessState]) =>
          val sorted = evs.map(e => e.ts.getTime * 1000).toArray.sorted
          var st = state.getOption.getOrElse(SessState(0, 0, Long.MinValue))
          sorted.foreach { us =>
            val newSession = st.lastUs == Long.MinValue || us - st.lastUs > gapUs
            st = SessState(st.nEvents + 1,
              st.nSessions + (if (newSession) 1 else 0), us)
          }
          state.update(st)
          UserSessions(user, st.nEvents, st.nSessions)
      }
  }

  final case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long)
  final case class OpenSess(startUs: Long, lastUs: Long, nEvents: Long)

  /** Sessionization with EMIT-ON-CLOSE via flatMapGroupsWithState +
    * event-time timeout: nothing is emitted while a session is open;
    * when the watermark passes last-event + gap the state times out and
    * the finished session is emitted exactly once. This is the
    * arbitrary-state complement of [[sessionCounts]] (which re-emits
    * updated aggregates): downstream consumers see each session once,
    * final, in Append mode. State per user is one small struct; the
    * timeout evicts it, so idle users cost nothing. */
  def closedSessions(events: Dataset[Ev], gapUs: Long = 30L * 60 * 1000000)
      (implicit spark: SparkSession): Dataset[ClosedSession] = {
    import spark.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSess, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[OpenSess]) =>
          def ts(us: Long) = new java.sql.Timestamp(us / 1000)
          if (state.hasTimedOut) {
            // watermark passed last + gap: close and evict
            val s = state.get
            state.remove()
            Iterator(ClosedSession(user, ts(s.startUs), ts(s.lastUs), s.nEvents))
          } else {
            val sorted = evs.map(_.ts.getTime * 1000).toArray.sorted
            var open = state.getOption
            val closed = Seq.newBuilder[ClosedSession]
            sorted.foreach { us =>
              open match {
                case Some(o) if us - o.lastUs <= gapUs =>
                  open = Some(OpenSess(o.startUs, us, o.nEvents + 1))
                case Some(o) => // gap exceeded inside the batch
                  closed += ClosedSession(user, ts(o.startUs), ts(o.lastUs),
                    o.nEvents)
                  open = Some(OpenSess(us, us, 1))
                case None =>
                  open = Some(OpenSess(us, us, 1))
              }
            }
            open.foreach { o =>
              state.update(o)
              // fires once the EVENT-TIME watermark passes this point
              state.setTimeoutTimestamp(o.lastUs / 1000 + gapUs / 1000)
            }
            closed.result().iterator
          }
      }
  }

  /** Streaming exact dedup: drop re-deliveries of the same event_id
    * whose event times fall within the watermark window — the
    * streaming twin of the batch exact-dedup (Text t07). State is
    * bounded: ids older than the watermark are evicted. */
  def dedupedEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  final case class CandPair(da: Long, db: Long)

  /** Streaming MinHash-LSH near-dup candidates — the streaming twin
    * of the batch t09 band join. The column pipeline
    * ([[graft.ops.Text.lshBandKeys]]) is a stateless projection, so
    * it runs unchanged on the stream; the BAND-BUCKET JOIN becomes a
    * state store keyed by (band, bh): each bucket remembers the doc
    * ids it has seen, and a newcomer emits one candidate pair per
    * prior resident. Union over buckets = exactly the batch band
    * join's candidate set, discovered incrementally — every pair
    * appears when its second member arrives (possibly re-emitted
    * via a different shared band; consumers dedup downstream, same
    * as the batch path's `.distinct()`).
    *
    * Scale: state per bucket is the resident id list, capped at
    * `cap` ids — the SAME skew guard as the batch path
    * ([[graft.ops.Similarity]] `lshBucketJoin`): a pathological hot
    * bucket (near-dup cluster, zero vectors) stops admitting
    * residents at the cap instead of emitting O(n²) pairs, and
    * recall for genuinely-similar pairs survives via their other 17
    * bands. Verification (exact Jaccard on the candidate pairs) is
    * a stream-static join downstream, same split as
    * [[scoreAgainstModel]]'s train-offline/apply-online seam. */
  def lshCandidatePairs(docs: DataFrame, cap: Int = 4096)(
      implicit spark: SparkSession): Dataset[CandPair] = {
    import spark.implicits._
    graft.ops.Text.lshBandKeys(docs)
      .as[(Long, Int, Long)]
      .groupByKey(r => (r._2, r._3))
      .flatMapGroupsWithState[Seq[Long], CandPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, Long), rows: Iterator[(Long, Int, Long)],
            state: GroupState[Seq[Long]]) =>
          var seen = state.getOption.getOrElse(Vector.empty[Long])
          val out = Vector.newBuilder[CandPair]
          rows.foreach { case (id, _, _) =>
            if (!seen.contains(id)) {
              // ≤ cap pairs per newcomer — bounded work even when the
              // bucket is hot; a full bucket still pairs newcomers
              // against its residents, it just stops admitting more
              seen.foreach { o =>
                out += (if (o < id) CandPair(o, id) else CandPair(id, o))
              }
              if (seen.length < cap) seen = seen :+ id
            }
          }
          state.update(seen)
          out.result().iterator
      }
  }

  /** Near-dup GATE at ingest: verified 3-gram-Jaccard matches of a
    * streaming document feed against the STATIC corpus — the screen
    * that quarantines incoming near-duplicates BEFORE they land in
    * bronze (the streaming complement of t08: there both sides are
    * the corpus; here one side arrives). Per micro-batch: the stream
    * side derives the same 18-band MinHash keys as the batch path,
    * candidates come from the stream-static band equi-join (Spark
    * re-plans the static side per batch; at 100 TB the corpus band
    * table is a bucketed catalog table so the join is shuffle-free
    * on the static side), and the exact verify is one
    * array_intersect per candidate. The only streaming state is the
    * (doc_id, cid) dedup of candidate pairs — O(emitted matches),
    * which for a gate is the interesting minority by construction.
    * Emits (doc_id, cid, jaccard ≥ thr); the caller routes matched
    * doc_ids to quarantine. */
  def neardupMatches(docs: DataFrame, corpus: DataFrame,
      thr: Double = 0.8): DataFrame = {
    val corpusSh = corpus
      .select(col("doc_id").as("cid"), graft.ops.Text.shingles.as("csh"))
      .filter(size(col("csh")) > 0)
    val corpusBands = graft.ops.Text.lshBandKeys(corpus)
      .toDF("cid", "band", "bh")
    val streamSh = docs
      .select(col("doc_id"), graft.ops.Text.shingles.as("sh"))
      .filter(size(col("sh")) > 0)
    val streamBands = graft.ops.Text.lshBandKeys(docs)
      .toDF("doc_id", "band", "bh")
    val inter = graft.functions.TextExprs
      .sortedIntersectCount(col("sh"), col("csh"))
    streamBands.join(corpusBands, Seq("band", "bh"))
      .select("doc_id", "cid")
      .dropDuplicates("doc_id", "cid")
      .join(streamSh, "doc_id")
      .join(corpusSh, "cid")
      .select(col("doc_id"), col("cid"),
        (inter.cast("double") /
          (size(col("sh")) + size(col("csh")) - inter)).as("jaccard"))
      .filter(col("jaccard") >= thr)
  }

  /** SemDeDup admission gate at ingest: the streaming complement of
    * s34 ([[graft.ops.Similarity.semDedupCells]]). Arrivals assign to
    * a cell under the FROZEN quantizer — the same fused NearestCell
    * fold the batch path trains with — then screen with exact cosine
    * against the cell's KEPT members. Emits one row per (arrival,
    * kept) hit at cos ≥ eps: (vec_id, cid, kept_id, cos); the caller
    * quarantines matched vec_ids and appends survivors to the keep
    * table (and periodically re-runs the batch job to refresh model
    * and keeps — the standard incremental-dedup contract: existing
    * keeps are frozen, and arrivals do not dedup against each other
    * until that refresh). Scale shape: assignment is per-row map
    * work; the only join is STREAM-STATIC on cid, so with the keep
    * table cid-partitioned/bucketed the static side never shuffles
    * per micro-batch; the only streaming state is the output's
    * (vec_id, kept_id) dedup — O(matches), the interesting minority
    * for a gate by construction. */
  def semDedupMatches(arrivals: DataFrame, kept: DataFrame,
      centroids: Seq[Seq[Double]], eps: Double = 0.95): DataFrame = {
    import graft.functions.VectorExprs
    val asg = arrivals.select(col("vec_id"), col("embedding"),
      VectorExprs.nearestCell(
        transform(col("embedding"), x => x.cast("double")), centroids)
        .getField("cid").as("cid"))
    val keptCells = kept.select(col("vec_id").as("kept_id"), col("cid"),
      col("embedding").as("ke"))
    val cos = VectorExprs.vecDot(col("embedding"), col("ke")) /
      (VectorExprs.vecNorm(col("embedding")) *
        VectorExprs.vecNorm(col("ke")))
    asg.join(keptCells, Seq("cid"))
      .select(col("vec_id"), col("cid"), col("kept_id"), cos.as("cos"))
      .filter(col("cos") >= eps)
      .dropDuplicates("vec_id", "kept_id")
  }

  /** pHash admission gate at ingest — the MULTIMODAL member of the
    * gate family (near-dup text, SemDeDup embeddings, now images):
    * each arriving image decodes through the SAME fused integer-DCT
    * pipeline as batch m23 ([[graft.ops.Multimodal.decodeBmpPhash]] —
    * stream and batch hash bit-identically by construction), then
    * screens against a STATIC corpus hash table via a 16-bit band
    * equi-join (pigeonhole: Hamming ≤ 3 twins always share one of the
    * 4 bands, so the banding is LOSSLESS at the default threshold —
    * m09's discipline). Emits (doc_id, corpus_doc, hamming) per
    * match; the caller quarantines matched arrivals. Scale shape: the
    * decode+hash is per-row map work inside the task (pixels never
    * reach the join), the join is stream-static on the band key so
    * the corpus side can stay bucketed at rest, and the gate keeps
    * ZERO streaming state: multi-band duplicate hits collapse via a
    * stateless lowest-matching-band filter, not a stateful dedup.
    *
    * REDELIVERY CONTRACT (at-least-once): statelessness means no
    * cross-micro-batch memory — an arrival REDELIVERED in a later
    * batch (source replay, restart without exactly-once sink) re-emits
    * its match pairs, where a stateful dropDuplicates would have
    * suppressed them at the cost of one state row per pair forever.
    * Quarantine consumers must therefore handle replayed pairs
    * idempotently (keyed upsert / MERGE on (doc_id, corpus_doc), the
    * [[graft.ingest.BronzeMerge]] discipline) rather than appending. */
  def phashMatches(arrivals: Dataset[(Long, Array[Byte])],
      corpus: DataFrame, maxHam: Int = 3): DataFrame = {
    import arrivals.sparkSession.implicits._
    val hashed = arrivals.map { case (id, bs) =>
      val r = graft.ops.Multimodal.decodeBmpPhash(id, bs)
      (r.doc_id, r.phash)
    }.toDF("doc_id", "phash")
    def banded(df: DataFrame, idCol: String, hashCol: String): DataFrame =
      df.select(col(idCol), col(hashCol), posexplode(array(
        (0 until 4).map(b => shiftright(col(hashCol), 16 * b)
          .bitwiseAND(lit(0xffffL))): _*)))
        .toDF(idCol, hashCol, "band", "bv")
    val a = banded(hashed, "doc_id", "phash")
    val c = banded(corpus.select(col("doc_id").as("corpus_doc"),
      col("phash").as("cphash")), "corpus_doc", "cphash")
    // a Hamming-≤3 pair can share up to 4 bands and would surface
    // once per shared band; the dedup is STATELESS — keep the pair
    // only at its LOWEST matching band, a pure function of the two
    // hashes. (A streaming dropDuplicates here would accrete one
    // state row per emitted pair for the lifetime of the query — a
    // slow leak in an always-on admission gate; the band-canonical
    // filter needs no state and no watermark.)
    val bandMatch = (0 until 4).map(b =>
      shiftright(col("phash"), 16 * b).bitwiseAND(lit(0xffffL)) ===
        shiftright(col("cphash"), 16 * b).bitwiseAND(lit(0xffffL)))
    val firstBand = when(bandMatch(0), 0).when(bandMatch(1), 1)
      .when(bandMatch(2), 2).otherwise(3)
    a.join(c, Seq("band", "bv"))
      .filter(col("doc_id") =!= col("corpus_doc"))
      .withColumn("hamming",
        bit_count(col("phash").bitwiseXOR(col("cphash"))).cast("int"))
      .filter(col("hamming") <= maxHam)
      .filter(col("band") === firstBand)
      .select(col("doc_id"), col("corpus_doc"), col("hamming"))
  }

  /** Stream-stream interval join: each purchase matched to the same
    * user's clicks in the preceding hour — the streaming twin of the
    * batch range join (e11). Both sides carry watermarks and the join
    * condition bounds event-time distance, so Spark can size and
    * expire the join state (clicks older than purchase-watermark − 1 h
    * are dropped); without the interval the state would grow forever. */
  def clicksBeforePurchase(clicks: DataFrame,
      purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts").as("click_ts"))
    val p = purchases.withWatermark("ts", "1 hour")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"))
    c.join(p,
      col("user_id") === col("p_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("click_ts"), col("purchase_ts"))
  }

  final case class ScdEv(user_id: Long, ts: java.sql.Timestamp,
      event_id: Long, event_type: String)
  final case class ScdCurrent(user_id: Long, seq: Int, event_type: String,
      valid_from: java.sql.Timestamp, n_events: Long)
  // not `private`: the state encoder's generated code must reach it
  final case class ScdState(curType: String,
      validFrom: java.sql.Timestamp, seq: Int, nEvents: Long)

  /** Streaming twin of e22's SCD-2 build: the per-user CURRENT
    * dimension row (open interval) maintained via mapGroupsWithState.
    * The batch query owns the closed-interval history; the stream
    * owns "what is true now" — exactly the row a MERGE upserts into
    * the serving dimension on every micro-batch. Events are ordered
    * (event-time µs, event_id) inside each batch — the identical
    * total order the batch islands pass uses — so given chunks in
    * event-time order (the session twins' contract) the final state
    * per user equals the batch `is_current` slice row-for-row,
    * including the µs-exact valid_from (the transition Timestamp is
    * carried through state untouched). State per user: one type,
    * one timestamp, two counters — O(users) total, no history. */
  def scd2CurrentState(events: Dataset[ScdEv])
      (implicit spark: SparkSession): Dataset[ScdCurrent] = {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    events.groupByKey(_.user_id)
      .mapGroupsWithState[ScdState, ScdCurrent](
        GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[ScdEv], state: GroupState[ScdState]) =>
          val sorted = evs.toArray.sortBy(e =>
            (DateTimeUtils.fromJavaTimestamp(e.ts), e.event_id))
          var st = state.getOption.getOrElse(ScdState(null, null, 0, 0L))
          sorted.foreach { e =>
            if (st.curType == null || st.curType != e.event_type)
              st = ScdState(e.event_type, e.ts, st.seq + 1, 1L)
            else st = st.copy(nEvents = st.nEvents + 1)
          }
          state.update(st)
          ScdCurrent(user, st.seq, st.curType, st.validFrom, st.nEvents)
      }
  }

  /** Per-type `value` moments trained in BATCH — the model side of
    * [[scoreAgainstModel]]. At 100 TB this aggregation runs offline
    * over the full history (one bounded-key shuffle); the resulting
    * relation is a few rows per event type. */
  def valueMoments(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(avg(col("value")).as("mean_v"),
        stddev_samp(col("value")).as("sd_v"))

  /** Batch-train / stream-apply: z-score each live event's `value`
    * against the batch-trained per-type moments. A broadcast
    * stream-static join — completely STATELESS (no state store, no
    * watermark needed): the canonical production split where the model
    * trains offline at full scale and applies online per event.
    * Unknown types score null (left join) rather than dropping. */
  def scoreAgainstModel(events: DataFrame, moments: DataFrame): DataFrame =
    events.join(broadcast(moments), Seq("event_type"), "left")
      .select(col("event_id"), col("event_type"), col("ts"), col("value"),
        ((col("value") - col("mean_v")) / col("sd_v")).as("z"))
      .withColumn("is_outlier", abs(col("z")) >= 3.0)

  /** Batch-train / stream-apply for the TRAINED classifier: score a
    * live document stream under `graft.ops.Text.lrModel` weights. The
    * margin is `Text.lrMarginExpr` — a row-local fold with the F+3
    * weights inlined as an array literal — so the apply side is not
    * merely stateless but SHUFFLE-FREE: no state store, no watermark,
    * no join, each micro-batch a map-only pass. This is the online
    * half of the CCNet/DCLM quality-filter deployment: train offline
    * on the full corpus, gate documents as they arrive. Docs stream
    * needs (doc_id, text) columns. */
  def scoreDocsWithModel(docs: DataFrame, w: Seq[Double],
      nF: Int = 512): DataFrame =
    docs.select(col("doc_id"),
        graft.ops.Text.lrMarginExpr(w, nF).as("margin"))
      .withColumn("pred", when(col("margin") >= 0, 1).otherwise(0))

  /** Batch-train / stream-apply for DSIR (t63): gate a live document
    * stream with the corpus-trained per-bucket log-ratio table
    * ([[graft.ops.Text.dsirLambdaArray]], a 1024-double model). The
    * weight is [[graft.ops.Text.dsirWeight]] — a row-local fold that
    * replays t63's decimal-exact sum bucket for bucket, so a doc
    * scores bit-identically whether it arrives in a micro-batch or
    * sits in the batch corpus. Map-only: no state store, no
    * watermark, no join — the DSIR deployment shape (train offline,
    * score documents as they arrive, keep those that look like the
    * target domain). Docs stream needs (doc_id, text) columns. */
  def dsirGate(docs: DataFrame, lam: Array[Double],
      threshold: Double): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        (id, graft.ops.Text.dsirWeight(text, lam)) }
      .toDF("doc_id", "dsir_weight")
      .withColumn("keep", col("dsir_weight") >= threshold)
  }

  // not `private`: the state encoder's generated code must reach it
  final case class ShardHH(shard: Int, version: Long,
      counters: Map[String, (Long, Long)])

  /** Streaming Space-Saving heavy hitters — the streaming twin of the
    * batch t20 typed Aggregator. Terms shard by hash; each shard folds
    * its slice of the stream into ONE bounded Space-Saving buffer held
    * in keyed state (`capacity` counters — the same `reduce` the batch
    * Aggregator runs map-side) and re-emits the buffer every trigger
    * with a monotone `version` (total observed count) so a consumer
    * keeps only the newest row per shard. State is `shards × capacity`
    * counters TOTAL, forever, regardless of stream length — the
    * bounded-memory property that makes top-k viable on an unbounded
    * stream. Merging the shard buffers ([[mergeHeavyHitters]]) uses
    * the Aggregator's own order-insensitive, sandwich-bound-preserving
    * `merge`, so streamed chunks converge to the batch answer — and
    * equal it EXACTLY when capacity ≥ per-shard vocabulary (StreamsSpec
    * asserts ≡ batch t20 in that regime). */
  def heavyHitterShards(terms: Dataset[String], capacity: Int,
      shards: Int = 16)(implicit spark: SparkSession): Dataset[ShardHH] = {
    import spark.implicits._
    val agg = new graft.functions.Aggregators.SpaceSaving(capacity, capacity)
    terms.map(t => (math.floorMod(t.hashCode, shards), t))
      .groupByKey(_._1)
      .mapGroupsWithState[Map[String, (Long, Long)], ShardHH](
        GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[(Int, String)],
            state: GroupState[Map[String, (Long, Long)]]) =>
          var buf = state.getOption.getOrElse(agg.zero)
          rows.foreach { case (_, t) => buf = agg.reduce(buf, t) }
          state.update(buf)
          ShardHH(shard, buf.valuesIterator.map(_._1).sum, buf)
      }
  }

  final case class ShardCms(shard: Int, version: Long, sketch: Seq[Long])

  /** Streaming Count-Min: one CMS per term shard in
    * `mapGroupsWithState`. Stronger than the heavy-hitter twin: CMS
    * increments are position-fixed (term → same cells in every
    * sketch) and merge is elementwise addition, so summing the latest
    * shard sketches equals the single batch sketch EXACTLY — sharding
    * and chunking introduce zero approximation, ever (StreamsSpec
    * asserts array equality, not bounds). State is
    * `shards × depth × width` longs TOTAL on an unbounded stream. */
  def cmsShards(terms: Dataset[String], depth: Int, width: Int,
      shards: Int = 16)(implicit spark: SparkSession): Dataset[ShardCms] = {
    import spark.implicits._
    val agg = new graft.functions.Aggregators.CountMin(depth, width)
    terms.map(t => (math.floorMod(t.hashCode, shards), t))
      .groupByKey(_._1)
      .mapGroupsWithState[Array[Long], ShardCms](
        GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[(Int, String)],
            state: GroupState[Array[Long]]) =>
          var buf = state.getOption.getOrElse(agg.zero)
          rows.foreach { case (_, t) => buf = agg.reduce(buf, t) }
          state.update(buf)
          // version = row-0 counter total = terms seen (each term
          // increments exactly one width-slot in depth row 0) — monotone
          ShardCms(shard, buf.view.slice(0, width).sum, buf.toSeq)
      }
  }

  /** Elementwise-sum the latest shard sketches into the global CMS. */
  def mergeCms(sketches: Seq[Seq[Long]]): Seq[Long] =
    sketches.reduce((a, b) => a.lazyZip(b).map(_ + _))

  final case class DayWau(day: String, version: Long, wau_est: Double,
      sketch: Seq[Long])

  /** Streaming rolling 7-day distinct users — the streaming twin of
    * batch e26's windowed COUNT(DISTINCT), at KMV sketch precision.
    * Each event fans out to the ≤7 observation days it serves (the
    * same bounded fan-out that turns the batch sliding distinct into
    * one equi-aggregation — a distinct is not subtractable, so no
    * incremental window trick exists), and every observation day
    * folds the user's 64-bit hash into ONE bounded KMV buffer in
    * keyed state: ≤ k longs per calendar day, forever — an unbounded
    * stream cannot grow it. The buffer is a pure function of the
    * observed (day, user) SET (order-independent, merge-idempotent,
    * duplicate-proof), so streamed chunks equal the batch sketch
    * EXACTLY, and while a day's distinct users stay under k the
    * estimate is exact (StreamsSpec asserts both). `version` is the
    * monotone processed-row count; a consumer keeps the newest row
    * per day and filters to its activity spine (days past the last
    * event carry partial look-ahead state by construction). */
  def rollingWauDays(events: Dataset[Ev], k: Int = 256)(
      implicit spark: SparkSession): Dataset[DayWau] = {
    import spark.implicits._
    val agg = new graft.functions.Aggregators.Kmv(k)
    // day bucketing follows the SESSION time zone, like the batch
    // twin's to_date(ts) — a hardcoded UTC would silently shift every
    // near-midnight event's window under a non-UTC session
    val zone = java.time.ZoneId.of(
      spark.sessionState.conf.sessionLocalTimeZone)
    events.flatMap { e =>
      val day = e.ts.toInstant.atZone(zone).toLocalDate
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashLong(e.user_id, 42L)
      (0 until 7).map(off => (day.plusDays(off).toString, h))
    }
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Seq[Long]), DayWau](
        GroupStateTimeout.NoTimeout) {
        (day: String, rows: Iterator[(String, Long)],
            state: GroupState[(Long, Seq[Long])]) =>
          var (n, buf) = state.getOption.getOrElse((0L, agg.zero))
          rows.foreach { case (_, h) => buf = agg.reduce(buf, h); n += 1 }
          state.update((n, buf))
          DayWau(day, n,
            graft.functions.Aggregators.Kmv.estimate(buf, k), buf)
      }
  }

  final case class GrowthInc(day_num: Long, kind: String)
  final case class GrowthState(lastDay: Long, churned: Boolean,
      pending: Seq[Long])

  /** Streaming twin of batch e29 growth accounting: decompose each
    * user-day into new / retained / resurrected and emit churn
    * increments. A day is CLASSIFIED ONLY ONCE THE WATERMARK CLOSES
    * IT (any still-missing event for an earlier day would be late
    * beyond the watermark), so out-of-order arrival WITHIN the
    * watermark across micro-batches classifies identically to the
    * batch twin — arrival order inside the tolerance never fabricates
    * a churn or drops a day. Per-user state is (lastFinalizedDay,
    * churnEmitted, pending not-yet-closed days): the pending buffer
    * is bounded by the watermark horizon in DAYS, not by stream
    * length. Churn at lastDay+1 fires when that day closes — via
    * event-time timeout when no data arrives — exactly once (the
    * `churned` flag survives replays). Day bucketing follows the
    * session time zone like the batch twin's `to_date(ts)`; days at
    * or before the finalized frontier are ignored (at-least-once
    * safe). A consumer joins the increments to its observed day
    * spine, which is where the batch twin's "churn days outside the
    * spine drop" rule lives — per-user state cannot know the global
    * spine. */
  def growthIncrements(events: Dataset[Ev],
      watermark: String = "10 minutes",
      retentionDays: Option[Int] = None)(
      implicit spark: SparkSession): Dataset[GrowthInc] = {
    import spark.implicits._
    val zone = java.time.ZoneId.of(
      spark.sessionState.conf.sessionLocalTimeZone)
    def dayEndMs(d: Long): Long = java.time.LocalDate.ofEpochDay(d + 1)
      .atStartOfDay(zone).toInstant.toEpochMilli
    // retention horizon: WITHOUT it, one state row per user ever seen
    // lives forever — bounded per user, unbounded in lifetime user
    // cardinality. With it, a churned user whose pending buffer has
    // drained is REMOVED once the watermark passes churn-day-end +
    // horizon; the documented trade is that a reappearance beyond the
    // horizon classifies as "new", not "resurrected" (a consumer that
    // needs lifetime resurrection keeps retentionDays = None and
    // accepts user-cardinality state, like the batch twin's full
    // history scan).
    val retentionMs = retentionDays.map(_ * 86400000L)
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[GrowthState, GrowthInc](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, evs: Iterator[Ev], state: GroupState[GrowthState]) =>
          val wm = state.getCurrentWatermarkMs()
          if (state.hasTimedOut && retentionMs.exists(r =>
              state.getOption.exists(s => s.churned && s.pending.isEmpty &&
                s.lastDay != Long.MinValue &&
                wm >= dayEndMs(s.lastDay + 1) + r))) {
            // churn already emitted, nothing pending, horizon passed:
            // retire the user's row
            state.remove()
            Iterator.empty
          } else {
          val newDays = if (state.hasTimedOut) Array.empty[Long]
            else evs
              .map(e => e.ts.toInstant.atZone(zone).toLocalDate.toEpochDay)
              .toArray.distinct
          var st = state.getOption
            .getOrElse(GrowthState(Long.MinValue, churned = true, Nil))
          val pending = (st.pending ++ newDays).distinct
            .filter(d => st.lastDay == Long.MinValue || d > st.lastDay)
            .sorted
          val out = Seq.newBuilder[GrowthInc]
          var last = st.lastDay; var churned = st.churned
          var rest = pending
          // finalize every pending day the watermark has closed, in
          // order; each finalization may first settle the churn gap
          // behind it
          while (rest.nonEmpty && dayEndMs(rest.head) <= wm) {
            val d = rest.head
            if (last == Long.MinValue) out += GrowthInc(d, "new")
            else if (d == last + 1) out += GrowthInc(d, "retained")
            else {
              if (!churned) out += GrowthInc(last + 1, "churned")
              out += GrowthInc(d, "resurrected")
            }
            last = d; churned = false
            rest = rest.tail
          }
          // churn behind the frontier: decidable once day last+1 closes
          // and no pending day can fill it
          if (last != Long.MinValue && !churned &&
              dayEndMs(last + 1) <= wm &&
              (rest.isEmpty || rest.head > last + 1)) {
            out += GrowthInc(last + 1, "churned")
            churned = true
          }
          state.update(GrowthState(last, churned, rest))
          // wake when the next decision point closes: the first
          // pending day, or the churn day behind an idle frontier
          val next =
            if (rest.nonEmpty) Some(dayEndMs(rest.head))
            else if (last != Long.MinValue && !churned)
              Some(dayEndMs(last + 1))
            else retentionMs.collect {
              // fully settled: schedule the retirement sweep
              case r if last != Long.MinValue => dayEndMs(last + 1) + r
            }
          next.foreach(t => state.setTimeoutTimestamp(math.max(t, wm + 1)))
          out.result().iterator
          }
      }
  }

  /** Fold emitted shard buffers into the global top-k with the batch
    * Aggregator's merge (callers pass each shard's LATEST buffer —
    * highest `version`). Exact (err=0) when no shard ever evicted. */
  def mergeHeavyHitters(shardBufs: Seq[Map[String, (Long, Long)]],
      capacity: Int, k: Int): Seq[graft.functions.Aggregators.HeavyHitter] = {
    val agg = new graft.functions.Aggregators.SpaceSaving(capacity, k)
    agg.finish(shardBufs.foldLeft(agg.zero)(agg.merge))
  }

  /** Streaming ingest INTO the merge-semantics bronze table: each
    * micro-batch lands through `BronzeMerge.mergeIngestDf`, so
    * exactly-once holds on TWO independent legs — the checkpoint stops
    * the source re-reading files, and the identity-key anti-join stops
    * re-read files re-landing. Losing the checkpoint (the classic
    * streaming dup source) therefore still produces zero duplicates:
    * the source replays everything, the merge appends nothing.
    *
    * Crash anatomy (why restart-from-checkpoint is exact): a crash
    * BEFORE the manifest commit leaves an orphan uncommitted batch
    * directory — invisible to readers, side-stepped by the retry's
    * collision-free batch naming, reclaimed by vacuum; a crash AFTER
    * the commit but before the checkpoint marks the micro-batch done
    * replays the same files into the anti-join, which appends nothing.
    * Either way the restarted run converges on exactly the
    * uninterrupted run's table. `onBeforeCommit` (forwarded to
    * `mergeIngestDf`) and `onBatchDone` (after a micro-batch's merge
    * returns) are the fault-injection seams StreamsSpec drives those
    * two crash points through; production callers leave the defaults.
    *
    * NOTE a plain file directory carries no source item id, so rows
    * landed here are id-LESS (legacy identity): fine for ingest and
    * re-run idempotence, but [[discoverIncrement]]'s id-keyed
    * tombstone deletes cannot address them — a catalog-driven drain
    * that must observe source deletions should land blobs WITH the
    * staged `id` as `source_item_id` (see the tombstone doc on
    * [[discoverIncrement]]). */
  def streamMergeIngest(spark: SparkSession, srcDir: String,
      table: String, checkpoint: String,
      onBeforeCommit: () => Unit = () => (),
      onBatchDone: () => Unit = () => ()): Unit = {
    val q = spark.readStream
      .format("binaryFile")
      // the binaryFile source's fixed schema (streaming requires it
      // spelled out)
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("modificationTime",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("length",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType))))
      .load(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.ingest.BronzeMerge.mergeIngestDf(batch.sparkSession,
          batch.select(
            substring_index(col("path"), "/", -1).as("file_name"),
            col("length"), col("modificationTime").as("modified"),
            col("content")), table, onBeforeCommit = onBeforeCommit)
        onBatchDone()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** One scheduled INCREMENTAL-DISCOVERY round (Graph delta query →
    * staged catalog write): load the previous deltaLink, fetch only
    * the items changed since it, land the live file rows in
    * `stagingDir` as parquet, and persist the new deltaLink.
    * Discovery cost is O(changes) — the fix for the reference's
    * full-catalog re-list every run
    * (`sharepoint_to_bronze_delta.py:72-77`).
    *
    * Ordering is data-then-checkpoint: a crash between the two
    * re-fetches one change window on restart (at-least-once), which
    * the downstream bronze MERGE dedupes — the same C4 contract as
    * every other re-run in the pipeline. The staged catalog itself is
    * WINDOW-IDEMPOTENT, not merely append-only: each window's rows
    * land under `stagingDir/window=<tag>` where the tag derives from
    * the window's own identity (the deltaLink the window synced FROM
    * — a replayed window is by definition the same token), written
    * with overwrite. A crash-replayed window therefore rewrites its
    * own partition instead of double-appending the catalog — exactly
    * one row per (id, window) however many times the window replays —
    * and a multi-year catalog compacts per-partition (rewrite old
    * `window=` dirs, never the live one; SCALE.md). Readers see one
    * logical dataset: `spark.read.parquet(stagingDir)` partition-
    * discovers the window column. The staged rows feed any
    * `Trigger.AvailableNow` consumer ([[streamMergeIngest]]-style):
    * each scheduled run drains discovery AND the stream in one shot,
    * so catalog freshness costs one delta round-trip plus the bytes
    * that actually changed. Returns the landed items (deleted and
    * folder tombstones excluded from staging but returned for audit).
    *
    * TOMBSTONE PROPAGATION: when `bronzeTable` is given, `deleted`
    * facets are composed end-to-end into the bronze DELETE path,
    * keyed on the SOURCE ITEM ID — the same identity the reference's
    * own delete is scoped to (`sharepoint_to_bronze_delta.py:105-109`
    * DELETEs a specific drive item by id). The blob-fetch drain must
    * therefore carry the staged catalog's `id` into bronze as
    * [[graft.ingest.BronzeMerge.IdCol]] (`source_item_id`); a Graph
    * tombstone carries only id+name, and the id is the ONLY key that
    * distinguishes a deleted file from a deleted folder with the same
    * name, from a never-ingested item, and from a live same-name
    * same-size file in another folder — each of those is a structural
    * no-op here (no bronze row carries the dead id), with no
    * staged-catalog resolution or claim bookkeeping needed. Small
    * windows delete via one flat hashed In on the id
    * ([[graft.ingest.BronzeMerge.deleteWhere]]); a window past
    * [[MassTombstoneThreshold]] (a deleted source FOLDER can carry
    * millions of tombstones) keeps the dead ids a DataFrame and
    * deletes by anti-join ([[graft.ingest.BronzeMerge
    * .deleteMatchingKeys]]) — never a million-literal expression.
    * Without this path an incremental sync that observes a
    * source-side deletion would leave bronze diverged forever
    * (the reference's only delete semantics is its
    * archive-then-delete flow, `sharepoint_to_bronze_delta.py:229-230`
    * — source deletions must reach the lakehouse). Ordering is
    * delete-then-checkpoint: a crash in between replays the tombstone
    * window on restart and the delete re-runs idempotently
    * (at-least-once, no-op when nothing matches). The id-qualified
    * identity key is retained by `deleteWhere`, so a redelivered blob
    * of the DELETED item cannot resurrect its rows — while a
    * byte-identical re-create under a fresh id is a new identity and
    * lands (C3/C4). A tombstone arriving before the table's first
    * commit (or against a legacy id-less bronze, whose batches
    * predate `source_item_id`) is a safe no-op.
    *
    * `drain` is the blob-landing hook, invoked with the WINDOW's
    * items after staging and BEFORE the tombstone delete and the
    * checkpoint save ([[drainWindow]] is the production
    * implementation; [[syncToBronze]] wires it). The ordering makes
    * the whole window at-least-once as a unit: a crash anywhere
    * before the checkpoint replays stage + drain + delete, each of
    * which is idempotent (append-dedup / merge / keyed no-op) — a
    * drain placed AFTER the checkpoint would instead strand a
    * staged-but-never-landed window on the crash path. Drain runs
    * before delete so a same-window delete+re-create lands the new
    * generation before the old one's id-scoped delete fires (order
    * is immaterial for correctness under id keys, but this way the
    * merge-on-read view never observes an empty name mid-window).
    */
  def discoverIncrement(spark: SparkSession,
      provider: graft.pipeline.DeltaListingProvider,
      checkpoint: graft.pipeline.DeltaCheckpoint,
      stagingDir: String,
      bronzeTable: Option[String] = None,
      drain: Seq[graft.pipeline.DeltaListing.DeltaItem] => Unit = _ => ())
      : Seq[graft.pipeline.DeltaListing.DeltaItem] = {
    import spark.implicits._
    val fromToken = checkpoint.load()
    val result = provider.sync(fromToken)
    val live = result.items.filter(it => !it.deleted && it.mime != null)
    if (live.nonEmpty)
      live.toDF().write.mode("overwrite")
        .parquet(s"${stagingDir.stripSuffix("/")}/window=" +
          stagingWindowTag(fromToken))
    drain(result.items)
    // Tombstones delete BY SOURCE ITEM ID — the identity the Graph
    // tombstone actually carries and the identity the reference's own
    // DELETE is scoped to. Bronze rows carry `source_item_id`
    // (BronzeMerge.IdCol, landed by the id-carrying drain), so the
    // delete is a direct key match: a deleted FOLDER named like an
    // ingested file, a never-ingested item, and a live same-name
    // same-size file in another folder all miss by construction —
    // no staged-catalog claims join, no tombstone-history sidecar,
    // no name+size attribution heuristic. (Those existed only to
    // compensate for id-less bronze rows; against a LEGACY table
    // whose batches predate the id column every tombstone is a safe
    // no-op — deleteWhere reads the missing column as null.)
    val deadIds = result.items.filter(_.deleted).map(_.id).distinct
    bronzeTable.foreach { table =>
      // only a committed table can hold rows to remove; an empty or
      // not-yet-created bronze makes every tombstone a no-op
      if (deadIds.nonEmpty &&
          graft.ingest.BronzeMerge.currentCommit(spark, table)._2.nonEmpty) {
        if (!graft.ingest.BronzeMerge.carriesIds(spark, table))
          // LEGACY TABLE (every batch predates source_item_id): an
          // id-keyed delete is a structural no-op, so source
          // deletions would silently stop propagating and bronze
          // would diverge forever. Warn LOUDLY and skip the
          // guaranteed-no-op table scan; the operator runs
          // BronzeMerge.backfillIds (mapping from the staged
          // catalog) once, after which deletes flow again.
          log.warn(s"tombstone window (${deadIds.size} ids) against " +
            s"id-less bronze table $table: every batch predates " +
            "source_item_id, so id-keyed deletes CANNOT match — " +
            "bronze will diverge from the source until " +
            "BronzeMerge.backfillIds migrates the table")
        else {
          val idCol = col(graft.ingest.BronzeMerge.IdCol)
          if (deadIds.size <= MassTombstoneThreshold)
            // ONE flat hashed In — never a per-id Or chain whose
            // analysis depth is the tombstone count
            graft.ingest.BronzeMerge.deleteWhere(spark, table,
              idCol.isin(deadIds: _*))
          else
            // a deleted source folder can carry millions of
            // tombstones: keep them a DataFrame and anti-join — no
            // O(tombstones)-literal expression tree. (The ids are
            // already driver-resident — the listing provider returns
            // the window as a Seq — so toDF adds no new driver copy.)
            graft.ingest.BronzeMerge.deleteMatchingKeys(spark, table,
              deadIds.toDF(graft.ingest.BronzeMerge.IdCol),
              Seq(graft.ingest.BronzeMerge.IdCol))
          ()
        }
      }
    }
    checkpoint.save(result.deltaLink)
    result.items
  }

  /** Tombstone-window size above which [[discoverIncrement]] switches
    * from a literal-In delete predicate to the DataFrame anti-join
    * ([[graft.ingest.BronzeMerge.deleteMatchingKeys]]). */
  val MassTombstoneThreshold = 1000

  private val log =
    org.slf4j.LoggerFactory.getLogger("graft.streaming.Streams")

  /** Window tag for the idempotent staged catalog: a stable digest of
    * the deltaLink the window synced FROM (absent = the initial full
    * sync) — a replayed window is BY DEFINITION the same from-token,
    * so its staging write overwrites its own `window=` partition
    * instead of appending a duplicate copy. Prefixed non-numeric so
    * partition discovery always infers a string column. */
  private[graft] def stagingWindowTag(fromToken: Option[String]): String =
    "w" + java.security.MessageDigest.getInstance("SHA-256")
      .digest(fromToken.getOrElse("").getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString

  /** One drain item whose blob fetch failed, PARKED instead of
    * wedging the window — the engine-side form of the reference's
    * per-file error isolation (C2, `sharepoint_to_bronze_delta.py:
    * 213-219`: download/upload failure → log + skip + continue).
    * Carries everything a later window needs to retry the fetch
    * (identity, name, stamp, listed size) plus the captured error. */
  final case class QuarantinedItem(
      source_item_id: String,
      file_name: String,
      modified: java.sql.Timestamp,
      size: java.lang.Long,
      error: String)

  /** A drain's outcome: rows appended to bronze plus the items whose
    * fetch failed (always empty when failure isolation is off — a
    * failure then aborts the window instead). */
  final case class DrainResult(appended: Long, failed: Seq[QuarantinedItem])

  /** Land one discovery window's live blobs into bronze BY ITEM ID —
    * the production drain the id-keyed tombstone contract assumes
    * (the specs' driver-side stand-ins model it). Each live file item
    * fetches `<driveBaseUrl>/items/<id>/content` — the reference's
    * own download identity (`sharepoint_to_bronze_delta.py:163-176`
    * downloads by drive item) — EXECUTOR-SIDE through the chunked
    * range-GET ([[graft.pipeline.HttpListing.ChunkedTransfer]]:
    * O(chunkBytes) transfer slices, per-chunk retry; the assembled
    * row is O(file), the floor for a content-column store — see
    * `filesZone` for blobs that must never be rows), then lands
    * `(source_item_id, file_name, length, modified, content)`
    * through the idempotent merge. Bandwidth is O(window), never
    * O(catalog): callers hand the CHANGED items, so an unchanged
    * 100 TB corpus costs one delta round-trip plus only the bytes
    * that moved. Re-drains of a replayed window re-fetch but re-land
    * nothing (the id-qualified keys dedupe — at-least-once fetch,
    * exactly-once rows, C4). `length` is the FETCHED byte count
    * (authoritative over the listing's size facet); `modified` is
    * each item's REAL change stamp ([[graft.pipeline.DeltaListing
    * .DeltaItem]].modified — replays key identically because the
    * stamp comes from the listing, not a clock), with the fixed-epoch
    * parameter as the fallback for stamp-less payloads. Returns
    * appended rows. */
  def drainWindow(spark: SparkSession,
      transport: graft.pipeline.HttpListing.Transport,
      driveBaseUrl: String,
      items: Seq[graft.pipeline.DeltaListing.DeltaItem],
      table: String,
      policy: graft.pipeline.HttpListing.RetryPolicy =
        graft.pipeline.HttpListing.RetryPolicy(),
      chunkBytes: Int = 8 << 20,
      modified: java.sql.Timestamp = new java.sql.Timestamp(0L),
      filesZone: Option[String] = None,
      largeBlobBytes: Long = Long.MaxValue): Long = {
    import spark.implicits._
    val meta = windowMeta(items, modified)
    if (meta.isEmpty) return 0L
    drainItems(spark, transport, driveBaseUrl,
      spark.createDataset(meta)
        .toDF("source_item_id", "file_name", "modified", "size"),
      table, policy, chunkBytes, modified, filesZone, largeBlobBytes)
  }

  /** A window Seq's live items as drain-meta tuples
    * (id, name, stamp-or-fallback, listed size). */
  private def windowMeta(items: Seq[graft.pipeline.DeltaListing.DeltaItem],
      fallback: java.sql.Timestamp)
      : Seq[(String, String, java.sql.Timestamp, Option[Long])] =
    items.filter(it => !it.deleted && it.mime != null)
      .map(it => (it.id, it.name,
        Option(it.modified).getOrElse(fallback),
        Option(it.size).map(_.toLong))).distinct

  /** [[drainWindow]]'s relation-driven core: `meta` is any
    * `(source_item_id, file_name[, modified][, size])` DataFrame — a
    * window Seq lifted by the wrapper, or the window-slice relation
    * the PAGED discovery writes ([[discoverIncrementPaged]]), which
    * never existed as a driver collection at all (missing columns
    * default to the fallback stamp / unknown size). Fetch is
    * executor-side per partition; duplicates are collapsed so every
    * id fetches once, keeping the LATEST stamp (an item updated twice
    * in one window has one current content, keyed off the newest
    * generation). A fetch failure aborts the window (fail-loud →
    * checkpoint never advances → replay-to-success); for per-item
    * isolation use [[drainItemsIsolated]]. */
  def drainItems(spark: SparkSession,
      transport: graft.pipeline.HttpListing.Transport,
      driveBaseUrl: String,
      meta: DataFrame,
      table: String,
      policy: graft.pipeline.HttpListing.RetryPolicy =
        graft.pipeline.HttpListing.RetryPolicy(),
      chunkBytes: Int = 8 << 20,
      modified: java.sql.Timestamp = new java.sql.Timestamp(0L),
      filesZone: Option[String] = None,
      largeBlobBytes: Long = Long.MaxValue): Long =
    drainCore(spark, transport, driveBaseUrl, meta, table, policy,
      chunkBytes, modified, filesZone, largeBlobBytes,
      isolate = false).appended

  /** [[drainItems]] with the reference's PER-FILE error isolation
    * (C2): each item's fetch error is captured INSIDE the fetch
    * partition instead of failing the task, the good items land, and
    * the failures come back as [[QuarantinedItem]]s for the caller to
    * park and retry — one permanently dead item (the routine 404 from
    * a delete between list and fetch, a forever-5xx corrupt blob) can
    * no longer freeze the deltaLink and wedge all future ingestion.
    * Failure capture rides a collection accumulator: O(failures)
    * driver memory (poison items are the exception path by design —
    * a systemic outage is better served by the fail-loud
    * [[drainItems]], whose replay-to-success the fault-injection spec
    * pins), deduped by id because task retries can double-report. */
  def drainItemsIsolated(spark: SparkSession,
      transport: graft.pipeline.HttpListing.Transport,
      driveBaseUrl: String,
      meta: DataFrame,
      table: String,
      policy: graft.pipeline.HttpListing.RetryPolicy =
        graft.pipeline.HttpListing.RetryPolicy(),
      chunkBytes: Int = 8 << 20,
      modified: java.sql.Timestamp = new java.sql.Timestamp(0L),
      filesZone: Option[String] = None,
      largeBlobBytes: Long = Long.MaxValue): DrainResult =
    drainCore(spark, transport, driveBaseUrl, meta, table, policy,
      chunkBytes, modified, filesZone, largeBlobBytes, isolate = true)

  /** Shared fetch-and-merge core. SIZE-THRESHOLD ROUTER (`filesZone`):
    * items whose LISTED size reaches `largeBlobBytes` stream chunk by
    * chunk straight to `<filesZone>/<id>` through the Hadoop
    * FileSystem — O(chunkBytes) peak heap, never a `ByteArrayOutput
    * Stream` and never a content column (whose `Array[Byte]` ceiling
    * is 2 GiB) — and bronze lands a PATH-REFERENCE row (`content` null,
    * `content_path` set, `length` = streamed byte count). This is the
    * reference's own big-file semantics: K1 streams files into the
    * lakehouse Files area (`sharepoint_to_bronze_delta.py:173-176`
    * via `mssparkutils.fs.cp`) rather than a table row. The zone
    * write is overwrite-idempotent (a replayed window rewrites the
    * same bytes at the same path); the id-keyed tombstone path also
    * removes the zone file ([[syncToBronze]]/[[syncToBronzePaged]]).
    * The single fetch pass feeds the merge AND the failure capture —
    * content bytes are never fetched twice and never pinned. */
  private def drainCore(spark: SparkSession,
      transport: graft.pipeline.HttpListing.Transport,
      driveBaseUrl: String,
      meta: DataFrame,
      table: String,
      policy: graft.pipeline.HttpListing.RetryPolicy,
      chunkBytes: Int,
      modified: java.sql.Timestamp,
      filesZone: Option[String],
      largeBlobBytes: Long,
      isolate: Boolean): DrainResult = {
    import spark.implicits._
    val withMod =
      if (meta.columns.contains("modified")) meta
      else meta.withColumn("modified", lit(modified))
    val withSize =
      if (withMod.columns.contains("size")) withMod
      else withMod.withColumn("size", lit(null).cast("long"))
    // one fetch per id, newest stamp wins (struct max orders on
    // `modified` first); AQE re-coalesces the aggregate's output so
    // small windows don't fan into hundreds of empty fetch tasks
    val one = withSize
      .select(col("source_item_id"), col("file_name"),
        coalesce(col("modified"), lit(modified)).as("modified"),
        col("size").cast("long").as("size"))
      .groupBy(col("source_item_id"))
      .agg(max(struct(col("modified"), col("file_name"), col("size")))
        .as("m"))
      .select(col("source_item_id"), col("m.file_name").as("file_name"),
        col("m.modified").as("modified"), col("m.size").as("size"))
    val failAcc = spark.sparkContext
      .collectionAccumulator[QuarantinedItem]("graft.drain.quarantine")
    val zone = filesZone.orNull
    val confBc =
      if (filesZone.isDefined)
        spark.sparkContext.broadcast(
          new org.apache.spark.util.SerializableConfiguration(
            spark.sessionState.newHadoopConf()))
      else null
    val fetched = one
      .as[(String, String, java.sql.Timestamp, Option[Long])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, name, mod, size) =>
          val url = s"$driveBaseUrl/items/$id/content"
          try {
            if (zone != null && size.exists(_ >= largeBlobBytes)) {
              // large blob: stream to the Files zone, land a
              // path-reference row — O(chunkBytes) peak heap
              val dest = new org.apache.hadoop.fs.Path(zone, id)
              val fsz = dest.getFileSystem(confBc.value.value)
              val out = fsz.create(dest, true)
              val n =
                try graft.pipeline.HttpListing.ChunkedTransfer.fetchTo(
                  transport, policy, (ms: Long) => Thread.sleep(ms))(
                  url, out, chunkBytes)
                finally out.close()
              Some((id, name, n, mod, null: Array[Byte],
                dest.toString))
            } else {
              val buf = new java.io.ByteArrayOutputStream()
              graft.pipeline.HttpListing.ChunkedTransfer.fetchTo(
                transport, policy, (ms: Long) => Thread.sleep(ms))(
                url, buf, chunkBytes)
              val bytes = buf.toByteArray
              Some((id, name, bytes.length.toLong, mod, bytes,
                null: String))
            }
          } catch {
            case scala.util.control.NonFatal(e) if isolate =>
              failAcc.add(QuarantinedItem(id, name, mod,
                size.map(java.lang.Long.valueOf).orNull,
                (e.getClass.getSimpleName + ": " +
                  String.valueOf(e.getMessage)).take(512)))
              None
          }
        }
      }
      .toDF("source_item_id", "file_name", "length", "modified",
        "content", "content_path")
    // keep the exact legacy 5-column shape unless the zone is in play
    // (schema evolution on a mixed table is opt-in via mergeSchema)
    val landed =
      if (filesZone.isDefined) fetched else fetched.drop("content_path")
    val appended = graft.ingest.BronzeMerge.mergeIngestDf(spark, landed,
      table)
    val failed =
      if (!isolate) Seq.empty[QuarantinedItem]
      else {
        import scala.jdk.CollectionConverters._
        failAcc.value.asScala.toSeq
          .groupBy(_.source_item_id).values.map(_.head)
          .toSeq.sortBy(_.source_item_id)
      }
    DrainResult(appended, failed)
  }

  /** The parked-failure relation at `dir` (empty when absent). */
  private[graft] def readQuarantine(spark: SparkSession,
      dir: String): Seq[QuarantinedItem] = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(dir)
    val fsq = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fsq.exists(p)) Seq.empty
    else spark.read.parquet(dir).as[QuarantinedItem].collect().toSeq
  }

  /** Overwrite the quarantine relation with the CURRENT failure set —
    * state, not a log: every window retries everything quarantined,
    * so post-window failures are the complete parked set and the
    * overwrite is idempotent under window replay (the write happens
    * before the checkpoint, so a crash replays and rewrites it). An
    * empty set deletes the directory. */
  private[graft] def writeQuarantine(spark: SparkSession, dir: String,
      items: Seq[QuarantinedItem]): Unit = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(dir)
    val fsq = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (items.isEmpty) { fsq.delete(p, true); () }
    else spark.createDataset(items).toDF()
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** The reference's whole sync loop in one call
    * (`sharepoint_to_bronze_delta.py:237-277`, incremental form):
    * delta-discover the changed window, stage the catalog, land the
    * changed blobs by id ([[drainWindow]]), propagate tombstones as
    * id-keyed bronze deletes, then checkpoint — each leg idempotent,
    * so the scheduled re-run IS the crash recovery. Returns the
    * window's items.
    *
    * FAILURE MODES, chosen per `quarantineDir`:
    *  - `None` (default): fail-loud. Any item's terminal fetch error
    *    aborts the window before the checkpoint advances; the next
    *    scheduled run replays it (the fault-injection spec pins
    *    this). Right for transient outages — wrong for a POISON item
    *    (routine 404 from a delete between list and fetch, a
    *    forever-5xx blob), which freezes the deltaLink for good.
    *  - `Some(dir)`: the reference's own C2 skip-and-continue
    *    (`sharepoint_to_bronze_delta.py:213-219`). Failed items are
    *    captured per item ([[drainItemsIsolated]]), parked in the
    *    quarantine relation at `dir`, and the WINDOW COMMITS; every
    *    later window retries the whole parked set (shrinking it on
    *    success, or when the item is tombstoned upstream) alongside
    *    its own items. The quarantine write precedes the checkpoint,
    *    so crash-replays rewrite it idempotently.
    *
    * `filesZone`: enables the large-blob router — items whose listed
    * size reaches `largeBlobBytes` stream to `<filesZone>/<id>`
    * instead of a content column ([[drainCore]] scaladoc), and a
    * TOMBSTONED id's zone file is deleted here alongside its bronze
    * rows (before the checkpoint, so a crash replays the cleanup). */
  def syncToBronze(spark: SparkSession,
      provider: graft.pipeline.DeltaListingProvider,
      checkpoint: graft.pipeline.DeltaCheckpoint,
      stagingDir: String,
      transport: graft.pipeline.HttpListing.Transport,
      driveBaseUrl: String,
      table: String,
      policy: graft.pipeline.HttpListing.RetryPolicy =
        graft.pipeline.HttpListing.RetryPolicy(),
      chunkBytes: Int = 8 << 20,
      modified: java.sql.Timestamp = new java.sql.Timestamp(0L),
      quarantineDir: Option[String] = None,
      filesZone: Option[String] = None,
      largeBlobBytes: Long = Long.MaxValue)
      : Seq[graft.pipeline.DeltaListing.DeltaItem] =
    discoverIncrement(spark, provider, checkpoint, stagingDir,
      Some(table), drain = items => {
        import spark.implicits._
        val live = windowMeta(items, modified)
        val deadIds = items.filter(_.deleted).map(_.id).toSet
        quarantineDir match {
          case None =>
            if (live.nonEmpty) {
              drainItems(spark, transport, driveBaseUrl,
                spark.createDataset(live)
                  .toDF("source_item_id", "file_name", "modified", "size"),
                table, policy, chunkBytes, modified, filesZone,
                largeBlobBytes)
              ()
            }
          case Some(qdir) =>
            val liveIds = live.map(_._1).toSet
            // retry everything parked that this window neither
            // tombstoned (dead upstream — fetching it would 404
            // forever) nor re-listed (the window's own fresher entry
            // supersedes the parked one)
            val retry = readQuarantine(spark, qdir).filterNot(q =>
              deadIds.contains(q.source_item_id) ||
                liveIds.contains(q.source_item_id))
            val metaAll = live ++ retry.map(q => (q.source_item_id,
              q.file_name, Option(q.modified).getOrElse(modified),
              Option(q.size).map(_.toLong)))
            val failed =
              if (metaAll.isEmpty) Seq.empty[QuarantinedItem]
              else drainItemsIsolated(spark, transport, driveBaseUrl,
                spark.createDataset(metaAll)
                  .toDF("source_item_id", "file_name", "modified", "size"),
                table, policy, chunkBytes, modified, filesZone,
                largeBlobBytes).failed
            if (failed.nonEmpty)
              log.warn(s"drain quarantined ${failed.size} item(s) " +
                s"(window committed; retried next window): " +
                failed.take(5).map(q =>
                  s"${q.source_item_id}=${q.error}").mkString("; "))
            writeQuarantine(spark, qdir,
              failed.filterNot(q => deadIds.contains(q.source_item_id)))
        }
        filesZone.foreach { zone =>
          if (deadIds.nonEmpty) {
            val zp = new org.apache.hadoop.fs.Path(zone)
            val fsz = zp.getFileSystem(spark.sessionState.newHadoopConf())
            deadIds.foreach(id =>
              fsz.delete(new org.apache.hadoop.fs.Path(zp, id), false))
          }
        }
      })

  /** [[discoverIncrement]] at O(page) driver memory — the variant for
    * windows that should never exist as one driver collection (a
    * deleted million-item folder tombstones every descendant in ONE
    * delta window; [[sync]]'s Seq was the last driver-side
    * O(window) bound SCALE.md r14 names). Pages stream straight from
    * the provider ([[graft.pipeline.DeltaListingProvider.syncPages]]):
    * each page's live rows append to the staging catalog AND to a
    * window-scoped `<staging>_window/live` slice, each page's
    * tombstoned ids append to `<staging>_window/dead` — so the drain
    * consumes a RELATION of this window's items and the delete is
    * ALWAYS the anti-join form over the dead relation
    * ([[graft.ingest.BronzeMerge.deleteMatchingKeys]]); no threshold,
    * no literal predicate, no driver list. The window dirs are reset
    * at window start, so a crash-replayed window (checkpoint not yet
    * advanced) rebuilds them identically; per-page appends mean
    * O(pages) small files per window, read exactly once each by the
    * drain/delete and gone at the next window. The staged catalog
    * itself is WINDOW-IDEMPOTENT like [[discoverIncrement]]'s: pages
    * append into `stagingDir/window=<tag>` (tag = digest of the
    * window's from-token), which is reset with the window dirs, so a
    * replayed window rebuilds its own partition instead of
    * double-appending the catalog. `drain` ALWAYS runs (a
    * quarantine-retrying drain has work even in an empty window) and
    * receives BOTH window relations: the live `(source_item_id,
    * file_name, modified, size)` slice and the dead-ids relation —
    * empty typed relations when the window carried none. Returns
    * (live rows staged, tombstones observed). */
  def discoverIncrementPaged(spark: SparkSession,
      provider: graft.pipeline.DeltaListingProvider,
      checkpoint: graft.pipeline.DeltaCheckpoint,
      stagingDir: String,
      bronzeTable: Option[String] = None,
      drain: (DataFrame, DataFrame) => Unit = (_, _) => ()): (Long, Long) = {
    import spark.implicits._
    val fromToken = checkpoint.load()
    val stagingWindowDir = s"${stagingDir.stripSuffix("/")}/window=" +
      stagingWindowTag(fromToken)
    val windowDir = s"${stagingDir.stripSuffix("/")}_window"
    val liveDir = s"$windowDir/live"
    val deadDir = s"$windowDir/dead"
    val fsW = new org.apache.hadoop.fs.Path(windowDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // window-scoped: replays rebuild both (the staging partition is
    // THIS window's — resetting it is what makes the catalog
    // window-idempotent instead of append-only-forever)
    fsW.delete(new org.apache.hadoop.fs.Path(windowDir), true)
    fsW.delete(new org.apache.hadoop.fs.Path(stagingWindowDir), true)
    var nLive = 0L
    var nDead = 0L
    val link = provider.syncPages(fromToken) { page =>
      val live = page.filter(it => !it.deleted && it.mime != null)
      if (live.nonEmpty) {
        live.toDF().write.mode("append").parquet(stagingWindowDir)
        live.map(it => (it.id, it.name, it.modified,
            Option(it.size).map(_.toLong)))
          .toDF("source_item_id", "file_name", "modified", "size")
          .write.mode("append").parquet(liveDir)
      }
      val dead = page.filter(_.deleted).map(_.id)
      if (dead.nonEmpty)
        dead.toDF(graft.ingest.BronzeMerge.IdCol)
          .write.mode("append").parquet(deadDir)
      nLive += live.size
      nDead += dead.size
    }
    val liveRel =
      if (nLive > 0) spark.read.parquet(liveDir)
      else spark.createDataset(
          Seq.empty[(String, String, java.sql.Timestamp, Option[Long])])
        .toDF("source_item_id", "file_name", "modified", "size")
    val deadRel =
      if (nDead > 0) spark.read.parquet(deadDir)
      else spark.createDataset(Seq.empty[String])
        .toDF(graft.ingest.BronzeMerge.IdCol)
    drain(liveRel, deadRel)
    bronzeTable.foreach { table =>
      if (nDead > 0 &&
          graft.ingest.BronzeMerge.currentCommit(spark, table)._2.nonEmpty) {
        if (!graft.ingest.BronzeMerge.carriesIds(spark, table))
          log.warn(s"tombstone window ($nDead ids) against id-less " +
            s"bronze table $table: every batch predates " +
            "source_item_id, so id-keyed deletes CANNOT match — " +
            "bronze will diverge from the source until " +
            "BronzeMerge.backfillIds migrates the table")
        else {
          graft.ingest.BronzeMerge.deleteMatchingKeys(spark, table,
            spark.read.parquet(deadDir),
            Seq(graft.ingest.BronzeMerge.IdCol))
          ()
        }
      }
    }
    checkpoint.save(link)
    (nLive, nDead)
  }

  /** [[syncToBronze]] at O(page) driver memory: paged discovery with
    * the relation-driven drain ([[drainItems]]) wired in — the
    * composition for sources whose change windows can be arbitrarily
    * large. Same `quarantineDir`/`filesZone`/`largeBlobBytes`
    * semantics as [[syncToBronze]]; here the parked set is reconciled
    * against the window's DEAD RELATION by anti-join (the tombstone
    * side can be O(window) — only the quarantine itself, O(failures),
    * is ever driver-resident) and zone-file cleanup runs executor-
    * side over the dead relation. Returns (live rows staged,
    * tombstones observed). */
  def syncToBronzePaged(spark: SparkSession,
      provider: graft.pipeline.DeltaListingProvider,
      checkpoint: graft.pipeline.DeltaCheckpoint,
      stagingDir: String,
      transport: graft.pipeline.HttpListing.Transport,
      driveBaseUrl: String,
      table: String,
      policy: graft.pipeline.HttpListing.RetryPolicy =
        graft.pipeline.HttpListing.RetryPolicy(),
      chunkBytes: Int = 8 << 20,
      modified: java.sql.Timestamp = new java.sql.Timestamp(0L),
      quarantineDir: Option[String] = None,
      filesZone: Option[String] = None,
      largeBlobBytes: Long = Long.MaxValue)
      : (Long, Long) =
    discoverIncrementPaged(spark, provider, checkpoint, stagingDir,
      Some(table), drain = (liveRel, deadRel) => {
        import spark.implicits._
        quarantineDir match {
          case None =>
            if (!liveRel.isEmpty) {
              drainItems(spark, transport, driveBaseUrl, liveRel, table,
                policy, chunkBytes, modified, filesZone, largeBlobBytes)
              ()
            }
          case Some(qdir) =>
            val prior = readQuarantine(spark, qdir)
            if (prior.nonEmpty || !liveRel.isEmpty) {
              // parked set minus tombstoned minus re-listed, by
              // anti-join — the dead side stays a relation
              val retryDf = spark.createDataset(prior).toDF()
                .join(deadRel, Seq("source_item_id"), "left_anti")
                .join(liveRel.select("source_item_id"),
                  Seq("source_item_id"), "left_anti")
                .select(col("source_item_id"), col("file_name"),
                  col("modified"), col("size"))
              val metaAll = liveRel.select(col("source_item_id"),
                  col("file_name"), col("modified"), col("size"))
                .unionByName(retryDf)
              val r = drainItemsIsolated(spark, transport, driveBaseUrl,
                metaAll, table, policy, chunkBytes, modified, filesZone,
                largeBlobBytes)
              if (r.failed.nonEmpty)
                log.warn(s"drain quarantined ${r.failed.size} item(s) " +
                  "(window committed; retried next window)")
              val kept = spark.createDataset(r.failed).toDF()
                .join(deadRel, Seq("source_item_id"), "left_anti")
                .as[QuarantinedItem].collect().toSeq
              writeQuarantine(spark, qdir, kept)
            }
        }
        filesZone.foreach { zone =>
          val confBc = spark.sparkContext.broadcast(
            new org.apache.spark.util.SerializableConfiguration(
              spark.sessionState.newHadoopConf()))
          deadRel.select(col(graft.ingest.BronzeMerge.IdCol)).as[String]
            .foreachPartition { (ids: Iterator[String]) =>
              val zp = new org.apache.hadoop.fs.Path(zone)
              val fsz = zp.getFileSystem(confBc.value.value)
              ids.foreach(id =>
                fsz.delete(new org.apache.hadoop.fs.Path(zp, id), false))
            }
        }
      })

  /** Streaming ANN index maintenance — the always-on twin of
    * [[graft.ops.Similarity.appendToCodedCorpus]]: each micro-batch
    * of (vec_id, embedding) rows is encoded under the FROZEN
    * `modelDir` model and appended into the at-rest coded table, so
    * the stored search (s16) answers over everything ingested so far
    * without ever re-encoding the corpus. Per-batch cost is
    * O(micro-batch); committed coded files are never rewritten.
    * Returns the started query — drive it with the default trigger
    * for continuous freshness or `Trigger.AvailableNow` for
    * checkpointed catch-up. Delivery: the checkpoint gives
    * effectively-once batches; a mid-batch crash can replay one
    * append, so the exactly-once composition routes embeddings
    * through the bronze table first ([[streamMergeIngest]]'s
    * identity anti-join) and feeds this from the change feed. */
  def maintainCodedCorpus(embeddings: DataFrame, modelDir: String,
      checkpoint: String, m: Int = 8, k: Int = 16, kCells: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // the memoized model/table lookups must see the SOURCE session:
    // foreachBatch runs under a per-query CLONE (batch.sparkSession),
    // and a clone-keyed memo miss would silently rebuild the coded
    // table at a fresh path and append the delta there
    val session = embeddings.sparkSession
    embeddings.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          graft.ops.Similarity.appendToCodedCorpus(session,
            modelDir, batch.select(col("vec_id"), col("embedding")),
            m, k, kCells)
          ()
        }
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }

  /** The bronze change feed as a first-class streaming input —
    * `BronzeMerge.readChanges`'s manual version-range polling turned
    * into checkpointed micro-batches by
    * [[graft.sources.BronzeChangeFeedSource]] (offsets = manifest
    * versions, recorded in the query's offset log, so a restarted
    * query resumes exactly where it stopped). Drive with
    * `Trigger.AvailableNow` for drain-and-stop catch-up or the
    * default trigger to tail the table; compose with
    * [[maintainCodedCorpus]] (project to (vec_id, embedding)) or any
    * `foreachBatch` consumer for the exactly-once
    * bronze-identity-then-derive pipeline. */
  def bronzeChangeFeed(spark: SparkSession, table: String): DataFrame =
    spark.readStream.format("bronze-cdf").option("table", table).load()

  /** Checkpointed file ingest: every file that appears in `srcDir` is
    * ingested exactly once across runs — the streaming-native
    * replacement for the reference's archive-so-not-reingested
    * bookkeeping. Runs to completion (AvailableNow) and returns. */
  def ingestFilesOnce(spark: SparkSession, srcDir: String, destDir: String,
      checkpoint: String): Unit = {
    val stream = spark.readStream
      .format("text")
      .load(srcDir)
      .withColumn("_file", lit(null).cast("string")) // schema stability
      .drop("_file")
    val q = stream.writeStream
      .format("parquet")
      .option("path", destDir)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Streaming media decode: every binary file that appears under
    * `srcDir` is decoded to features exactly once across runs — the
    * streaming twin of m08's batch binaryFile path, and the
    * streaming-native form of the reference's poll-the-folder ingest
    * (files keep arriving; the reference's archive+delete bookkeeping
    * is what kept re-polls idempotent — the checkpoint gives that for
    * free). Identity rides the file name, content flows through the
    * same batched real-BMP decode as m03/m08, features append to a
    * parquet sink. AvailableNow drains what exists, then returns;
    * re-running picks up only files the checkpoint has not seen. */
  def decodeMediaStream(spark: SparkSession, srcDir: String,
      destDir: String, checkpoint: String): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // file stream sources require an explicit schema; binaryFile's is
    // fixed by the format
    val schema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    val feats = spark.readStream.format("binaryFile").schema(schema)
      .option("pathGlobFilter", "*.bmp").load(srcDir)
      .select(
        regexp_extract(col("path"), "([0-9]+\\.bmp)$", 1).as("file_name"),
        regexp_extract(col("path"), "([0-9]+)\\.bmp$", 1)
          .cast("long").as("doc_id"),
        col("length"), col("content"))
      .as[(String, Long, Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(64).flatMap(_.map { case (fn, id, len, bs) =>
          require(len == bs.length,
            s"$fn: listed $len bytes, read ${bs.length}")
          val (w, h, mr, mg, mb, r00, g00, b00) =
            graft.ops.Multimodal.decodeBmp(bs)
          graft.ops.Multimodal.BmpFileFeatures(fn, id, bs.length, w, h,
            mr, mg, mb, r00, g00, b00)
        })
      }
    val q = feats.writeStream
      .format("parquet")
      .option("path", destDir)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
