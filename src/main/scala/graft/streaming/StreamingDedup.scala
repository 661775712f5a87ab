package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication: emit only the FIRST document seen per
  * normalized-content fingerprint — the continuous-ingest twin of
  * [[graft.dedup.DedupOps.exactDuplicates]] (which is the batch/backfill
  * form of the same decision).
  *
  * State per fingerprint is one tiny record ("seen, by whom"), held in
  * `flatMapGroupsWithState` — the custom-state operator family, same as
  * [[Sessionize]]. Within a micro-batch, ties break to the smallest doc_id
  * (deterministic; iterator order inside a batch is not). At the 100 TB
  * design point unbounded state is the real constraint: a production
  * deployment bounds it by ageing fingerprints out with an event-time
  * timeout exactly as [[Sessionize.sessionStateFn]] does (aged-out
  * fingerprints then re-emit on late re-arrival — the standard recall/state
  * trade; exact-forever dedup is the batch backfill join's job).
  */
object StreamingDedup {

  final case class FpDoc(fp: String, docId: Long)
  final case class SeenState(firstDocId: Long)
  final case class FirstSeen(fp: String, docId: Long)

  def firstSeenStateFn(
      fp: String,
      rows: Iterator[FpDoc],
      state: GroupState[SeenState]
  ): Iterator[FirstSeen] = {
    if (state.exists) Iterator.empty
    else {
      val first = rows.map(_.docId).min
      state.update(SeenState(first))
      Iterator(FirstSeen(fp, first))
    }
  }

  /** First-seen stream over a document stream. Fingerprint = md5 of
    * lowercased whitespace-normalized text, exactly
    * [[graft.dedup.DedupOps.exactDuplicates]]'s grouping key.
    */
  def firstSeen(docs: DataFrame): Dataset[FirstSeen] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(
        md5(graft.text.TextOps.lowerSimple(regexp_replace(col("text"), "\\s+", " ")).cast("binary")).as("fp"),
        col("doc_id").cast("long").as("docId")
      )
      .as[FpDoc]
      .groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (fp: String, rows: Iterator[FpDoc], state: GroupState[SeenState]) =>
          firstSeenStateFn(fp, rows, state)
      )
  }
}
