package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.engine.OlapEngine

/** Streaming ingest into an engine table: each micro-batch becomes one
  * atomically-published rowset — the Structured Streaming expression of the
  * reference's load→publish cycle (src/storage.rs:79-87), where a "load" is a
  * micro-batch instead of a client RPC. Versions advance monotonically per
  * batch, so MVCC snapshot reads see a consistent prefix of the stream and
  * late-arriving batches never tear a published version.
  *
  * At scale this is the standard lakehouse pattern: `foreachBatch` gives
  * exactly-once rowset publication (batch replays overwrite the same rowset id
  * via the manifest's duplicate check), and compaction folds the small
  * streaming rowsets into base rowsets out-of-band.
  */
object StreamIngest {

  /** `refreshRollups`: names of materialized rollups to keep current — after
    * each batch's publish they refresh INCREMENTALLY (delta aggregation +
    * rollup-sized merge, see `RollupManager.refreshIncremental`), so rollup
    * staleness is bounded by one micro-batch without rescanning the base.
    */
  def start(eng: OlapEngine, db: String, table: String, source: DataFrame,
            checkpoint: String, refreshRollups: Seq[String] = Nil): StreamingQuery =
    source.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // one rowset per micro-batch, with a deterministic rowset id derived
        // from the batch id: a replayed batch hits the manifest's duplicate
        // check (src/tablet.rs:118-120 analogue) and is skipped -> effectively
        // exactly-once publication.
        val rowsetId = batchId + 1
        if (!eng.manifest(db, table).allRowsets.exists(_.rowsetId == rowsetId)) {
          eng.ingest(db, table, batch, explicitRowsetId = Some(rowsetId))
        }
        refreshRollups.foreach(n => eng.rollups.refreshIncremental(db, table, n))
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
