package graft.manifest

import java.nio.file.{Files, Path, StandardCopyOption}
import scala.collection.mutable
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Warehouse-global commit ledger for cross-table LOAD GROUPS — the engine's
  * analogue of Doris's global transaction ids, which is what makes a load
  * spanning several tables (an index family's postings + doclen + forward,
  * a vector index's assignments + centroids + codebooks) atomic as a UNIT
  * rather than per table. Staged rowsets carry their group id in each
  * table's manifest ([[RowsetMeta.pendingGroup]]) and are invisible
  * everywhere; THE commit point for the whole group is this file's single
  * atomic rename. Crash anywhere before the rename: no table moved (staged
  * rowsets reap as garbage). Crash anywhere after: every table's next
  * manifest load sees the committed id and activates its staged rowsets —
  * the ledger, not the per-table activation sweep, is the source of truth.
  *
  * Scale posture: the ledger holds IN-FLIGHT committed group ids only, not
  * lifetime history. A committed id is load-bearing exactly until every
  * table's manifest has activated (and persisted) its staged rowsets; after
  * that the engine's hygiene sweep ([[graft.engine.OlapEngine.sweepGroups]],
  * run by the scheduled-maintenance loop) RETIRES it via [[retire]]. That
  * keeps the file — rewritten whole on each commit, same single-file
  * atomic-rename discipline as the per-table manifest — O(groups between
  * sweeps) instead of O(lifetime commits): a year of one-group-per-minute
  * streaming folds stays a few-entry JSON, not a 500k-entry rewrite per
  * micro-batch (`LedgerScaleSpec` pins 10k commit+sweep cycles at bounded
  * file size). Retirement is safe because activation persists the stripped
  * marker BEFORE the sweep can observe "no pending stage" — a retired id
  * can never orphan a stage that still needs the heal.
  */
final class GroupLedger(warehouseRoot: Path) {
  private implicit val formats: Formats = DefaultFormats
  private val path = warehouseRoot.resolve("_group_commits.json")
  private val ids = mutable.LinkedHashSet.empty[String]

  locally {
    if (Files.exists(path)) {
      val doc = JsonMethods.parse(Files.readString(path))
      (doc \ "committed").extract[List[String]].foreach(ids.add)
    }
  }

  def committed: Set[String] = synchronized(ids.toSet)
  def isCommitted(group: String): Boolean = synchronized(ids.contains(group))

  /** THE group commit: one atomic rename makes every table's staged rowsets
    * of `group` durable-committed at the same instant. Idempotent.
    */
  def commit(group: String): Unit = synchronized {
    if (!ids.contains(group)) {
      ids.add(group)
      persistLocked()
    }
  }

  /** Retire committed ids whose groups NO table still stages — the caller
    * ([[graft.engine.OlapEngine.sweepGroups]]) proves that by force-loading
    * every warehouse manifest first (loads self-heal AND persist). One file
    * rewrite for the whole batch; unknown ids are no-ops. Returns how many
    * retired.
    */
  def retire(groups: Set[String]): Int = synchronized {
    val doomed = groups.filter(ids.contains)
    if (doomed.nonEmpty) {
      doomed.foreach(ids.remove)
      persistLocked()
    }
    doomed.size
  }

  private def persistLocked(): Unit = {
    Files.createDirectories(warehouseRoot)
    val doc = JObject("committed" ->
      JArray(ids.toList.map(g => JString(g): JValue)))
    val tmp = warehouseRoot.resolve(
      s"_group_commits.json.tmp${Thread.currentThread().getId}")
    Files.writeString(tmp, JsonMethods.compact(JsonMethods.render(doc)))
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
