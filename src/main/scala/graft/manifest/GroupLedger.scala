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
  * Scale posture: the ledger holds committed GROUP IDS only — O(#multi-table
  * maintenance commits), driver-side metadata, no row data, one small JSON.
  * Same single-file commit discipline as the per-table manifest; the same
  * sharding/edit-log escape hatches apply if a deployment ever approaches
  * 1e5 group commits between GCs.
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
}
