package graft.manifest

import java.io.{DataInputStream, DataOutputStream}
import java.net.URLEncoder
import java.nio.file.{Files, Path, Paths}
import scala.collection.concurrent.TrieMap
import scala.util.control.NonFatal

/** Shared skeleton of every per-(rowset, column) sidecar family
  * ([[RowsetBloom]] equality/trigram bits, [[NdvSketch]] HLL bytes,
  * [[DictStats]] value histograms): the `_`-prefixed URL-encoded file name
  * (hidden from parquet listings, atomic with the rowset dir), the
  * magic+version framing, and the bounded per-JVM cache over immutable
  * files. The formats differ only in their body read/write; everything a
  * sidecar IS — lands before publish, immutable once published, missing or
  * unreadable degrades to "unknown" (never to a wrong answer) — lives here
  * once.
  */
object Sidecar {

  def path(dir: Path, prefix: String, column: String, ext: String): Path =
    dir.resolve("_" + prefix + "_" + URLEncoder.encode(column, "UTF-8") + ext)

  /** Framed write: magic + version-1 header, then the format's body. */
  def write(p: Path, magic: Int)(body: DataOutputStream => Unit): Unit = {
    val out = new DataOutputStream(Files.newOutputStream(p))
    try { out.writeInt(magic); out.writeInt(1); body(out) } finally out.close()
  }

  /** Bounded per-JVM cache over immutable sidecar files: a loaded value is
    * valid forever (rowsets never mutate), eviction is wholesale past the
    * cap, and None — missing / unreadable / wrong magic / GC'd — caches
    * too: the consumer simply never serves from it.
    */
  final class Cache[T](cap: Int) {
    private val map = TrieMap.empty[String, Option[T]]

    def get(dir: String, prefix: String, column: String, ext: String,
            magic: Int)(read: DataInputStream => T): Option[T] = {
      val p = path(Paths.get(dir), prefix, column, ext)
      val key = p.toString
      map.getOrElse(key, {
        if (map.size >= cap) map.clear()
        val loaded =
          try {
            if (!Files.isRegularFile(p)) None
            else {
              val in = new DataInputStream(Files.newInputStream(p))
              try {
                if (in.readInt() != magic || in.readInt() != 1) None
                else Some(read(in))
              } finally in.close()
            }
          } catch { case NonFatal(_) => None }
        map.putIfAbsent(key, loaded)
        loaded
      })
    }

    def clear(): Unit = map.clear()
  }
}

/** Per-(rowset, column) VALUE HISTOGRAM sidecar — the exact
  * (value → row count) map of a declared LOW-CARDINALITY column, built by
  * one delta-sized aggregate over the rowset's own rows at write time and
  * refused (absent) past [[DictStats.MaxDistinct]] distinct values. The
  * completion of the metadata-serve family: zone maps answer MIN/MAX, sum
  * stats answer SUM/AVG, row counts answer COUNT — this answers
  * `GROUP BY c, count(*)` with zero files read
  * ([[graft.engine.OlapEngine.groupCounts]] +
  * [[graft.plans.StatsAggRewrite]]'s grouped path). Histograms are
  * Sum-mergeable across the covering set by construction, and the fold
  * cross-checks its total mass against the manifest row counts — a
  * sidecar/rowset mismatch refuses rather than serving a wrong group.
  *
  * Values are stored in the column's Spark string form, which is injective
  * for the admitted types (string / integral / date / boolean — see the
  * `dict_stats_columns` type guard); `typeTag` pins the physical type so a
  * widened column's stale sidecars are ignored, never trusted.
  */
object DictStats {
  private val Magic = 0x47444354 // "GDCT"
  val MaxDistinct = 1024
  private val Prefix = "dict"
  private val Ext = ".gdct"

  final case class Dict(typeTag: String, nulls: Long, counts: Map[String, Long])

  def write(dir: Path, column: String, d: Dict): Unit =
    Sidecar.write(Sidecar.path(dir, Prefix, column, Ext), Magic) { out =>
      out.writeUTF(d.typeTag)
      out.writeLong(d.nulls)
      out.writeInt(d.counts.size)
      d.counts.toSeq.sortBy(_._1).foreach { case (v, n) =>
        out.writeUTF(v); out.writeLong(n)
      }
    }

  private val cache = new Sidecar.Cache[Dict](4096)

  def load(dir: String, column: String): Option[Dict] =
    cache.get(dir, Prefix, column, Ext, Magic) { in =>
      val tag = in.readUTF()
      val nulls = in.readLong()
      val n = in.readInt()
      val m = Map.newBuilder[String, Long]
      var i = 0
      while (i < n) { m += (in.readUTF() -> in.readLong()); i += 1 }
      Dict(tag, nulls, m.result())
    }

  def clearCache(): Unit = cache.clear()
}
