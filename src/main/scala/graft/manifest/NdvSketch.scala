package graft.manifest

import java.nio.file.Path
import scala.util.control.NonFatal

/** Per-(rowset, column) NDV sketch sidecar — DataSketches HLL bytes produced
  * by Spark's own `hll_sketch_agg` over the rowset's rows at write time.
  * Sketches UNION losslessly (HLL union of per-rowset sketches equals the
  * sketch of the union of rows), so a table-level approximate distinct
  * count over any covering set is a driver-side fold over O(rowsets)
  * sidecars — the ANALYZE statistic that never goes stale, because every
  * write ships its own delta ([[graft.engine.OlapEngine.approxNdv]]).
  *
  * File shape mirrors [[RowsetBloom]]: `_`-prefixed in the rowset dir (lands
  * atomically with the rowset, hidden from parquet listings), immutable
  * once published, loaded lazily through a bounded per-JVM cache. A missing
  * or unreadable sidecar degrades to "unknown" (the fold refuses), never to
  * a wrong estimate.
  */
object NdvSketch {
  private val Magic = 0x474e4456 // "GNDV"

  private val Prefix = "ndv"
  private val Ext = ".gndv"

  def write(dir: Path, column: String, sketch: Array[Byte]): Unit =
    Sidecar.write(Sidecar.path(dir, Prefix, column, Ext), Magic) { out =>
      out.writeInt(sketch.length); out.write(sketch)
    }

  private val cache = new Sidecar.Cache[Array[Byte]](1024)

  def load(dir: String, column: String): Option[Array[Byte]] =
    cache.get(dir, Prefix, column, Ext, Magic) { in =>
      val n = in.readInt()
      val bytes = new Array[Byte](n)
      in.readFully(bytes)
      bytes
    }

  /** Union estimates driver-side via the DataSketches API — the same
    * library `hll_sketch_agg` serialized with, so heapify/union are exact
    * library operations, not re-implementations.
    */
  def unionEstimate(sketches: Seq[Array[Byte]]): Option[Double] =
    try {
      val u = new org.apache.datasketches.hll.Union(12)
      sketches.foreach(b =>
        u.update(org.apache.datasketches.hll.HllSketch.heapify(b)))
      Some(u.getResult.getEstimate)
    } catch { case NonFatal(_) => None }

  def clearCache(): Unit = cache.clear()
}
