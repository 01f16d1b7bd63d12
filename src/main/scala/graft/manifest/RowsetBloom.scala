package graft.manifest

import java.nio.file.Path

/** Rowset-level BLOOM skipping index — the equality twin of the zone maps
  * ([[StatsHarvest]]): the reference builds a write-only bloom index at the
  * segment tier (src/index/mod.rs:152-211) and parquet covers the
  * file/row-group tier at scan time; the tier genuinely missing is ABOVE the
  * file — which rowsets of an MVCC snapshot can contain a key at all. Zone
  * maps answer that for RANGE-clustered columns; high-cardinality columns
  * with no write ordering (a user id, a doc id, a trace id) have useless
  * min/max, and THIS index covers them: a point lookup touches the 1–2
  * rowsets whose bloom admits the key instead of every load since the last
  * compaction.
  *
  * Shape: one sidecar file per (rowset, declared bloom column), written into
  * the rowset directory BEFORE publish (atomic with the rowset — an
  * unpublished dir is garbage as a whole). Sidecars are `_`-prefixed, so
  * Spark's parquet listing treats them as hidden. The manifest records only
  * WHICH columns have sidecars ([[RowsetMeta.bloomCols]]); bits load lazily
  * at prune time and live in a bounded per-JVM cache.
  *
  * Hashing contract: bits are set from `functions.xxhash64(col)` (seed 42)
  * over the rowset's non-null values and probed with the Catalyst
  * [[org.apache.spark.sql.catalyst.expressions.XxHash64]] of the pushed-down
  * literal — the SAME codegen'd hash on both sides, so a false negative is
  * impossible by construction. `typeTag` pins the physical type the bits
  * were built from: a later column widen (int→double) changes the hash
  * input's byte form, so a probe whose literal type differs must ignore the
  * bloom (never prune) rather than trust it.
  *
  * Sizing: ~10 bits per row (k=7 → ~1% fpp), capped at 2^24 bits (2 MB) —
  * beyond ~1.6M rows per rowset the fpp degrades gracefully (less pruning,
  * never wrong), and compaction keeps rowset counts low enough that a
  * coarse filter per rowset is the right trade at 100 TB.
  */
final class RowsetBloom(val k: Int, val bits: Array[Long], val typeTag: String) {
  private val numBits: Long = bits.length.toLong * 64L

  def mightContain(h: Long): Boolean = {
    val h1 = h >>> 32
    val h2 = (h & 0xffffffffL) | 1L // odd ⇒ co-prime walk over the bit space
    var i = 0
    while (i < k) {
      val idx = java.lang.Math.floorMod(h1 + i.toLong * h2, numBits)
      if ((bits((idx >>> 6).toInt) & (1L << (idx & 63L).toInt)) == 0L) return false
      i += 1
    }
    true
  }
}

object RowsetBloom {
  val K = 7
  private val Magic = 0x47424c4d // "GBLM"
  private val MaxBits = 1L << 24

  /** Bitset length in LONGS for a rowset of `numRows` (~10 bits/row). */
  def sizeLongs(numRows: Long): Int = {
    val bits = math.min(math.max(numRows * 10L, 1024L), MaxBits)
    ((bits + 63L) / 64L).toInt
  }

  /** Set the k bit positions for one xxhash64 value (build side — the index
    * walk MUST mirror [[RowsetBloom.mightContain]]).
    */
  def add(bits: Array[Long], h: Long): Unit = {
    val numBits = bits.length.toLong * 64L
    val h1 = h >>> 32
    val h2 = (h & 0xffffffffL) | 1L
    var i = 0
    while (i < K) {
      val idx = java.lang.Math.floorMod(h1 + i.toLong * h2, numBits)
      bits((idx >>> 6).toInt) |= (1L << (idx & 63L).toInt)
      i += 1
    }
  }

  /** Sidecar-family prefixes: "bloom" = whole-value equality bits; "ngram" =
    * character-trigram bits for substring containment ([[NgramSize]]-grams,
    * probed by LIKE '%needle%'-shaped predicates). Same file format, same
    * hash, same cache — only WHAT was hashed differs, pinned by `typeTag`.
    */
  val KindBloom = "bloom"
  val KindNgram = "ngram"

  /** Character n-gram width of the substring index. Fixed (not per-table):
    * the probe must slice needles exactly as the build sliced values, and 3
    * is the standard trade — needles shorter than 3 chars skip the index
    * (zone maps/scan own them), longer needles contribute len-2 grams each
    * of which must be present.
    */
  val NgramSize = 3

  private val Ext = ".gblm"

  def write(dir: Path, column: String, b: RowsetBloom,
      kind: String = KindBloom): Unit =
    Sidecar.write(Sidecar.path(dir, kind, column, Ext), Magic) { out =>
      out.writeInt(b.k); out.writeUTF(b.typeTag)
      out.writeInt(b.bits.length)
      b.bits.foreach(out.writeLong)
    }

  // Bounded per-JVM cache ([[Sidecar.Cache]]): at up to 2 MB per bloom an
  // unbounded map over thousands of rowsets would eat the driver, so the
  // cap is deliberately the smallest of the sidecar families.
  private val cache = new Sidecar.Cache[RowsetBloom](256)

  def load(dir: String, column: String,
      kind: String = KindBloom): Option[RowsetBloom] =
    cache.get(dir, kind, column, Ext, Magic) { in =>
      val k = in.readInt(); val tag = in.readUTF()
      val n = in.readInt()
      val bits = Array.fill(n)(in.readLong())
      new RowsetBloom(k, bits, tag)
    }

  /** Test hook: drop every cached bloom (cache correctness is re-provable). */
  def clearCache(): Unit = cache.clear()
}
