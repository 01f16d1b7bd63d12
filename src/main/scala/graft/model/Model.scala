package graft.model

import org.apache.spark.sql.types._

/** Key-table model semantics, mirroring the reference's `KeysType`
  * (reference: src/common.rs:36-44). Defines the merge-on-read semantics of a
  * table:
  *  - Duplicate: keep all rows (no merge).
  *  - Unique: same key ==> latest version wins.
  *  - Aggregate: value columns merged per-column by their [[AggType]].
  */
sealed trait KeysType { def name: String }
object KeysType {
  case object Duplicate extends KeysType { val name = "DUPLICATE" }
  case object Unique    extends KeysType { val name = "UNIQUE" }
  case object Aggregate extends KeysType { val name = "AGGREGATE" }
  def fromName(s: String): KeysType = s.toUpperCase match {
    case "DUPLICATE" => Duplicate
    case "UNIQUE"    => Unique
    case "AGGREGATE" => Aggregate
    case other       => throw new IllegalArgumentException(s"unknown keys type $other")
  }
}

/** Per-value-column merge function for Aggregate-model tables
  * (reference: src/common.rs:54-57). `Replace` keeps the value from the
  * highest version (deterministic tiebreak documented in
  * [[graft.engine.MergeView]]).
  */
sealed trait AggType { def name: String }
object AggType {
  case object None    extends AggType { val name = "NONE" }
  case object Sum     extends AggType { val name = "SUM" }
  case object Min     extends AggType { val name = "MIN" }
  case object Max     extends AggType { val name = "MAX" }
  case object Replace extends AggType { val name = "REPLACE" }
  /** Doris REPLACE_IF_NOT_NULL: latest NON-NULL value wins — a NULL in a
    * newer load means "leave the stored value alone", which makes Aggregate
    * tables partially updatable per column (the Doris partial-update idiom
    * for the Aggregate model).
    */
  case object ReplaceIfNotNull extends AggType { val name = "REPLACE_IF_NOT_NULL" }
  /** Doris HLL column type with HLL_UNION aggregation: the column stores a
    * DataSketches HLL sketch (BinaryType); loads supply RAW values and the
    * ingest pre-aggregates them into per-key sketches; merges union them.
    * Estimate with `hll_sketch_estimate` at query time. Approximate by
    * definition — for exact distinct use a bitmap rollup.
    */
  case object HllUnion extends AggType { val name = "HLL_UNION" }
  def fromName(s: String): AggType = s.toUpperCase match {
    case "NONE"    => None
    case "SUM"     => Sum
    case "MIN"     => Min
    case "MAX"     => Max
    case "REPLACE" => Replace
    case "REPLACE_IF_NOT_NULL" => ReplaceIfNotNull
    case "HLL_UNION" => HllUnion
    case other     => throw new IllegalArgumentException(s"unknown agg type $other")
  }
}

/** Column definition carrying the OLAP extras the reference keeps in its
  * `ColumnSchema` (reference: src/meta.rs:12-22): key flag, nullability and
  * per-column aggregate. The physical type is a plain Spark [[DataType]] —
  * the reference's 8-type logical/physical system (src/common.rs:46-52,
  * src/field_type.rs:6-14) maps 1:1 onto Spark SQL types (SURVEY.md §1.2).
  */
final case class ColumnSpec(
    name: String,
    dataType: DataType,
    isKey: Boolean = false,
    nullable: Boolean = true,
    agg: AggType = AggType.None,
    maxLength: Int = 0) {

  def toStructField: StructField = {
    val md = new MetadataBuilder()
      .putBoolean("graft.isKey", isKey)
      .putString("graft.agg", agg.name)
    if (maxLength > 0) md.putLong("graft.maxLength", maxLength.toLong)
    StructField(name, dataType, nullable, md.build())
  }
}

object ColumnSpec {
  /** Key column: non-null, no aggregate (reference: src/meta.rs:26-32). */
  def key(name: String, dt: DataType): ColumnSpec =
    ColumnSpec(name, dt, isKey = true, nullable = false, agg = AggType.None)
  /** Value column: nullable, carries an aggregate (reference: src/meta.rs:34-40). */
  def value(name: String, dt: DataType, agg: AggType = AggType.None): ColumnSpec =
    ColumnSpec(name, dt, isKey = false, nullable = true, agg = agg)
  /** Varchar column with a max length (reference: src/meta.rs:42-49). */
  def varchar(name: String, maxLen: Int, isKey: Boolean = false): ColumnSpec =
    ColumnSpec(name, StringType, isKey = isKey, nullable = !isKey, maxLength = maxLen)

  def fromStructField(f: StructField): ColumnSpec = {
    val isKey = f.metadata.contains("graft.isKey") && f.metadata.getBoolean("graft.isKey")
    val agg =
      if (f.metadata.contains("graft.agg")) AggType.fromName(f.metadata.getString("graft.agg"))
      else AggType.None
    val maxLen =
      if (f.metadata.contains("graft.maxLength")) f.metadata.getLong("graft.maxLength").toInt
      else 0
    ColumnSpec(f.name, f.dataType, isKey, f.nullable, agg, maxLen)
  }
}

/** Table schema = keys model + ordered columns (reference: src/meta.rs:54-61).
  * Key columns must be a prefix-free subset; value columns of an Aggregate
  * table carry their merge function.
  */
final case class TableSchema(keysType: KeysType, columns: Seq[ColumnSpec]) {
  require(columns.nonEmpty, "schema needs at least one column")
  keysType match {
    case KeysType.Unique | KeysType.Aggregate =>
      require(columns.exists(_.isKey), s"${keysType.name} table needs key columns")
    case KeysType.Duplicate => ()
  }

  val keyColumns: Seq[ColumnSpec]   = columns.filter(_.isKey)
  val valueColumns: Seq[ColumnSpec] = columns.filterNot(_.isKey)
  def keyNames: Seq[String]         = keyColumns.map(_.name)
  def valueNames: Seq[String]       = valueColumns.map(_.name)
  def toStructType: StructType      = StructType(columns.map(_.toStructField))

  /** Stable schema hash, same spirit as the reference's xor-of-Knuth-multiplied
    * column ids (src/meta.rs:65-66); here over (name, type, key, agg).
    */
  def schemaHash: Long =
    columns.zipWithIndex.foldLeft(keysType.name.hashCode.toLong) { case (acc, (c, i)) =>
      val h = (i.toLong * 2654435761L) ^ c.name.hashCode.toLong ^
        (c.dataType.simpleString.hashCode.toLong << 16) ^
        (if (c.isKey) 0x9e3779b9L else 0L) ^ c.agg.name.hashCode.toLong
      acc ^ h
    }
}

object TableSchema {
  def fromStructType(keysType: KeysType, st: StructType): TableSchema =
    TableSchema(keysType, st.fields.toSeq.map(ColumnSpec.fromStructField))
}
