package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed property values of the graph model.
  *
  * The reference supports four datatypes — text, arbitrary-precision
  * integer, binary, JSON (STMGraph Types.hs:229-234, DTJSON
  * Types.hs:214-215) — and multi-valued properties (API type is
  * `Map Text [PropertyValue]`, HGraphStorage API.hs:111-115).
  *
  * Spark encoding: one nullable-field struct per value, an array of
  * them per property name, a map keyed by name per entity:
  *
  *   props MAP<STRING, ARRAY<STRUCT<vType BYTE, vText STRING,
  *     vInt DECIMAL(38,0), vBin BINARY, vJson STRING>>>
  *
  * DECIMAL(38,0) is the documented bound for the reference's unbounded
  * Integer (SURVEY §7.4); overflow raises at build time.
  */
sealed trait PropertyValue {
  def typeTag: Byte
}
object PropertyValue {
  final case class PVText(v: String) extends PropertyValue { val typeTag: Byte = 0 }
  final case class PVInteger(v: BigInt) extends PropertyValue {
    val typeTag: Byte = 1
    require(v.abs < BigInt(10).pow(38), s"integer exceeds DECIMAL(38,0): $v")
  }
  final case class PVBinary(v: Array[Byte]) extends PropertyValue { val typeTag: Byte = 2 }
  final case class PVJson(v: String) extends PropertyValue { val typeTag: Byte = 3 }

  val TEXT: Byte    = 0
  val INTEGER: Byte = 1
  val BINARY: Byte  = 2
  val JSON: Byte    = 3
}

/** Column-level helpers for building and querying the value struct. */
object PropValues {
  import PropertyValue._

  val valueStruct: StructType = StructType(Seq(
    StructField("vType", ByteType, nullable = false),
    StructField("vText", StringType),
    StructField("vInt", DecimalType(38, 0)),
    StructField("vBin", BinaryType),
    StructField("vJson", StringType)))

  val propsType: MapType = MapType(StringType, ArrayType(valueStruct))

  private def cell(t: Byte, text: Column, int: Column, bin: Column, json: Column): Column =
    struct(
      lit(t).cast(ByteType).as("vType"),
      text.cast(StringType).as("vText"),
      int.cast(DecimalType(38, 0)).as("vInt"),
      bin.cast(BinaryType).as("vBin"),
      json.cast(StringType).as("vJson"))

  private val nul = lit(null)

  /** A TEXT value struct from any string column. */
  def pvText(c: Column): Column = cell(TEXT, c, nul, nul, nul)

  /** An INTEGER value struct from any integral column. */
  def pvInt(c: Column): Column = cell(INTEGER, nul, c, nul, nul)

  def pvBin(c: Column): Column  = cell(BINARY, nul, nul, c, nul)
  def pvJson(c: Column): Column = cell(JSON, nul, nul, nul, c)

  /** Literal value struct for a PropertyValue. */
  def pvLit(v: PropertyValue): Column = v match {
    case PVText(s)    => pvText(lit(s))
    case PVInteger(i) => pvInt(lit(new java.math.BigDecimal(i.bigInteger)))
    case PVBinary(b)  => pvBin(lit(b))
    case PVJson(j)    => pvJson(lit(j))
  }

  /** Predicate: the props map has (name, value) — typed equality over
    * the multi-value list (STMGraph API.hs:237-246 `nodeHasNamedValue`).
    * Null-safe struct equality via `<=>` on every field.
    */
  def hasValue(props: Column, name: String, v: PropertyValue): Column = {
    val target = pvLit(v)
    exists(coalesce(props.getItem(name), array()),
      c =>
        c.getField("vType") === target.getField("vType") &&
          (c.getField("vText") <=> target.getField("vText")) &&
          (c.getField("vInt") <=> target.getField("vInt")) &&
          (c.getField("vBin") <=> target.getField("vBin")) &&
          (c.getField("vJson") <=> target.getField("vJson")))
  }

  /** Single-valued convenience: props map with one TEXT/INTEGER value
    * per name, built from table columns.
    */
  def propsMap(entries: (String, Column)*): Column =
    map(entries.flatMap { case (k, v) => Seq(lit(k), array(v)) }: _*)

  /** Decode one value-struct Row back to the host ADT — the inverse
    * of [[pvLit]] (the seam typed predicates see real
    * `PropertyValue`s through, QueryStep.tgtPredicate).
    */
  def cellFromRow(r: org.apache.spark.sql.Row): PropertyValue = r.getByte(0) match {
    case TEXT    => PVText(r.getString(1))
    case INTEGER => PVInteger(BigInt(r.getDecimal(2).toBigInteger))
    case BINARY  => PVBinary(r.getAs[Array[Byte]](3))
    case JSON    => PVJson(r.getString(4))
    case t       => throw new IllegalArgumentException(s"unknown vType $t")
  }

  /** Decode a whole props map field of `row` (null map -> empty). */
  def propsFromRow(row: org.apache.spark.sql.Row, field: String): Map[String, Seq[PropertyValue]] = {
    val i = row.fieldIndex(field)
    if (row.isNullAt(i)) Map.empty
    else row.getMap[String, scala.collection.Seq[org.apache.spark.sql.Row]](i)
      .map { case (k, cells) => k -> cells.map(cellFromRow).toSeq }.toMap
  }
}
