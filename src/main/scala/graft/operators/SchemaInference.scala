package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** §1.2 — the reference's dynamic schema generator re-expressed over Spark
  * types (`core/BigQueryManager.py:72-114` maps numpy dtype kinds → BQ
  * types, recursing into dicts as RECORD and lists as REPEATED).
  *
  * Divergence fixed on purpose (SURVEY.md §7.3): the reference detects
  * list-ness from the FIRST row (`iloc[0]`); Spark's JSON/parquet inference
  * already scans all rows, so mixed rows can't silently drop the REPEATED
  * mode here.
  */
object SchemaInference {

  /** Columns the reference forces NULLABLE regardless of data
    * (`BigQueryManager.py:84` FORCE_NULLABLE).
    */
  val ForceNullable: Set[String] = Set("custom_fields")

  /** Normalize an inferred schema to the engine's canonical types —
    * the Spark equivalents of the BQ mapping: integers → LongType
    * (INTEGER), floats → DoubleType (FLOAT), bools, strings; dict →
    * StructType (RECORD, recursed); list → ArrayType (REPEATED);
    * timestamps → TimestampNTZType (naive DATETIME).
    */
  def normalize(dt: DataType): DataType = dt match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType => LongType
    case _: FloatType | _: DoubleType                              => DoubleType
    case _: DecimalType                                            => DecimalType(38, 9) // u → NUMERIC
    case _: BooleanType                                            => BooleanType
    case _: StringType | _: CharType | _: VarcharType              => StringType
    case _: TimestampType | _: TimestampNTZType | _: DateType      => TimestampNTZType
    case ArrayType(e, _)       => ArrayType(normalize(e), containsNull = true)
    case MapType(k, v, _)      => MapType(normalize(k), normalize(v), valueContainsNull = true)
    case st: StructType        => normalizeStruct(st)
    case _: BinaryType         => BinaryType
    case _: NullType           => StringType // all-null column: reference emits STRING
    case other                 => other
  }

  def normalizeStruct(st: StructType): StructType =
    StructType(st.fields.map { f =>
      val nullable = f.nullable || ForceNullable.contains(f.name)
      StructField(f.name, normalize(f.dataType), nullable, f.metadata)
    })

  /** Inferred, normalized schema for a frame (the `generate_schema`
    * analog): run after spark.read.json / createDataFrame.
    */
  def infer(df: DataFrame): StructType = normalizeStruct(df.schema)

  /** Apply the normalized schema: cast every column (try_cast semantics —
    * SAFE_CAST in the reference's MERGE, K4).
    */
  def conform(df: DataFrame): DataFrame = {
    val target = infer(df)
    df.select(target.fields.map(f =>
      org.apache.spark.sql.functions.col(f.name).try_cast(f.dataType).as(f.name)): _*)
  }
}
