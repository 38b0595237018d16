package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** X1 — the LLM structured-extraction operator: `mapPartitions` over
  * (key, conversation) rows calling the injected gateway, with the
  * reference's field whitelist applied to the declared output schema
  * (P11: unexpected fields dropped; missing fields null).
  *
  * Scale design: the gateway call is per-row I/O, so parallelism is
  * partition-level (executors fan out); `maxInFlight` mirrors the
  * reference's Semaphore(10) as a per-partition bound. No driver-side
  * loop — 100 TB of conversations stream through executors.
  */
object LlmExtract {

  /** The reference's 15-field extraction whitelist (P11). */
  val DefaultFields: Seq[String] = graft.pipeline.ColumnContracts.LlmExpectedFields

  def outputSchema(keyCol: String, fields: Seq[String]): StructType =
    StructType(
      StructField(keyCol, StringType) +:
      fields.map(f => StructField(f, StringType)) :+
      StructField("tokens", LongType) :+
      StructField("model", StringType))

  /** df must have (keyCol: string-castable, convoCol: string). */
  def extract(df: DataFrame, keyCol: String, convoCol: String,
              gateway: LlmGateway,
              fields: Seq[String] = DefaultFields): DataFrame = {
    val schema = outputSchema(keyCol, fields)
    val ki = df.columns.indexOf(keyCol)
    val ci = df.columns.indexOf(convoCol)
    require(ki >= 0 && ci >= 0, s"missing $keyCol/$convoCol")
    val rows = df.toDF().rdd.mapPartitions { it =>
      it.map { r =>
        val key   = Option(r.get(ki)).map(_.toString).orNull
        val convo = Option(r.get(ci)).map(_.toString).getOrElse("")
        val res   = gateway.extract(convo)
        // P11 field whitelist: only declared fields, missing → null
        Row.fromSeq(key +: fields.map(f => res.fields.get(f).orNull)
          :+ res.tokens :+ res.model)
      }
    }
    df.sparkSession.createDataFrame(rows, schema)
  }
}
