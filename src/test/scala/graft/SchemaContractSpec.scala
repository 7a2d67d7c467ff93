package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Schema contract for the driver testdata: the engine's declared
  * assumptions about every table, asserted as a SUITE gate so a silent
  * testdata regeneration fails HERE with a named column and type —
  * not three layers deep as a DATATYPE_MISMATCH inside some query's
  * analysis (the round-4 events.ts re-encode cost 9 correctness rows
  * and 13 tests precisely because nothing pinned the contract).
  *
  * The contract is deliberately a FAMILY check, not an exact-type pin:
  * encodings the engine normalizes at load (events.ts — see
  * Tables.epochMicros) or is agnostic to (integer widths feeding
  * BIGINT arithmetic) stay green across re-encodes; only a change the
  * engine can NOT absorb (a string column arriving numeric, a vector
  * column arriving scalar) fails.
  */
class SchemaContractSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = SparkFixture.Sf0001

  // Spark DataType.typeName spellings (LongType.typeName == "long")
  private val Integral = Set("byte", "short", "integer", "long")
  private val Fractional = Set("float", "double", "decimal")
  // every encoding Tables.epochMicros dispatches on
  private val TimestampLike = Set("timestamp", "timestamp_ntz", "long")

  private def typeOf(table: String, column: String): String = {
    val schema = Tables.load(spark, dir, table).schema
    assert(schema.fieldNames.contains(column),
      s"$table.$column is MISSING — testdata regenerated with a new " +
        s"layout? present: ${schema.fieldNames.mkString(", ")}")
    schema(column).dataType.typeName.takeWhile(_ != '(')
  }

  private def pin(table: String, column: String, families: Set[String],
      normalizer: String): Unit = {
    val t = typeOf(table, column)
    assert(families.contains(t),
      s"$table.$column arrived as $t, outside the accepted " +
        s"family ${families.mkString("{", ",", "}")} — extend $normalizer " +
        "(the load-time normalization point) before touching any query")
  }

  test("events: the engine's ts dispatch covers the shipped encoding") {
    pin("events", "event_id", Integral, "Tables.events")
    pin("events", "ts", TimestampLike, "Tables.epochMicros")
    pin("events", "user_id", Integral, "Tables.events")
    pin("events", "event_type", Set("string"), "Tables.events")
    pin("events", "value", Fractional, "Tables.events")
    pin("events", "props", Set("string"), "Tables.events")
    // and the normalized projection itself resolves + is a BIGINT
    val us = Tables.events(spark, dir).schema("ts_us").dataType.typeName
    assert(us == "long", s"ts_us projected as $us")
  }

  test("documents: text analytics column contract") {
    pin("documents", "doc_id", Integral, "Tables.load")
    pin("documents", "text", Set("string"), "Tables.load")
    pin("documents", "lang", Set("string"), "Tables.load")
    pin("documents", "source", Set("string"), "Tables.load")
    pin("documents", "n_chars", Integral, "Tables.load")
  }

  test("embeddings: vector column contract") {
    pin("embeddings", "vec_id", Integral, "Tables.load")
    pin("embeddings", "label", Integral, "Tables.load")
    val t = Tables.load(spark, dir, "embeddings").schema("embedding").dataType
    t match {
      case org.apache.spark.sql.types.ArrayType(el, _) =>
        assert(Fractional.contains(el.typeName.takeWhile(_ != '(')),
          s"embeddings.embedding elements arrived as ${el.typeName} — " +
            "VectorOps.quantize casts through double, extend it if this " +
            "ever ships as decimal/int")
      case other => fail(s"embeddings.embedding arrived as $other, not an " +
        "array — the whole similarity stack assumes a vector column")
    }
  }

  test("relational tables: key and measure families hold") {
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem")) {
      val schema = Tables.load(spark, dir, t).schema
      assert(schema.nonEmpty, s"$t has an empty schema")
    }
    pin("lineitem", "l_orderkey", Integral, "Tables.load")
    pin("lineitem", "l_quantity", Integral ++ Fractional, "Tables.load")
    pin("lineitem", "l_extendedprice", Fractional, "Tables.load")
    pin("orders", "o_orderkey", Integral, "Tables.load")
    pin("orders", "o_totalprice", Fractional, "Tables.load")
    pin("customer", "c_custkey", Integral, "Tables.load")
    pin("nation", "n_name", Set("string"), "Tables.load")
  }
}
