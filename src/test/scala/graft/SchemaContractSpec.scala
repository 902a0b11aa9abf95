package graft

import org.apache.spark.sql.types._

/** Schema contract for the driver-provided testdata (TESTDATA.md /
  * FIXTURES.md): every table's columns and the TYPE ENVELOPE each column
  * may arrive in. The driver regenerates /root/testdata between rounds and
  * has already drifted one physical encoding (`events.ts`, round 10 — see
  * EventTimeCanonSpec); when that happens again, THIS spec fails first,
  * with the table/column/type named, instead of eleven queries failing
  * with opaque analysis errors.
  *
  * Envelopes are deliberately wider than one generation's exact types:
  * instants may arrive as TIMESTAMP, TIMESTAMP_NTZ, DATE, or (under the
  * session's nanosAsLong) BIGINT nanos — and every member of that
  * envelope has a consuming adapter: `Tables.eventsCanonical` for
  * `events.ts` and the canonicalizing `Tables.load` for
  * `orders.o_orderdate` / `lineitem.l_shipdate` (DateCanonSpec proves
  * each envelope member loads to the identical canonical TIMESTAMP).
  * The envelope here and the adapters' match arms must move together; a
  * type OUTSIDE the envelope is a new drift class and fails here first,
  * with the table/column/type named.
  */
class SchemaContractSpec extends SparkSuite {

  // acceptable physical types per logical column kind
  private val instant: Set[DataType] =
    Set(TimestampType, TimestampNTZType, DateType, LongType)
  private val integral: Set[DataType] = Set(IntegerType, LongType)

  private def exactly(t: DataType): Set[DataType] = Set(t)

  private val contract: Map[String, Seq[(String, Set[DataType])]] = Map(
    "region" -> Seq("r_regionkey" -> integral, "r_name" -> exactly(StringType)),
    "nation" -> Seq("n_nationkey" -> integral, "n_name" -> exactly(StringType),
      "n_regionkey" -> integral),
    "customer" -> Seq("c_custkey" -> exactly(LongType), "c_name" -> exactly(StringType),
      "c_nationkey" -> integral, "c_acctbal" -> exactly(DoubleType),
      "c_mktsegment" -> exactly(StringType)),
    "supplier" -> Seq("s_suppkey" -> exactly(LongType), "s_name" -> exactly(StringType),
      "s_nationkey" -> integral, "s_acctbal" -> exactly(DoubleType)),
    "part" -> Seq("p_partkey" -> exactly(LongType), "p_name" -> exactly(StringType),
      "p_brand" -> exactly(StringType), "p_type" -> exactly(StringType),
      "p_size" -> integral, "p_retailprice" -> exactly(DoubleType)),
    "orders" -> Seq("o_orderkey" -> exactly(LongType), "o_custkey" -> exactly(LongType),
      "o_orderstatus" -> exactly(StringType), "o_totalprice" -> exactly(DoubleType),
      "o_orderdate" -> instant, "o_orderpriority" -> exactly(StringType)),
    "lineitem" -> Seq("l_orderkey" -> exactly(LongType), "l_partkey" -> exactly(LongType),
      "l_suppkey" -> exactly(LongType), "l_linenumber" -> integral,
      "l_quantity" -> exactly(DoubleType), "l_extendedprice" -> exactly(DoubleType),
      "l_discount" -> exactly(DoubleType), "l_tax" -> exactly(DoubleType),
      "l_returnflag" -> exactly(StringType), "l_linestatus" -> exactly(StringType),
      "l_shipdate" -> instant),
    "events" -> Seq("event_id" -> exactly(LongType), "ts" -> instant,
      "user_id" -> exactly(LongType), "event_type" -> exactly(StringType),
      "value" -> exactly(DoubleType), "props" -> exactly(StringType)),
    "documents" -> Seq("doc_id" -> exactly(LongType), "text" -> exactly(StringType),
      "lang" -> exactly(StringType), "source" -> exactly(StringType),
      "n_chars" -> exactly(LongType)),
    "embeddings" -> Seq("vec_id" -> exactly(LongType),
      "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, containsNull = false),
        ArrayType(DoubleType), ArrayType(DoubleType, containsNull = false)),
      "label" -> integral)
  )

  for ((table, cols) <- contract.toSeq.sortBy(_._1))
    test(s"$table: columns present with types inside the drift envelope") {
      // RAW parquet schema, not Tables.load — load canonicalizes the
      // instant columns, which would mask exactly the drift this contract
      // exists to name
      val schema = spark.read.parquet(s"${SparkSpec.sf0001}/$table.parquet").schema
      val byName = schema.fields.map(f => f.name -> f.dataType).toMap
      val missing = cols.map(_._1).filterNot(byName.contains)
      assert(missing.isEmpty,
        s"testdata drift: $table lost columns $missing (have: ${schema.fieldNames.mkString(",")})")
      for ((name, allowed) <- cols) {
        val got = byName(name)
        assert(allowed.contains(got),
          s"testdata drift: $table.$name arrived as $got, outside the envelope " +
            s"$allowed — extend the consuming adapter (see Tables.tusColumn) " +
            s"and this envelope together")
      }
    }

  test("instant envelope matches what the adapters can adapt") {
    // adapters must accept every member of the instant envelope — if
    // someone widens one without the other, fail here, not in 11 queries.
    // Tables.tusColumn handles TIMESTAMP/NTZ/nanos (events.ts never
    // arrives day-granular); Tables.instantColumn additionally handles
    // DATE (DateCanonSpec exercises all four end-to-end).
    assert(instant == Set(TimestampType, TimestampNTZType, DateType, LongType))
  }

  test("canonical load always surfaces fact-date columns as TIMESTAMP") {
    assert(Tables.load(spark, SparkSpec.sf0001, "orders")
      .schema("o_orderdate").dataType == TimestampType)
    assert(Tables.load(spark, SparkSpec.sf0001, "lineitem")
      .schema("l_shipdate").dataType == TimestampType)
  }
}
