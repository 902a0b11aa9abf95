package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite

case class Click(user: String, cts: Timestamp, page: String)
case class Purchase(user: String, pts: Timestamp, amount: Double)

class StreamJoinsSpec extends SparkSuite {

  private def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000)

  test("stream-stream join matches keys within the time window, drops out-of-window pairs") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]

    val joined = StreamJoins.enrichWithin(
      clicks.toDF(), purchases.toDF(),
      key = "user", leftTs = "cts", rightTs = "pts", window = "30 seconds")

    val q = joined
      .selectExpr("user", "page", "amount")
      .writeStream.format("memory").queryName("sj_out").outputMode("append").start()
    try {
      clicks.addData(
        Click("alice", ts(0), "home"),
        Click("bob", ts(10), "search"),
        Click("carol", ts(20), "detail"))
      purchases.addData(
        Purchase("alice", ts(15), 9.99),   // within 30s of alice's click -> match
        Purchase("bob", ts(55), 5.00),     // 45s after bob's click -> out of window
        Purchase("dave", ts(20), 1.00))    // key never clicks -> no match
      q.processAllAvailable()
      // advance both watermarks far enough to finalize every pair
      clicks.addData(Click("zz", ts(500), "x"))
      purchases.addData(Purchase("zz2", ts(500), 0.0))
      q.processAllAvailable()

      val rows = spark.table("sj_out").collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
      assert(rows === Set(("alice", "home", 9.99)),
        s"expected only the in-window alice pair, got $rows")
    } finally q.stop()
  }

  test("left-outer stream-stream join: unmatched rows emit with nulls only after watermark expiry") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]

    val joined = StreamJoins.enrichWithinOuter(
      clicks.toDF(), purchases.toDF(),
      key = "user", leftTs = "cts", rightTs = "pts", window = "30 seconds")

    val q = joined
      .selectExpr("user", "page", "amount")
      .writeStream.format("memory").queryName("sj_outer").outputMode("append").start()
    try {
      clicks.addData(
        Click("alice", ts(0), "home"),   // will match
        Click("bob", ts(10), "search"))  // never matches -> null emission
      purchases.addData(Purchase("alice", ts(15), 9.99))
      q.processAllAvailable()
      // BEFORE the watermark passes bob's window, bob must NOT have emitted:
      // an outer result this early would be wrong (his partner could still come)
      val early = spark.table("sj_outer").collect().map(_.getString(0)).toSet
      assert(!early.contains("bob"),
        s"bob emitted before his window could be proven empty: $early")
      // advance both watermarks past bob's window+lateness -> null emission
      clicks.addData(Click("zz", ts(500), "x"))
      purchases.addData(Purchase("zz2", ts(500), 0.0))
      q.processAllAvailable()
      val rows = spark.table("sj_outer").collect()
        .map(r => (r.getString(0), r.getString(1), Option(r.get(2)))).toSet
      assert(rows.contains(("alice", "home", Some(9.99))), s"matched pair missing: $rows")
      assert(rows.contains(("bob", "search", None)),
        s"unmatched left row never emitted its null-padded result: $rows")
    } finally q.stop()
  }

  test("full-outer stream-stream join: unmatched rows on BOTH sides emit nulls after expiry") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]

    val joined = StreamJoins.enrichWithinFull(
      clicks.toDF(), purchases.toDF(),
      key = "user", leftTs = "cts", rightTs = "pts", window = "30 seconds")

    val q = joined
      .selectExpr("user", "page", "amount")
      .writeStream.format("memory").queryName("sj_full").outputMode("append").start()
    try {
      clicks.addData(
        Click("alice", ts(0), "home"),   // will match
        Click("bob", ts(10), "search"))  // left-only -> null amount
      purchases.addData(
        Purchase("alice", ts(15), 9.99),
        Purchase("carol", ts(20), 4.50)) // right-only -> null page, key kept
      q.processAllAvailable()
      // neither unmatched side may emit before its window is provably empty
      val early = spark.table("sj_full").collect().map(_.getString(0)).toSet
      assert(!early.contains("bob") && !early.contains("carol"),
        s"unmatched rows emitted before watermark expiry: $early")
      clicks.addData(Click("zz", ts(500), "x"))
      purchases.addData(Purchase("zz2", ts(500), 0.0))
      q.processAllAvailable()
      val rows = spark.table("sj_full").collect()
        .map(r => (r.getString(0), Option(r.getString(1)), Option(r.get(2)))).toSet
      assert(rows.contains(("alice", Some("home"), Some(9.99))), s"matched pair missing: $rows")
      assert(rows.contains(("bob", Some("search"), None)),
        s"left-only row never emitted: $rows")
      assert(rows.contains(("carol", None, Some(4.50))),
        s"right-only row lost its key or never emitted: $rows")
    } finally q.stop()
  }

  test("stream-static enrichment broadcasts the dimension and keeps unmatched rows") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val clicks = MemoryStream[Click]
    val dim = Seq(("alice", "premium"), ("bob", "free")).toDF("user", "tier")

    val q = StreamJoins.enrichStatic(clicks.toDF(), dim, key = "user")
      .selectExpr("user", "page", "tier")
      .writeStream.format("memory").queryName("se_out").outputMode("append").start()
    try {
      clicks.addData(
        Click("alice", ts(0), "home"),
        Click("carol", ts(5), "detail")) // no dim row -> tier null, row kept
      q.processAllAvailable()

      val rows = spark.table("se_out").collect()
        .map(r => (r.getString(0), r.getString(1), Option(r.getString(2)))).toSet
      assert(rows === Set(
        ("alice", "home", Some("premium")),
        ("carol", "detail", None)), s"got $rows")

      // stateless: nothing buffered across batches, and the per-batch plan
      // is a broadcast hash join (streaming side never shuffles)
      val sq = q.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
      val plan = sq.streamingQuery.lastExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"dimension must broadcast per micro-batch:\n$plan")
      assert(!plan.contains("StateStore"),
        s"stream-static join must hold no state:\n$plan")
    } finally q.stop()
  }
}
