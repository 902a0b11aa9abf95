// quick probe: does Spark 4 plan a correlated LATERAL subquery with LIMIT?
package graft.tools
import org.apache.spark.sql.SparkSession
object LateralProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    s.read.parquet("/root/testdata/sf0.001/orders.parquet").createOrReplaceTempView("orders")
    s.read.parquet("/root/testdata/sf0.001/lineitem.parquet").createOrReplaceTempView("lineitem")
    val df = s.sql("""
      SELECT o.o_orderkey, t.l_linenumber, t.l_quantity
      FROM orders o JOIN LATERAL (
        SELECT l_linenumber, l_quantity FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
        ORDER BY l_quantity DESC, l_linenumber LIMIT 2) t
      WHERE o.o_orderkey < 100
      ORDER BY o.o_orderkey, t.l_linenumber""")
    df.show(10)
    println(df.queryExecution.executedPlan.toString.take(3000))
    s.stop()
  }
}
