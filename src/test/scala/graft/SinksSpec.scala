package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{Sinks, Tables, XlsxSource}

class SinksSpec extends SparkSpec {

  test("parquet/csv/json/orc round-trips preserve row counts") {
    val base = Files.createTempDirectory("graft_sinks").toString
    val df = Tables.nation(spark, sf)
    val n = df.count()
    Seq("parquet", "csv", "json", "orc").foreach { fmt =>
      val p = s"$base/$fmt"
      fmt match {
        case "parquet" => Sinks.writeParquet(df, p)
        case "csv"     => Sinks.writeCsv(df, p)
        case "json"    => Sinks.writeJson(df, p)
        case "orc"     => Sinks.writeOrc(df, p)
      }
      assert(Sinks.readBack(spark, p, fmt).count() == n, s"$fmt round-trip lost rows")
    }
  }

  test("partitioned parquet enables partition pruning in the plan") {
    val base = Files.createTempDirectory("graft_part").toString
    Sinks.writeParquet(Tables.orders(spark, sf), s"$base/orders",
      partitionBy = Seq("o_orderpriority"))
    val pruned = spark.read.parquet(s"$base/orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() > 0)
    assert(scan.contains("o_orderpriority"), "partition column must drive the scan")
  }

  test("xlsx read of an empty glob fails fast, not silently") {
    val e = intercept[IllegalArgumentException](
      XlsxSource.read(spark, "/tmp/nope_*.xlsx"))
    assert(e.getMessage.contains("no files match"))
  }
}
