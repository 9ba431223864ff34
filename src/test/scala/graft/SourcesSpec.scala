package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.sources.{DelimitedSource, FileIngest}

class SourcesSpec extends SparkSpec {

  private def mkTxt(dir: String, name: String, content: String): String = {
    val p = Paths.get(dir, name)
    Files.writeString(p, content)
    p.toString
  }

  test("delimited txt reader parses ;-separated decimal-comma files with filename dates") {
    val dir = Files.createTempDirectory("graft_src").toString
    mkTxt(dir, "transactions_15032024.txt",
      "transaction_id;amount;oper_type\nT1;123,45;PAYMENT\nT2;67,80;WITHDRAW\n")
    val df = DelimitedSource.normalizeDecimalColumns(
      DelimitedSource.read(spark, s"$dir/transactions_*.txt"), Seq("amount")).cache()
    assert(df.count() == 2)
    val r = df.filter(col("transaction_id") === "T1").collect()(0)
    assert(math.abs(r.getAs[Double]("amount") - 123.45) < 1e-9)
    assert(r.getAs[java.sql.Date]("create_dt").toString == "2024-03-15")
  }

  test("file finder globs templates and archive moves the file") {
    val dir = Files.createTempDirectory("graft_find").toString
    mkTxt(dir, "terminals_01012024.txt", "a;b\n1;2\n")
    mkTxt(dir, "unrelated.csv", "x\n1\n")
    val found = FileIngest.find(spark, dir, Seq("terminals_*.txt", "transactions_*.txt"))
    assert(found.size == 1 && found.head.endsWith("terminals_01012024.txt"))
    val archived = FileIngest.archive(spark, found.head)
    assert(archived.endsWith("archive/terminals_01012024.txt.backup"))
    assert(FileIngest.find(spark, dir, Seq("terminals_*.txt")).isEmpty)
  }
}
