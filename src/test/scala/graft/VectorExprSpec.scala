package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.sources.Tables

/** Native vector expressions must be bit-identical to the built-in HOF
  * formulations (same left-to-right accumulation), on real embeddings.
  */
class VectorExprSpec extends SparkSpec {

  private def pairs = {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val a = e.filter(col("vec_id") < 50).select(col("vec_id").as("ia"), col("v").as("va"))
    val b = e.filter(col("vec_id") >= 50 && col("vec_id") < 100)
      .select(col("vec_id").as("ib"), col("v").as("vb"))
    a.crossJoin(b)
  }

  test("native dot == HOF dot, bit-identical") {
    assert(pairs.filter(dot(col("va"), col("vb")) =!= dotHof(col("va"), col("vb"))).isEmpty)
  }

  test("native cosine == HOF cosine, bit-identical") {
    assert(pairs.filter(cosine(col("va"), col("vb")) =!=
      cosineHof(col("va"), col("vb"))).isEmpty)
  }

  test("native l2sq == HOF l2sq, bit-identical") {
    assert(pairs.filter(l2sq(col("va"), col("vb")) =!= l2sqHof(col("va"), col("vb"))).isEmpty)
  }

  test("null elements and length mismatch: native == HOF (both NULL)") {
    val df = spark.sql(
      """SELECT array(1.0d, cast(null as double)) AS va,
        |       array(1.0d, 2.0d) AS vb, array(1.0d) AS vc""".stripMargin)
    for ((n, h) <- Seq[(( org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column,
                        (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column)](
        (dot _, dotHof _), (cosine _, cosineHof _), (l2sq _, l2sqHof _))) {
      assert(df.filter(!(n(col("va"), col("vb")) <=> h(col("va"), col("vb")))).isEmpty,
        "null element must yield NULL in both formulations")
      assert(df.filter(!(n(col("vc"), col("vb")) <=> h(col("vc"), col("vb")))).isEmpty,
        "length mismatch must yield NULL in both formulations")
      assert(df.filter(n(col("va"), col("vb")).isNotNull).isEmpty)
      assert(df.filter(n(col("vc"), col("vb")).isNotNull).isEmpty)
    }
  }

  test("cosine zero-norm with length mismatch: 0.0 in both formulations") {
    // the HOF when(denom === 0, 0.0) short-circuits BEFORE the zipped
    // dot can null-out on length mismatch — the native op must agree
    val df = spark.sql("SELECT array(0.0d) AS vz, array(1.0d, 2.0d) AS vb")
    assert(df.filter(!(cosine(col("vz"), col("vb")) <=>
      cosineHof(col("vz"), col("vb")))).isEmpty)
    assert(df.select(cosine(col("vz"), col("vb"))).head().getDouble(0) === 0.0)
    // nonzero norms + length mismatch → NULL in both
    val df2 = spark.sql("SELECT array(3.0d) AS va, array(1.0d, 2.0d) AS vb")
    assert(df2.filter(!(cosine(col("va"), col("vb")) <=>
      cosineHof(col("va"), col("vb")))).isEmpty)
    assert(df2.filter(cosine(col("va"), col("vb")).isNotNull).isEmpty)
  }

  test("cosine handles zero vectors without NaN") {
    val row = spark.sql(
      "SELECT vec_cosine(array(0.0d, 0.0d), array(1.0d, 2.0d)) AS c").head()
    assert(row.getDouble(0) === 0.0)
  }

  test("SQL registration: vec_dot/vec_cosine/vec_l2sq callable from SQL") {
    val r = spark.sql(
      """SELECT vec_dot(array(1.0d,2.0d), array(3.0d,4.0d)) AS d,
        |       vec_cosine(array(1.0d,0.0d), array(1.0d,0.0d)) AS c,
        |       vec_l2sq(array(1.0d,2.0d), array(1.0d,4.0d)) AS l""".stripMargin).head()
    assert(r.getDouble(0) === 11.0 && r.getDouble(1) === 1.0 && r.getDouble(2) === 4.0)
  }
}
