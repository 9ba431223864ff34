package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reference `file.py:38-44` reads daily xlsx uploads (terminals,
  * passport blacklist). This build environment has no xlsx codec on the
  * classpath, so the decode is STUBBED: the contract (same output shape
  * as [[DelimitedSource]] — string columns + `create_dt` from the
  * filename) is fixed here, and [[read]] fails fast with a clear message
  * rather than silently misbehaving. Swap in an xlsx DataSource (e.g. a
  * POI-backed reader) at deploy time; callers do not change.
  */
object XlsxSource {

  /** STUB — no xlsx codec available in this container. */
  def read(spark: SparkSession, pathGlob: String): DataFrame =
    throw new UnsupportedOperationException(
      "XlsxSource.read: no xlsx codec on the classpath in this environment. " +
        "Deploy with an xlsx DataSource and implement this single method; " +
        "the contract matches DelimitedSource.read (string columns + " +
        "create_dt parsed from the name_DDMMYYYY.ext filename).")
}
