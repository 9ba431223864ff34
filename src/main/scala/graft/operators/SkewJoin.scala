package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed key distributions.
  *
  * AQE's skew-join handling splits oversized partitions at runtime, but
  * only for sort-merge joins; when a handful of fact keys dominate (the
  * classic hot-customer / hot-terminal shape in the reference's
  * transaction feed), salting spreads each hot key over `salt`
  * sub-partitions deterministically: the dim side replicates `salt`
  * ways (small × salt is still small), the fact side derives its salt
  * from row content — no RNG, so plans are reproducible and re-runnable.
  */
object SkewJoin {

  /** Inner equi-join equivalent to
    * `facts.join(dim, facts(factKey) === dim(dimKey))` but executed over
    * `salt`-way split keys. `saltSource` columns must exist on the fact
    * side and (together) vary within a key group — the fact's own
    * primary key is the usual choice.
    */
  def saltedEquiJoin(facts: DataFrame, dim: DataFrame, factKey: String,
                     dimKey: String, saltSource: Seq[String], salt: Int): DataFrame = {
    // improbable helper name + dropped before returning: the output
    // schema must equal the plain join's (no leaked/ambiguous columns)
    val saltCol = "__graft_salt"
    require(!facts.columns.contains(saltCol) && !dim.columns.contains(saltCol),
      s"input already has a $saltCol column")
    val saltedDim = dim.withColumn(saltCol,
      explode(array((0 until salt).map(lit): _*)))
    val saltedFacts = facts.withColumn(saltCol,
      pmod(xxhash64(saltSource.map(col): _*), lit(salt.toLong)).cast("int"))
    saltedFacts.join(saltedDim,
        saltedFacts(factKey) === saltedDim(dimKey) &&
          saltedFacts(saltCol) === saltedDim(saltCol))
      .drop(saltedFacts(saltCol)).drop(saltedDim(saltCol))
  }
}
