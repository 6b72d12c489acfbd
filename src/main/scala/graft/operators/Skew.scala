package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation utilities. Spark's AQE already splits skewed
  * partitions for sort-merge joins at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`); this explicit salt is for
  * the cases AQE can't rewrite — aggregations over a hot key and
  * broadcast-ineligible joins where one key dominates a partition.
  */
object Skew {

  /** Salted equi-join: the skewed side gets a pseudo-random salt in
    * [0, saltFactor); the small side is replicated across all salts, so
    * a hot key's rows spread over `saltFactor` reducers instead of one.
    * Output equals the unsalted join (the salt is dropped) — which is
    * why `joinType` is restricted to the left-preserving kinds: under
    * right/full outer an UNMATCHED small-side row would surface once
    * per replica (saltFactor duplicate null-extended rows). Salt the
    * other input for those.
    */
  private val leftPreserving =
    Set("inner", "left", "leftouter", "left_outer", "leftsemi",
      "left_semi", "leftanti", "left_anti", "cross")
  def saltedJoin(skewed: DataFrame, small: DataFrame, key: String,
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    require(leftPreserving(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin joinType '$joinType' would duplicate unmatched " +
        "replicated-side rows; only inner/left/semi/anti/cross are equal " +
        "to their unsalted twin")
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase salted aggregation for COMMUTATIVE partial aggregates
    * (count/sum shapes): aggregate per (key, salt) first — spreading a
    * hot key across reducers — then merge the partials per key.
    * `partials` maps the input to per-(key,salt) aggregates; `merge`
    * combines the partial columns. For built-in sums/counts Spark's own
    * map-side partial aggregation already does this; use when the
    * aggregate buffer itself is the hot spot (e.g. giant collect_list
    * per key).
    */
  def saltedAgg(df: DataFrame, key: String, saltFactor: Int,
      partials: org.apache.spark.sql.RelationalGroupedDataset => DataFrame,
      merge: org.apache.spark.sql.RelationalGroupedDataset => DataFrame): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)))
    val partial = partials(salted.groupBy(col(key), col("__salt")))
    merge(partial.groupBy(col(key)))
  }
}
