package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout operators: Z-order (Morton) keys and
  * the min/max pruning audit that justifies them. At 100 TB the scan
  * you avoid is the cheapest scan there is — writers cluster files by
  * a space-filling curve so per-file min/max statistics prune
  * multi-column predicates (the technique behind Delta/Iceberg
  * `OPTIMIZE ZORDER BY`; Morton 1966, and Orenstein & Merrett's
  * z-order range queries, PODS 1984 — public literature). The engine
  * computes the key map-only; the audit proves the benefit with exact
  * integers, so the whole demonstration hash-oracles. */
object Layout {

  /** Morton/Z-order interleave of two non-negative integer keys
    * (`bits` low bits each → a 2·bits-bit key): bit b of x lands at
    * position 2b, bit b of y at 2b+1. Pure bitwise Column arithmetic —
    * codegen'd, map-only, no shuffle; prefixes of the key are quadtree
    * cells, which is what makes range stats on BOTH dimensions tight
    * after sorting by it. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).flatMap { b =>
      Seq(shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b),
        shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }.reduce((a, c) => a.bitwiseOR(c))

  /** Pruning audit: bucket the table two ways — `cells` quadtree
    * cells (the top bits of [[zValue]], i.e. files written in z-order)
    * vs `cells` contiguous ranges of the natural write order — and
    * count, per layout, how many buckets a point predicate on each key
    * column could touch given per-bucket min/max stats (the file-skip
    * decision every lake reader makes). Natural order keeps no
    * locality on either key (~every bucket hit); z-order keeps BOTH
    * within ~√cells. Keys are first quantized to their own
    * [0, 2^bits) range (`⌊k·2^bits/(max+1)⌋` — what a real z-order
    * writer does with arbitrary key domains, so the top cell bits are
    * occupied at ANY key range; the floor is boundary-exact because an
    * integer-valued quotient of exactly-representable doubles rounds
    * to itself). All counts are exact integers over one aggregation
    * per layout — bucket ids are pure key functions, so no global
    * sort/rank is needed to simulate the layout. */
  def zorderPruningAudit(df: DataFrame, naturalCol: String, xCol: String,
      yCol: String, cells: Int, predX: Long, predY: Long,
      bits: Int = 16): DataFrame = {
    require(cells > 0 && (cells & (cells - 1)) == 0, "cells must be a power of 2")
    val cellBits = java.lang.Integer.numberOfTrailingZeros(cells)
    val mx = df.agg(max(col(naturalCol)).as("__mx"),
      max(col(xCol)).as("__mxx"), max(col(yCol)).as("__mxy"))
    val scale = math.pow(2.0, bits).toLong
    def quant(k: Column, kmax: Column): Column =
      floor(k * lit(scale.toDouble) / (kmax + 1)).cast("long")
    val withMx = df.crossJoin(broadcast(mx))
    val zb = withMx.withColumn("__bkt",
      shiftright(zValue(quant(col(xCol), col("__mxx")),
        quant(col(yCol), col("__mxy")), bits), 2 * bits - cellBits))
    val nb = withMx.withColumn("__bkt",
      floor(col(naturalCol) * lit(cells.toDouble) / (col("__mx") + 1))
        .cast("long"))
    def audit(b: DataFrame, layout: String): DataFrame =
      b.groupBy("__bkt")
        .agg(min(col(xCol)).as("__minx"), max(col(xCol)).as("__maxx"),
          min(col(yCol)).as("__miny"), max(col(yCol)).as("__maxy"))
        .agg(count(lit(1)).as("n_buckets"),
          count(when(col("__minx") <= predX && col("__maxx") >= predX, 1))
            .as("buckets_hit_x"),
          count(when(col("__miny") <= predY && col("__maxy") >= predY, 1))
            .as("buckets_hit_y"))
        .select(lit(layout).as("layout"), col("n_buckets"),
          col("buckets_hit_x"), col("buckets_hit_y"))
    audit(nb, "natural").unionAll(audit(zb, "zorder"))
  }
}
