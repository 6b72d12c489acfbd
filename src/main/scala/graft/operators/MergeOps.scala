package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Batch MERGE / temporal-table operators — the warehouse maintenance
  * surface around the analytics core: latest-version-wins upsert (what
  * `MERGE INTO` does for a snapshot refresh) and change-interval
  * historization (SCD2-style validity ranges from an event log).
  * Both are single-keyed-window formulations: no join against the
  * update set, no per-key loop — at cluster scale they behave like any
  * keyed window (a hot key is one sorted partition).
  */
object MergeOps {

  /** Latest-version-wins upsert: union `base` and `updates` (same
    * schema), keep the highest-`versionCol` row per key — the batch
    * MERGE of a snapshot refresh, as one union + one keyed window
    * instead of the outer-join + coalesce-each-column formulation
    * (which re-shuffles both sides and breaks on schema drift).
    * CONTRACT: (keys, version) unique across the union — equal
    * versions for one key have no defined winner; version your update
    * batches. Inserts (keys only in `updates`) pass through; deletes
    * are out of scope (model them as tombstone rows upstream). */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String],
      versionCol: String): DataFrame = {
    require(base.columns.toSet == updates.columns.toSet,
      s"upsert needs identical schemas, got ${base.columns.toSeq} vs ${updates.columns.toSeq}")
    require(keys.forall(base.columns.contains) && base.columns.contains(versionCol),
      "keys and versionCol must exist")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(versionCol).desc)
    base.unionByName(updates)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Snapshot diff — the CDC primitive between two versions of a keyed
    * table: classify every key as `insert` (new only), `delete` (old
    * only), or `update` (present in both, any non-key column differs
    * under null-safe comparison); unchanged keys are dropped. One full
    * outer join on the keys; value comparison is a codegen'd
    * column-wise `<=>` chain, no serialization of whole rows. The
    * output is what an incremental pipeline ships instead of the full
    * snapshot. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(oldDf.columns.toSet == newDf.columns.toSet,
      s"snapshotDiff needs identical schemas, got ${oldDf.columns.toSeq} vs ${newDf.columns.toSeq}")
    require(keys.forall(oldDf.columns.contains), s"keys $keys must exist")
    val valueCols = oldDf.columns.filterNot(keys.contains).toSeq
    val o = oldDf.select(keys.map(col) ++
      valueCols.map(c => col(c).as(s"__o_$c")) :+ lit(1).as("__in_o"): _*)
    val n = newDf.select(keys.map(col) ++
      valueCols.map(c => col(c).as(s"__n_$c")) :+ lit(1).as("__in_n"): _*)
    val differs = valueCols
      .map(c => !(col(s"__o_$c") <=> col(s"__n_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, keys, "full_outer")
      .withColumn("change",
        when(col("__in_o").isNull, lit("insert"))
          .when(col("__in_n").isNull, lit("delete"))
          .when(differs, lit("update"))
          .otherwise(lit("unchanged")))
      .filter(col("change") =!= "unchanged")
      .select(keys.map(col) :+ col("change"): _*)
  }

  /** CDC log compaction with tombstones: reduce an ordered change log
    * (each row an upsert or a delete for one key) to the final
    * snapshot — what `MERGE INTO` with `WHEN MATCHED AND op='D' THEN
    * DELETE` computes, and the operation every CDC-fed lakehouse table
    * replays on compaction. Last writer wins per key under
    * (`orderCols`) ascending — the caller supplies a total order
    * (e.g. `(ts, event_id)`); equal full order keys have no defined
    * winner. A key whose LAST entry is a tombstone (`opCol ===
    * deleteOp`) is dropped entirely; earlier tombstones are simply
    * superseded (re-insert after delete works).
    *
    * Shape: ONE shuffle by key + one keyed window — no join against
    * the base snapshot (compaction unions base+log upstream if a base
    * exists, exactly like [[upsert]]). At 100 TB the log partitions by
    * key like any keyed window; a hot key is one sorted partition. */
  def cdcApply(log: DataFrame, keys: Seq[String], orderCols: Seq[String],
      opCol: String, deleteOp: String = "D"): DataFrame = {
    require(keys.nonEmpty && orderCols.nonEmpty, "keys and orderCols required")
    require((keys ++ orderCols :+ opCol).forall(log.columns.contains),
      "keys, orderCols and opCol must exist")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(col(_).desc): _*)
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= deleteOp)
      .drop("__rn")
  }

  /** Golden-record consolidation — the survivorship step of entity
    * resolution (after blocking+matching produced pairs and connected
    * components produced cluster labels): per cluster emit one record
    * with the pinned survivorship policy `rec_id = min(id)`,
    * `nameCol = modal value` (ties to the lexicographically smallest —
    * deterministic, engine-portable), `valCol = max`. Two keyed
    * aggregates on the cluster key (the mode needs its own
    * (cluster, name) count) + one same-key join — no per-cluster
    * loops, scales with the largest CLUSTER like any keyed window. */
  def goldenRecord(labeled: DataFrame, clusterCol: String, idCol: String,
      nameCol: String, valCol: String): DataFrame = {
    require(Seq(clusterCol, idCol, nameCol, valCol)
      .forall(labeled.columns.contains), "all columns must exist")
    val mode = labeled.groupBy(col(clusterCol), col(nameCol))
      .agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(clusterCol)
      .orderBy(col("__cnt").desc, col(nameCol))
    val best = mode.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(clusterCol), col(nameCol))
    labeled.groupBy(col(clusterCol))
      .agg(min(col(idCol)).as("rec_id"),
        count(lit(1)).as("n_members"),
        max(col(valCol)).as(valCol))
      .join(best, Seq(clusterCol))
  }

  /** Change-interval historization (gaps-and-islands): collapse each
    * key's consecutive runs of an equal `valueCol` into validity
    * intervals `[valid_from, valid_to)` with a row count — the SCD2
    * "effective from/to" table derived from an event log. `valid_to`
    * is the next interval's start, null for the still-open run.
    * Ties at one timestamp order by `tieBreak` so run boundaries are
    * deterministic. Two keyed windows + one aggregate, all on the same
    * key partitioning. CONTRACT: `valueCol` non-null — a null value
    * never compares unequal to its neighbor (`lag <> v` is null), so
    * null rows would silently extend the preceding run; encode "no
    * value" as a sentinel upstream. */
  def changeIntervals(df: DataFrame, keys: Seq[String], timeCol: String,
      valueCol: String, tieBreak: String): DataFrame = {
    val keyCols = keys.map(col)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col(timeCol), col(tieBreak))
    val run = Window.partitionBy(keyCols: _*)
      .orderBy(col(timeCol), col(tieBreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val grouped = df
      .withColumn("__chg",
        when(lag(col(valueCol), 1).over(w).isNull ||
          lag(col(valueCol), 1).over(w) =!= col(valueCol), 1).otherwise(0))
      .withColumn("__grp", sum("__chg").over(run))
      .groupBy(keyCols :+ col("__grp"): _*)
      .agg(min(col(valueCol)).as(valueCol), // all equal within a run
        min(col(timeCol)).as("valid_from"),
        count(lit(1)).as("n_rows"))
    // next-run lookup orders by the run counter, not valid_from: __grp
    // is strictly increasing along each key's timeline by construction,
    // so the ordering stays deterministic even if two adjacent runs
    // share a boundary timestamp
    val nxt = Window.partitionBy(keyCols: _*).orderBy(col("__grp"))
    grouped
      .withColumn("valid_to", lead(col("valid_from"), 1).over(nxt))
      .select(keyCols ++ Seq(col(valueCol), col("valid_from"),
        col("valid_to"), col("n_rows")): _*)
  }
}
