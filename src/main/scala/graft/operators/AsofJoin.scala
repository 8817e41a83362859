package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the right side's value at the
  * greatest right timestamp ≤ the left timestamp, per key (the standard
  * time-series enrichment join — the reference has no join surface at all,
  * SURVEY §2.10; this is a capability extension for the pipeline tier).
  *
  * Spark-first shape: NOT an inequality join (a theta join degenerates to
  * a broadcast-nested-loop — O(|L|·|R|) work at 100 TB). Instead the two
  * sides are unioned with a side marker and swept with one window sort:
  *
  *   union → Window.partitionBy(key).orderBy(ts, side) →
  *   last(right_value, ignoreNulls) over rowsBetween(-∞, 0) → keep left
  *
  * One shuffle on the key (the same partitioning both inputs would already
  * have in a series layout), sort-merge within partitions, linear work.
  * Right rows sort BEFORE left rows at equal ts (side 0 < 1), giving the
  * inclusive `≤` match that ASOF JOIN semantics require.
  *
  * The right side must be unique per (key, ts) — pre-aggregate upstream if
  * not (ties at the same ts are otherwise nondeterministic in any engine).
  */
object AsofJoin {

  /** @param left      rows to enrich (all columns preserved)
    * @param right     lookup side: key ++ ts ++ valueCol
    * @param key       equi-join key columns (present on both sides)
    * @param ts        ordering column name (present on both sides)
    * @param valueCol  right-side column to fetch as-of
    * @param as        output column name for the fetched value
    */
  def asof(left: DataFrame, right: DataFrame, key: Seq[String], ts: String,
           valueCol: String, as: String): DataFrame = {
    val vType = right.schema(valueCol).dataType
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(vType))
    // right rows carry only key+ts+value; left-only columns become nulls
    val rBase = right.select((key :+ ts).map(col) :+ col(valueCol).as("__rv"): _*)
      .withColumn("__side", lit(0))
    val r = leftCols.foldLeft(rBase) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l.columns.map(col): _*)
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn(as, last(col("__rv"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols.map(col) :+ col(as): _*)
  }
}
