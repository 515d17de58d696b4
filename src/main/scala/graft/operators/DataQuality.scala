package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite (the Deequ/
  * great-expectations audit shape): each constraint evaluates to ONE
  * row (constraint name, table, rows checked, violations, pass flag),
  * and the suite is the union — the gate a curated corpus or warehouse
  * load runs before publishing, next to the k-anonymity audit (q161)
  * and the data-card profile (q83).
  *
  * Scale design: every constraint is a single aggregation over one scan
  * (map-side combined, 1-row output), except referential integrity
  * which is one left-anti hash join counted — so a suite of C
  * constraints costs C scans of the audited columns (column-pruned to
  * just what each constraint reads) and zero windows. Constraint
  * results are 1-row DataFrames; the union is driver-free.
  */
object DataQuality {

  private def one(name: String, table: String, df: DataFrame,
      violation: Column): DataFrame =
    df.agg(count(lit(1)).cast("long").as("total"),
        // SUM over zero rows is NULL — coalesce so an EMPTY audited
        // table reads as 0 violations / pass = 1, not an indeterminate
        // NULL audit row
        coalesce(sum(when(violation, 1L).otherwise(0L)), lit(0L))
          .cast("long").as("violations"))
      .select(lit(name).as("check_name"), lit(table).as("tbl"),
        col("total"), col("violations"),
        (col("violations") === 0L).cast("long").as("pass"))

  /** Rows where `colName` is null or (for strings) empty. */
  def complete(name: String, table: String, df: DataFrame,
      colName: String): DataFrame =
    one(name, table, df,
      col(colName).isNull || length(col(colName).cast("string")) === 0)

  /** Duplicate keys: violations = rows beyond the first per key. */
  def unique(name: String, table: String, df: DataFrame,
      keyCol: String): DataFrame =
    df.agg(count(lit(1)).cast("long").as("total"),
        (count(lit(1)) - countDistinct(col(keyCol))).cast("long")
          .as("violations"))
      .select(lit(name).as("check_name"), lit(table).as("tbl"),
        col("total"), col("violations"),
        (col("violations") === 0L).cast("long").as("pass"))

  /** Rows whose value falls outside [lo, hi]. */
  def inRange(name: String, table: String, df: DataFrame, colName: String,
      lo: Double, hi: Double): DataFrame =
    one(name, table, df, col(colName) < lo || col(colName) > hi)

  /** Rows whose value is not in the allowed set (null counts as a
    * violation — an unknown category is out of domain). */
  def inSet(name: String, table: String, df: DataFrame, colName: String,
      allowed: Seq[String]): DataFrame =
    one(name, table, df,
      col(colName).isNull || !col(colName).isin(allowed: _*))

  /** Rows violating an arbitrary boolean predicate (true = violation). */
  def satisfies(name: String, table: String, df: DataFrame,
      violation: Column): DataFrame =
    one(name, table, df, violation)

  /** Referential integrity: child rows whose `fkCol` has no match in
    * the parent's `pkCol` (one left-anti hash join + count). */
  def referential(name: String, table: String, child: DataFrame,
      fkCol: String, parent: DataFrame, pkCol: String): DataFrame = {
    val total = child.agg(count(lit(1)).cast("long").as("total"))
    val orphans = child.select(col(fkCol))
      .join(parent.select(col(pkCol).as(fkCol)).distinct(), Seq(fkCol),
        "left_anti")
      .agg(count(lit(1)).cast("long").as("violations"))
    total.crossJoin(orphans)
      .select(lit(name).as("check_name"), lit(table).as("tbl"),
        col("total"), col("violations"),
        (col("violations") === 0L).cast("long").as("pass"))
  }

  /** The suite: union of single-constraint results. */
  def suite(constraints: Seq[DataFrame]): DataFrame = {
    require(constraints.nonEmpty,
      "DataQuality.suite needs at least one constraint — an empty suite " +
        "has no audit semantics (it would vacuously pass)")
    constraints.reduce(_.unionByName(_))
  }
}
