package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Helpers enforcing the oracle hash-match discipline (SURVEY.md §5.3):
  * every aggregated double is rounded, every output totally ordered,
  * arrays sorted, timestamps bucketed/stringified — never raw.
  *
  * The driver compares our parquet dump against DuckDB running the same
  * SQL; IEEE754 summation-order differences between engines make raw
  * aggregated doubles unhashable, and ns-vs-µs parquet timestamp reads
  * make raw `events.ts` unhashable (FIXTURES.md).
  */
object Determinism {
  /** Round an aggregated double to 4 decimal places (both engines agree
    * once the last-ulp summation noise is below 1e-4). */
  def r4(c: Column): Column = round(c, 4)

  /** Round to 6 dp — for stats (stddev/corr) whose magnitudes are small. */
  def r6(c: Column): Column = round(c, 6)

  /** Timestamp → `yyyy-MM-dd` string, the bulletproof cross-engine form
    * for date-grained outputs (avoids parquet date32-vs-timestamp drift). */
  def dstr(c: Column): Column = date_format(c, "yyyy-MM-dd")

  /** Timestamp → `yyyy-MM-dd HH:mm:ss` string (second grain). */
  def tstr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")
}
