package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-adaptive timestamp access for driver-provided tables.
  *
  * The driver's testdata generator has shipped `events.ts` in two physical
  * shapes across rounds: parquet TIMESTAMP(NANOS), which Spark reads as a
  * LONG of epoch nanos under `spark.sql.legacy.parquet.nanosAsLong=true`,
  * and plain TIMESTAMP(MICROS) with no timezone flag, which Spark 4 reads
  * as TIMESTAMP_NTZ (DuckDB reads the same bytes as its naive TIMESTAMP).
  * Operators doing epoch arithmetic (as-of join, bucketed range join) or
  * event-time windows must run against BOTH shapes, so these accessors
  * dispatch on the column's actual DataType instead of hard-coding one
  * era's encoding. Every graft entry point pins
  * `spark.sql.session.timeZone=UTC`, which makes the NTZ→TIMESTAMP cast
  * the identity on the wall-clock reading — the same convention DuckDB's
  * naive-timestamp arithmetic uses, so oracle comparisons stay exact.
  */
object Timestamps {

  /** One hour in the epoch-microsecond domain [[epochUs]] maps into. */
  val HourUs: Long = 3600L * 1000000L

  /** Epoch microseconds as LONG, whatever physical shape `c` carries:
    * legacy nanos-as-long divides to µs; timestamp types go through
    * `unix_micros` (NTZ read as UTC wall clock — sessions pin UTC).
    */
  def epochUs(df: DataFrame, c: String): Column = df.schema(c).dataType match {
    case LongType         => (col(c) / 1000L).cast("long")
    case TimestampType    => unix_micros(col(c))
    case TimestampNTZType => unix_micros(col(c).cast(TimestampType))
    case _                => col(c).cast("long")
  }

  /** An order-and-tie-preserving LONG image of `c` for comparison-only use
    * (as-of ordering): timestamps map to epoch µs; numeric columns pass
    * through `cast("long")` untouched — no unit assumption, so a caller
    * already holding epoch seconds/millis/nanos keeps exact tie semantics.
    */
  def asLong(df: DataFrame, c: String): Column = df.schema(c).dataType match {
    case TimestampType    => unix_micros(col(c))
    case TimestampNTZType => unix_micros(col(c).cast(TimestampType))
    case _                => col(c).cast("long")
  }

  /** The column as an event-time timestamp usable by `window()`: legacy
    * nanos-as-long becomes a µs timestamp; timestamp types (LTZ or NTZ —
    * Spark windows both) pass through unchanged.
    */
  def asTimestamp(df: DataFrame, c: String): Column = df.schema(c).dataType match {
    case LongType => timestamp_micros((col(c) / 1000L).cast("long"))
    case _        => col(c)
  }
}
