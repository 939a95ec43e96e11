package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal operators Spark lacks natively — as-of join and sessionization —
 * composed from built-in window functions per the custom-operator ladder
 * (compose > custom Expression > custom plan node): both reduce to ONE
 * keyed window shuffle, so no custom physical operator is justified.
 */
object Temporal {

  /**
   * As-of (backward) join: for every left row, attach the payload of the
   * LATEST right row with `rightTs` ≤ `leftTs` for the same key (inclusive
   * at equality), null when none exists — exactly DuckDB's
   * `ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts`, which is the
   * driver oracle for q_asof_join.
   *
   * Plan shape: union both sides sorted per key, forward-fill the payload
   * with `last(ignoreNulls)` over (key, ts, side) — a SINGLE window shuffle
   * on the key, never a range join (a range-predicate join degenerates to
   * per-key quadratic work; the merge-by-time formulation is the scale
   * path). Right rows sort BEFORE left rows at equal ts so equality is
   * inclusive.
   *
   * Requirements: payload column names must not collide with left columns;
   * the right side should be unique per (key, ts) for deterministic payloads
   * (pre-aggregate otherwise).
   *
   * The payload is forward-filled as ONE struct of all payload columns, so
   * every left row receives all columns of the SINGLE matched right row —
   * exactly DuckDB ASOF semantics. (Filling each column independently with
   * `last(ignoreNulls)` would stitch a composite row from different right
   * rows whenever the latest right row has a null payload field.) One
   * window expression regardless of payload width.
   */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String): DataFrame = {
    val lCols = left.columns.toSeq
    val payload = right.columns.toSeq.filterNot(c => c == key || c == rightTs)
    require(payload.nonEmpty, "right side has no payload columns")
    require(lCols.intersect(payload).isEmpty,
      s"right payload collides with left columns: ${lCols.intersect(payload)}")
    val lSel = Seq(col(key).as("_k"), col(leftTs).as("_ts"), lit(1).as("_l")) ++
      lCols.map(col) ++
      payload.map(c => lit(null).cast(right.schema(c).dataType).as(c))
    val rSel = Seq(col(key).as("_k"), col(rightTs).as("_ts"), lit(0).as("_l")) ++
      lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
      payload.map(col)
    val u = left.select(lSel: _*).unionByName(right.select(rSel: _*))
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_l"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = u.withColumn("_pay",
      last(when(col("_l") === 0, struct(payload.map(col): _*)),
        ignoreNulls = true).over(w))
    filled.filter(col("_l") === 1)
      .select(lCols.map(col) ++
        payload.map(c => col("_pay").getField(c).as(c)): _*)
  }

  /**
   * Sessionization: assign a per-key session sequence number that
   * increments whenever the gap to the previous event exceeds `gapSeconds`
   * (strictly greater — a gap of exactly `gapSeconds` stays in-session).
   * lag + conditional cumsum over one keyed window; `tieBreak` makes the
   * within-key order total (duplicate timestamps would otherwise make the
   * lag nondeterministic).
   *
   * Engine/TZ-proofing: the timestamp is projected ONCE into an
   * epoch-seconds BIGINT (`unix_timestamp` floors to the second, exactly
   * DuckDB's `floor(epoch(ts))`), and ALL derived values — the ordering,
   * the gap, and the session bounds — live in that single integer domain.
   * No timestamp value crosses an engine boundary, so there is no
   * serialization/timezone channel left to diverge on.
   */
  private def withEpochSeq(df: DataFrame, key: String, tsCol: String,
                           gapSeconds: Long, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col("_ts_s"), col(tieBreak))
    df.withColumn("_ts_s", unix_timestamp(col(tsCol)))
      .withColumn("_prev", lag(col("_ts_s"), 1).over(w))
      .withColumn("_new",
        when(col("_prev").isNull || col("_ts_s") - col("_prev") > gapSeconds,
          1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("_prev", "_new")
  }

  /** Row-level sessionization: original columns + `session_seq`. */
  def sessionize(df: DataFrame, key: String, tsCol: String,
                 gapSeconds: Long, tieBreak: String): DataFrame =
    withEpochSeq(df, key, tsCol, gapSeconds, tieBreak).drop("_ts_s")

  /**
   * Per-session roll-up: events, epoch-second bounds, duration. Bounds are
   * BIGINT epoch seconds (`session_start_s`/`session_end_s`), not raw
   * timestamps — see [[withEpochSeq]] for why.
   */
  def sessionStats(df: DataFrame, key: String, tsCol: String,
                   gapSeconds: Long, tieBreak: String): DataFrame =
    withEpochSeq(df, key, tsCol, gapSeconds, tieBreak)
      .groupBy(col(key), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("_ts_s")).as("session_start_s"),
        max(col("_ts_s")).as("session_end_s"))
      .withColumn("duration_s", col("session_end_s") - col("session_start_s"))
}
