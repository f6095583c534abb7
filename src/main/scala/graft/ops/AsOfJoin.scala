package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed left as-of join (point-in-time lookup): for every left
  * row, attach the payload of the latest right row whose time is at or
  * before the left row's time, matching on an equality key.
  *
  * The plan is union-and-fill, not a range join: tag the two sides,
  * union them, and carry the right-side payload forward with a running
  * `last(_, ignoreNulls)` window ordered by `(time, side)`. Cost is ONE
  * shuffle on the key plus a single sorted pass — no |left|×|right|
  * range explosion and no per-row lookup structure. That is the only
  * shape that survives 100 TB: a broadcast range join requires a small
  * right side, and a theta-join degenerates quadratically inside hot
  * keys, while this plan stays linear in |left| + |right| per key.
  *
  * Contract: `right` has at most one row per `(key, rightTime)` —
  * callers pre-aggregate (the same uniqueness DuckDB's ASOF JOIN and
  * Delta MERGE impose for a deterministic result). A right row at
  * exactly the left row's time IS matched ("at or before"); left rows
  * with no match keep NULL payload (LEFT ASOF semantics).
  */
object AsOfJoin {

  /** @param payload right-side columns to attach; may include
    *   `rightTime` itself (to expose the matched as-of time). Must not
    *   collide with `left`'s columns. */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String]): DataFrame = {
    val t = "__asof_t"
    val side = "__asof_side"
    val pack = "__asof_payload"
    val leftCols = left.columns.toSeq
    require(leftCols.intersect(payload).isEmpty,
      s"payload ${payload.mkString(",")} collides with left columns")

    // The payload rides as ONE struct per right row, so `last(_,
    // ignoreNulls)` carries whole rows: a NULL field inside the matched
    // right row stays NULL instead of being backfilled per-column from
    // an older row (which would fabricate a row that never existed).
    val packType = org.apache.spark.sql.types.StructType(
      payload.map(p => right.schema(p).copy(name = p)))
    val lTagged = left.select(
      leftCols.map(col) ++
        Seq(col(leftTime).as(t), lit(1).as(side),
          lit(null).cast(packType).as(pack)): _*)
    // Right rows sort BEFORE left rows at the same instant (side 0 < 1)
    // so an exactly-equal timestamp is visible to the left row.
    // NULL-key right rows are excluded: the window's partitionBy groups
    // NULLs together, which would hand their payload to NULL-key left
    // rows — an equality-key match SQL (and the DuckDB ASOF oracle)
    // never produces. NULL-key left rows keep NULL payload instead.
    // NULL-TIME right rows are excluded too: `orderBy(asc)` sorts
    // NULLs first, so such a row would precede every real row of its
    // key and its payload would back-fill left rows that have NO
    // earlier match — SQL ASOF (`lt >= rt` is NULL for NULL rt) never
    // matches them.
    val rTagged = right
      .filter(col(key).isNotNull && col(rightTime).isNotNull).select(
      leftCols.map(c =>
        if (c == key) col(key)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(rightTime).as(t), lit(0).as(side),
          struct(payload.map(col): _*).as(pack)): _*)

    val w = Window.partitionBy(key).orderBy(col(t).asc, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .select(leftCols.map(col) ++ Seq(col(side),
        last(col(pack), ignoreNulls = true).over(w).as(pack)): _*)
      .filter(col(side) === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col(s"$pack.$p").as(p)): _*)
  }
}
