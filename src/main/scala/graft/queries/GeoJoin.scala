package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-bucketed spatial join — the Dedup banding discipline applied to
  * space: bucket both sides by fixed grid cells, equi-join on the cell
  * key, verify the exact envelope intersection on the matched pairs. The
  * only shuffle keys are (ix, iy) cell ids — envelopes and geometries
  * never ride a shuffle wider than their own row, and there is no
  * cartesian anywhere. Matched pairs are emitted exactly once via the
  * canonical-cell rule (only the cell containing the intersection
  * rectangle's lower-left corner reports the pair), so no distinct
  * shuffle is needed either.
  *
  * At 100 TB this is the standard fixed-grid partition join: shuffle
  * volume is O(rows × cells-per-row), with cells-per-row bounded by
  * `maxCellsPerRow` — a geometry spanning more cells fails LOUDLY (pick a
  * coarser `cellSize`) instead of silently fanning out quadratically.
  * Planar geometry only; geography (antimeridian-wrapping) inputs are the
  * caller's responsibility to split at the meridian first.
  *
  * Reference scope: the reference has no geo support at all (types parse
  * only, SURVEY S19); this is engine-native functionality next to the
  * file-level bbox pruning (ice28/ice30). */
object GeoJoin {

  private def envelope(geom: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      graft.spark.functions.StEnvelopeExpr(
        org.apache.spark.sql.graft.ColumnShim.expression(geom)))

  /** Pairs of (left row, right row) whose WKB envelopes intersect.
    * `leftGeom`/`rightGeom` name WKB binary columns; rows whose WKB does
    * not parse are dropped (prune-safe, same as the scan's stats pass).
    * Output = left columns ++ right columns (callers alias collisions
    * away first). */
  def stBboxJoin(left: DataFrame, leftGeom: String,
                 right: DataFrame, rightGeom: String,
                 cellSize: Double, maxCellsPerRow: Int = 256): DataFrame = {
    require(cellSize > 0 && !cellSize.isInfinite, s"bad cellSize $cellSize")
    require(maxCellsPerRow >= 1, s"bad maxCellsPerRow $maxCellsPerRow")

    def cellsOf(df: DataFrame, geom: String, side: String): DataFrame = {
      val env = s"__env_$side"
      val e = df.withColumn(env, envelope(col(geom)))
        .filter(col(env).isNotNull)
      val ix0 = floor(col(env)(0) / cellSize).cast("long")
      val ix1 = floor(col(env)(2) / cellSize).cast("long")
      val iy0 = floor(col(env)(1) / cellSize).cast("long")
      val iy1 = floor(col(env)(3) / cellSize).cast("long")
      val nCells = (ix1 - ix0 + 1) * (iy1 - iy0 + 1)
      // the cap is enforced INSIDE the cell computation so column pruning
      // can never drop the guard: an oversized envelope fails the job with
      // a clear message instead of exploding the shuffle
      val cells = when(nCells <= maxCellsPerRow,
        flatten(transform(sequence(ix0, ix1), ix =>
          transform(sequence(iy0, iy1), iy =>
            struct(ix.as("ix"), iy.as("iy"))))))
        .otherwise(raise_error(concat(
          lit(s"st_bbox_join: an envelope spans more than $maxCellsPerRow " +
            s"grid cells at cellSize=$cellSize ("), nCells,
          lit(") - choose a coarser cellSize or raise maxCellsPerRow"))))
      e.withColumn(s"__cell_$side", explode(cells))
    }

    val l = cellsOf(left, leftGeom, "l")
    val r = cellsOf(right, rightGeom, "r")
    val le = col("__env_l"); val re = col("__env_r")
    l.join(r, col("__cell_l") === col("__cell_r"))
      // exact envelope intersection on the co-bucketed candidates
      .filter(le(0) <= re(2) && re(0) <= le(2) &&
        le(1) <= re(3) && re(1) <= le(3))
      // canonical cell: emit each intersecting pair exactly once — from
      // the cell holding the intersection rectangle's lower-left corner
      .filter(
        col("__cell_l.ix") ===
          floor(greatest(le(0), re(0)) / cellSize).cast("long") &&
        col("__cell_l.iy") ===
          floor(greatest(le(1), re(1)) / cellSize).cast("long"))
      .drop("__env_l", "__env_r", "__cell_l", "__cell_r")
  }
}
