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
  *
  * `geography = true` handles antimeridian wrapping: envelopes compute
  * SHORT-ARC ([[graft.core.Wkb.geoEnvelope]] — a wrapped envelope is the
  * spec's `xmin > xmax` encoding, the same rule the scan's
  * MetricsEvaluator applies to file bounds), each wrapped envelope buckets
  * into its TWO cell ranges ([xmin, 180] and [-180, xmax]), the exact
  * verify intersects longitude SEGMENT sets, and the canonical-cell rule
  * anchors on the westernmost overlap segment — still exactly-once, still
  * no distinct.
  *
  * Reference scope: the reference has no geo support at all (types parse
  * only, SURVEY S19); this is engine-native functionality next to the
  * file-level bbox pruning (ice28/ice30). */
object GeoJoin {

  private def envelope(geom: Column, geography: Boolean = false): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      graft.spark.functions.StEnvelopeExpr(
        org.apache.spark.sql.graft.ColumnShim.expression(geom), geography))

  /** Pairs of (left row, right row) whose WKB envelopes intersect.
    * `leftGeom`/`rightGeom` name WKB binary columns; rows whose WKB does
    * not parse are dropped (prune-safe, same as the scan's stats pass).
    * Output = left columns ++ right columns (callers alias collisions
    * away first). */
  def stBboxJoin(left: DataFrame, leftGeom: String,
                 right: DataFrame, rightGeom: String,
                 cellSize: Double, maxCellsPerRow: Int = 256,
                 geography: Boolean = false): DataFrame = {
    require(cellSize > 0 && !cellSize.isInfinite, s"bad cellSize $cellSize")
    require(maxCellsPerRow >= 1, s"bad maxCellsPerRow $maxCellsPerRow")

    // a wrapped geography envelope (x0 > x1) is the two x-segments
    // [x0, 180] ∪ [-180, x1]; everything else is its own single segment
    def segsOf(env: String): Column =
      if (!geography)
        array(struct(col(env)(0).as("s"), col(env)(2).as("e")))
      else when(col(env)(0) <= col(env)(2),
        array(struct(col(env)(0).as("s"), col(env)(2).as("e"))))
        .otherwise(array(
          struct(col(env)(0).as("s"), lit(180.0).as("e")),
          struct(lit(-180.0).as("s"), col(env)(2).as("e"))))

    def cellsOf(df: DataFrame, geom: String, side: String): DataFrame = {
      val env = s"__env_$side"
      val e0 = df.withColumn(env, envelope(col(geom), geography))
        .filter(col(env).isNotNull)
      val iy0 = floor(col(env)(1) / cellSize).cast("long")
      val iy1 = floor(col(env)(3) / cellSize).cast("long")
      if (!geography) {
        // planar fast path: single segment, pure-arithmetic pre-count
        val ix0 = floor(col(env)(0) / cellSize).cast("long")
        val ix1 = floor(col(env)(2) / cellSize).cast("long")
        val nCells = (ix1 - ix0 + 1) * (iy1 - iy0 + 1)
        // the cap is enforced INSIDE the cell computation so column
        // pruning can never drop the guard: an oversized envelope fails
        // the job with a clear message instead of exploding the shuffle
        val cells = when(nCells <= maxCellsPerRow,
          flatten(transform(sequence(ix0, ix1), ix =>
            transform(sequence(iy0, iy1), iy =>
              struct(ix.as("ix"), iy.as("iy"))))))
          .otherwise(raise_error(concat(
            lit(s"st_bbox_join: an envelope spans more than $maxCellsPerRow " +
              s"grid cells at cellSize=$cellSize ("), nCells,
            lit(") - choose a coarser cellSize or raise maxCellsPerRow"))))
        e0.withColumn(s"__cell_$side", explode(cells))
      } else {
        val segs = s"__segs_$side"
        val e = e0.withColumn(segs, segsOf(env))
        // ARITHMETIC pre-count (an upper bound: segments sharing a
        // boundary x-cell count it twice) so the cap check never
        // materializes the array it is guarding against — a giant
        // envelope must fail from the numbers alone
        val nCells = aggregate(
          transform(col(segs), seg =>
            floor(seg("e") / cellSize).cast("long") -
              floor(seg("s") / cellSize).cast("long") + lit(1L)),
          lit(0L), (acc, n) => acc + n) * (iy1 - iy0 + 1)
        // array_distinct: an almost-full wrapped envelope's two segments
        // can meet in the SAME x-cell — a duplicated cell would
        // double-join the pair and defeat the exactly-once rule
        val cells = when(nCells <= maxCellsPerRow,
          array_distinct(flatten(transform(col(segs), seg =>
            flatten(transform(
              sequence(floor(seg("s") / cellSize).cast("long"),
                floor(seg("e") / cellSize).cast("long")), ix =>
              transform(sequence(iy0, iy1), iy =>
                struct(ix.as("ix"), iy.as("iy")))))))))
          .otherwise(raise_error(concat(
            lit(s"st_bbox_join: an envelope spans more than $maxCellsPerRow " +
              s"grid cells at cellSize=$cellSize ("), nCells,
            lit(") - choose a coarser cellSize or raise maxCellsPerRow"))))
        e.withColumn(s"__cell_$side", explode(cells))
      }
    }

    val l = cellsOf(left, leftGeom, "l")
    val r = cellsOf(right, rightGeom, "r")
    val le = col("__env_l"); val re = col("__env_r")
    val joined = l.join(r, col("__cell_l") === col("__cell_r"))
    val out =
      if (!geography)
        // planar fast path: plain codegen'd comparisons (the segment HOFs
        // below evaluate interpreted — measurably slower in the join's
        // inner loop, and single-segment planar envelopes don't need them)
        joined
          // exact envelope intersection on the co-bucketed candidates
          .filter(le(0) <= re(2) && re(0) <= le(2) &&
            le(1) <= re(3) && re(1) <= le(3))
          // canonical cell: emit each intersecting pair exactly once —
          // from the cell holding the intersection's lower-left corner
          .filter(
            col("__cell_l.ix") ===
              floor(greatest(le(0), re(0)) / cellSize).cast("long") &&
            col("__cell_l.iy") ===
              floor(greatest(le(1), re(1)) / cellSize).cast("long"))
      else {
        // longitude overlap = pairwise SEGMENT intersections (≤4, usually
        // 1); the canonical x anchors on the westernmost overlap's start,
        // which by construction lies inside one x-segment of EACH side —
        // so exactly one joint cell passes the canonical filter
        val overlaps = expr(
          """filter(
               flatten(transform(__segs_l, ls ->
                 transform(__segs_r, rs ->
                   struct(greatest(ls.s, rs.s) AS s, least(ls.e, rs.e) AS e)))),
               seg -> seg.s <= seg.e)""")
        joined
          .withColumn("__ov", overlaps)
          .filter(size(col("__ov")) > 0 && le(1) <= re(3) && re(1) <= le(3))
          .filter(
            col("__cell_l.ix") ===
              floor(array_min(expr("transform(__ov, o -> o.s)")) / cellSize)
                .cast("long") &&
            col("__cell_l.iy") ===
              floor(greatest(le(1), re(1)) / cellSize).cast("long"))
          .drop("__ov")
      }
    out.drop("__env_l", "__env_r", "__segs_l", "__segs_r",
      "__cell_l", "__cell_r")
  }
}
