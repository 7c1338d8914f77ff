package graft.core

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal WKB (Well-Known Binary, OGC 06-103r4) support for the V3 geo
  * types: point encode/decode for the spec's geo BOUNDS (lower/upper bounds
  * of a geometry column are bbox corner POINTS), and envelope extraction
  * over the standard geometry kinds for write-side stats.
  *
  * The reference has no geo support at all (types parse only); Iceberg V3
  * defines geometry bounds as x/y min/max points, with geography's x range
  * allowed to wrap the antimeridian (lower.x > upper.x). Only 2D (xy)
  * coordinates are handled; Z/M-flagged or SRID-flagged (EWKB) geometries
  * return None — callers treat that as "no stats" (prune-safe). */
object Wkb {
  private val PointType = 1
  private val LineStringType = 2
  private val PolygonType = 3
  private val MultiPointType = 4
  private val MultiLineStringType = 5
  private val MultiPolygonType = 6
  private val GeometryCollectionType = 7

  /** A 2D POINT as little-endian WKB (21 bytes) — the encoding the V3 spec
    * uses for geo lower/upper bounds. */
  def pointWkb(x: Double, y: Double): Array[Byte] = {
    val bb = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte) // little-endian marker
    bb.putInt(PointType)
    bb.putDouble(x)
    bb.putDouble(y)
    bb.array()
  }

  /** A 2-point 2D LINESTRING as little-endian WKB (41 bytes) — the
    * minimal geometry whose ENVELOPE is an arbitrary box; `st_box`
    * authors these for bbox-join fixtures and box-valued columns. */
  def lineWkb(x0: Double, y0: Double, x1: Double, y1: Double): Array[Byte] = {
    val bb = ByteBuffer.allocate(9 + 32).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte)
    bb.putInt(LineStringType)
    bb.putInt(2)
    bb.putDouble(x0); bb.putDouble(y0)
    bb.putDouble(x1); bb.putDouble(y1)
    bb.array()
  }

  /** Decode a WKB POINT → (x, y). None for anything else. */
  def parsePoint(wkb: Array[Byte]): Option[(Double, Double)] =
    envelope(wkb).collect { case (xmin, ymin, xmax, ymax)
      if xmin == xmax && ymin == ymax => (xmin, ymin) }

  /** [[envelope]] with a Janino-friendly surface for generated code:
    * `[xmin, ymin, xmax, ymax]`, or null when unparseable — codegen can't
    * type scala.Option/Tuple4 (raw-type assignment errors). */
  def envelopeArray(wkb: Array[Byte]): Array[Double] = envelope(wkb) match {
    case Some((a, b, c, d)) => Array(a, b, c, d)
    case None => null
  }

  /** GEOGRAPHY envelope with a Janino-friendly surface:
    * `[xmin, ymin, xmax, ymax]` where `xmin > xmax` is the V3 spec's
    * antimeridian WRAP ([xmin, 180] ∪ [-180, xmax]), or null when
    * unparseable. Longitudes are walked SHORT-ARC (each vertex unwrapped
    * relative to the previous — a 179°→-179° edge spans 2°, not 358°,
    * matching geodesic edge semantics), so a geometry straddling ±180°
    * gets the tight wrapped envelope instead of the planar near-global
    * box. A true ≥360° longitude span degrades to the full range. */
  def geoEnvelopeArray(wkb: Array[Byte]): Array[Double] =
    geoEnvelope(wkb) match {
      case Some((a, b, c, d)) => Array(a, b, c, d)
      case None => null
    }

  def geoEnvelope(wkb: Array[Byte]): Option[(Double, Double, Double, Double)] = {
    if (wkb == null || wkb.length < 5) return None
    try {
      val acc = new GeoEnvelope
      if (read(ByteBuffer.wrap(wkb), acc)) acc.result else None
    } catch { case _: Exception => None }
  }

  /** Longitude normalized to [-180, 180) — +180 maps to -180, the seam's
    * single canonical representation. */
  def wrapLon(x: Double): Double = x - 360.0 * math.floor((x + 180.0) / 360.0)

  /** The (xmin, ymin, xmax, ymax) envelope of a 2D WKB geometry; None when
    * the bytes are not parseable 2D WKB (unknown type, Z/M/SRID flags,
    * truncation) or the geometry is empty. */
  def envelope(wkb: Array[Byte]): Option[(Double, Double, Double, Double)] = {
    if (wkb == null || wkb.length < 5) return None
    try {
      val acc = new Envelope
      if (read(ByteBuffer.wrap(wkb), acc)) acc.result else None
    } catch { case _: Exception => None }
  }

  private class Envelope {
    var xmin: Double = Double.PositiveInfinity
    var ymin: Double = Double.PositiveInfinity
    var xmax: Double = Double.NegativeInfinity
    var ymax: Double = Double.NegativeInfinity
    def add(x: Double, y: Double): Unit = {
      if (x < xmin) xmin = x
      if (x > xmax) xmax = x
      if (y < ymin) ymin = y
      if (y > ymax) ymax = y
    }
    def result: Option[(Double, Double, Double, Double)] =
      if (xmin.isInfinite) None else Some((xmin, ymin, xmax, ymax))
  }

  /** Geography accumulator: longitudes accumulate in UNWRAPPED space (each
    * vertex shifted by ±360 until within 180° of its predecessor — the
    * short-arc walk), then the result normalizes back, possibly as the
    * spec's wrapped xmin > xmax representation. */
  private final class GeoEnvelope extends Envelope {
    private var prev: Double = Double.NaN
    override def add(x0: Double, y: Double): Unit = {
      var x = wrapLon(x0)
      if (!prev.isNaN) {
        while (x - prev > 180.0) x -= 360.0
        while (prev - x > 180.0) x += 360.0
      }
      prev = x
      super.add(x, y)
    }
    override def result: Option[(Double, Double, Double, Double)] =
      super.result.map { case (x0, y0, x1, y1) =>
        if (x1 - x0 >= 360.0) (-180.0, y0, 180.0, y1)
        else if (x0 >= -180.0 && x1 <= 180.0) (x0, y0, x1, y1)
        // the unwrapped interval crosses exactly one seam (span < 360):
        // normalized start > normalized end = the spec's wrap encoding
        else (wrapLon(x0), y0, wrapLon(x1), y1)
      }
  }

  /** Real data nests collections a handful of levels at most; adversarial
    * WKB made of nothing but nested collection headers (9 bytes each) must
    * hit this bound, not a StackOverflowError — which, being an Error,
    * would escape envelope()'s Exception catch and kill the scan task
    * instead of degrading to the prune-safe None. */
  private val MaxNestingDepth = 32

  /** Consume one geometry from `bb` into `acc`; false = unsupported.
    * Handles plain OGC WKB, ISO Z/M/ZM variants (type + 1000/2000/3000 —
    * the extra per-point doubles are skipped, the x/y envelope is still
    * exact), and PostGIS EWKB (Z/M/SRID flag bits; the SRID word is
    * skipped) — foreign geo data is routinely one of these three. */
  private def read(bb: ByteBuffer, acc: Envelope, depth: Int = 0): Boolean = {
    if (depth > MaxNestingDepth) return false
    if (bb.remaining() < 5) return false
    val order = bb.get()
    bb.order(if (order == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    val rawType = bb.getInt()
    // EWKB flag bits (PostGIS): Z, M, SRID
    val ewkbZ = (rawType & 0x80000000) != 0
    val ewkbM = (rawType & 0x40000000) != 0
    val hasSrid = (rawType & 0x20000000) != 0
    val unflagged = rawType & 0x0FFFFFFF
    // ISO encodes dimensionality in the thousands digit: 1xxx=Z, 2xxx=M,
    // 3xxx=ZM (only meaningful for the base kinds 1-7)
    val isoDims = unflagged / 1000
    val kind = unflagged % 1000
    if (kind < 1 || kind > 7 || isoDims > 3) return false
    val extraDims =
      (if (ewkbZ) 1 else 0) + (if (ewkbM) 1 else 0) +
        (isoDims match { case 3 => 2; case 1 | 2 => 1; case _ => 0 })
    if (hasSrid) {
      if (bb.remaining() < 4) return false
      bb.getInt() // SRID: envelope extraction doesn't interpret it
    }
    val pointBytes = 16L + 8L * extraDims
    def point(): Boolean = {
      if (bb.remaining() < pointBytes) return false
      acc.add(bb.getDouble(), bb.getDouble())
      bb.position(bb.position() + 8 * extraDims)
      true
    }
    def ring(): Boolean = {
      if (bb.remaining() < 4) return false
      val n = bb.getInt()
      if (n < 0 || bb.remaining() < pointBytes * n) return false
      var i = 0
      while (i < n) {
        acc.add(bb.getDouble(), bb.getDouble())
        bb.position(bb.position() + 8 * extraDims)
        i += 1
      }
      true
    }
    kind match {
      case PointType => point()
      case LineStringType => ring()
      case PolygonType =>
        if (bb.remaining() < 4) return false
        val rings = bb.getInt()
        (0 until rings).forall(_ => ring())
      case MultiPointType | MultiLineStringType | MultiPolygonType |
          GeometryCollectionType =>
        if (bb.remaining() < 4) return false
        val n = bb.getInt()
        // each member repeats a full WKB header (byte order may differ)
        (0 until n).forall(_ => read(bb, acc, depth + 1))
      case _ => false
    }
  }

  /** bbox intersection test with the V3 geography antimeridian rule: a
    * file whose lower.x > upper.x covers [lower.x, 180] ∪ [-180, upper.x].
    * The QUERY bbox is always a plain (non-wrapping) range. */
  def bboxIntersects(fileXMin: Double, fileYMin: Double,
                     fileXMax: Double, fileYMax: Double,
                     qXMin: Double, qYMin: Double,
                     qXMax: Double, qYMax: Double,
                     wrapX: Boolean): Boolean = {
    val yHit = !(qYMax < fileYMin || qYMin > fileYMax)
    if (!yHit) return false
    if (wrapX && fileXMin > fileXMax)
      // wrapped file range: [fileXMin, 180] ∪ [-180, fileXMax]
      qXMax >= fileXMin || qXMin <= fileXMax
    else !(qXMax < fileXMin || qXMin > fileXMax)
  }
}
