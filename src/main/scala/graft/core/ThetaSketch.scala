package graft.core

import java.nio.{ByteBuffer, ByteOrder}

/** Apache DataSketches Theta sketch — the `apache-datasketches-theta-v1`
  * Puffin blob format Iceberg's `statistics` files carry per column.
  *
  * Only the COMPACT serialized form (serialization version 3) is handled:
  * that is what the Puffin spec mandates for the blob payload. The
  * reference never reads statistics at all; here the decoded estimate
  * feeds `SupportsReportStatistics` column NDVs so Spark's CBO can plan
  * joins from sketches a foreign engine already paid to compute.
  *
  * Layout (DataSketches PreambleUtil, public documentation):
  *   - long 0: preLongs(byte 0, low 6 bits), serVer(1), familyId(2),
  *     lgNomLongs(3), lgArrLongs(4), flags(5), seedHash(6-7 LE)
  *   - flags bits: 0 bigEndian, 1 readOnly, 2 empty, 3 compact, 4 ordered
  *   - preLongs == 1: empty sketch (flags EMPTY), or a SINGLE-item sketch
  *     (one hash long follows)
  *   - preLongs == 2: exact mode — long 1 carries curCount (int, LE) and
  *     p (float); theta = Long.MaxValue; curCount hash longs follow
  *   - preLongs == 3: estimation mode — long 2 is thetaLong; estimate =
  *     curCount / (theta / 2^63)
  */
object ThetaSketch {

  private val FlagEmpty = 1 << 2
  private val FlagCompact = 1 << 3
  private val FlagOrdered = 1 << 4
  private val FlagReadOnly = 1 << 1

  /** Distinct-value estimate of a serialized compact theta sketch. */
  def estimate(bytes: Array[Byte]): Double = {
    require(bytes.length >= 8, s"theta sketch too short: ${bytes.length} bytes")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val preLongs = bytes(0) & 0x3f
    val serVer = bytes(1) & 0xff
    val flags = bytes(5) & 0xff
    require(serVer == 3, s"unsupported theta sketch serialization version $serVer")
    if ((flags & FlagEmpty) != 0) return 0.0
    preLongs match {
      case 1 => 1.0 // single-item sketch: one hash follows the preamble
      case 2 =>
        val curCount = bb.getInt(8)
        curCount.toDouble // exact mode: theta == 1.0
      case 3 =>
        val curCount = bb.getInt(8)
        val thetaLong = bb.getLong(16)
        require(thetaLong > 0, s"bad thetaLong $thetaLong")
        curCount.toDouble / (thetaLong.toDouble / Long.MaxValue.toDouble)
      case other =>
        throw new IllegalArgumentException(
          s"unsupported theta sketch preamble length $other")
    }
  }

  /** Serialize a compact ordered sketch from raw retained hashes.
    * `theta = None` → exact mode (every distinct hash retained);
    * `theta = Some(t)` → estimation mode (hashes are the values < t).
    * The KMV construction — retain the k smallest hashes, theta = the
    * (k+1)-th — produces exactly this form. */
  def compactSketchBytes(hashes: Seq[Long],
                         theta: Option[Long] = None): Array[Byte] = {
    val sorted = hashes.distinct.sorted
    if (sorted.isEmpty && theta.isEmpty) {
      val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      bb.put(0, 1.toByte); bb.put(1, 3.toByte); bb.put(2, 3.toByte)
      bb.put(5, (FlagEmpty | FlagCompact | FlagOrdered | FlagReadOnly).toByte)
      return bb.array()
    }
    val preLongs = if (theta.isEmpty) 2 else 3
    val bb = ByteBuffer.allocate((preLongs + sorted.size) * 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(0, preLongs.toByte); bb.put(1, 3.toByte); bb.put(2, 3.toByte)
    bb.put(5, (FlagCompact | FlagOrdered | FlagReadOnly).toByte)
    bb.putInt(8, sorted.size)
    if (preLongs == 3) bb.putLong(16, theta.get)
    sorted.zipWithIndex.foreach { case (h, i) =>
      bb.putLong((preLongs + i) * 8, h)
    }
    bb.array()
  }
}
