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

  /** DataSketches' default update seed — readers validate the preamble's
    * seedHash (bytes 6-7) against the hash of THEIR seed and reject a
    * mismatch, so written sketches must stamp it (zero never matches:
    * computeSeedHash itself rejects seeds hashing to 0). */
  private val DefaultUpdateSeed = 9001L

  private def fmix64(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33; k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33; k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33; k
  }

  /** DataSketches `computeSeedHash`: low 16 bits of MurmurHash3 x64-128
    * (Appleby's public algorithm) over the seed as a single long, hash
    * seed 0. */
  private[graft] def seedHash(seed: Long): Short = {
    val c1 = 0x87c37b91114253d5L
    val c2 = 0x4cf5ad432745937fL
    var h1 = 0L; var h2 = 0L
    var k1 = seed
    k1 *= c1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= c2
    h1 ^= k1
    h1 ^= 8L; h2 ^= 8L // total length in bytes
    h1 += h2; h2 += h1
    h1 = fmix64(h1); h2 = fmix64(h2)
    h1 += h2
    val sh = (h1 & 0xffffL).toShort
    require(sh != 0, s"seed $seed hashes to 0 (DataSketches would reject it)")
    sh
  }

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
      bb.putShort(6, seedHash(DefaultUpdateSeed))
      return bb.array()
    }
    val preLongs = if (theta.isEmpty) 2 else 3
    val bb = ByteBuffer.allocate((preLongs + sorted.size) * 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(0, preLongs.toByte); bb.put(1, 3.toByte); bb.put(2, 3.toByte)
    bb.put(5, (FlagCompact | FlagOrdered | FlagReadOnly).toByte)
    bb.putShort(6, seedHash(DefaultUpdateSeed))
    bb.putInt(8, sorted.size)
    if (preLongs == 3) bb.putLong(16, theta.get)
    sorted.zipWithIndex.foreach { case (h, i) =>
      bb.putLong((preLongs + i) * 8, h)
    }
    bb.array()
  }
}
