package graft.core

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.util.zip.CRC32

import com.fasterxml.jackson.databind.ObjectMapper

import org.roaringbitmap.longlong.Roaring64NavigableMap

/** Puffin file format + the `deletion-vector-v1` blob codec (Iceberg
  * format-version 3 deletion vectors).
  *
  * The reference stops at V2 delete FILES (`matchDeletesToDataFile`,
  * scanner.go:162-193); deletion vectors are the V3 successor of the same
  * mechanism — one roaring bitmap of dead row positions per data file,
  * stored as a blob inside a Puffin container, addressed directly from the
  * manifest entry via (`referenced_data_file`, `content_offset`,
  * `content_size_in_bytes`). Both formats are public Apache Iceberg specs
  * (Puffin spec + spec §Deletion vectors); the bitmap rides the ALSO-public
  * 64-bit "portable" roaring serialization, implemented by the
  * org.roaringbitmap library Spark already ships.
  *
  * Layout implemented here:
  *  - file: Magic ("PFA1"), blobs…, footer
  *  - footer: Magic, payload (UTF-8 JSON), payload-size (4-byte LE),
  *    flags (4 bytes; bit 0 of byte 0 = payload lz4-compressed — this
  *    writer never sets it, the reader refuses it), Magic
  *  - deletion-vector-v1 blob: [4-byte BE length of magic+vector]
  *    [magic D1 D3 39 64][portable Roaring64][4-byte BE CRC-32 of
  *    magic+vector]
  */
object Puffin {

  val Magic: Array[Byte] = Array(0x50, 0x46, 0x41, 0x31).map(_.toByte) // PFA1
  val DvMagic: Array[Byte] = Array(0xD1, 0xD3, 0x39, 0x64).map(_.toByte)
  val DeletionVectorV1 = "deletion-vector-v1"

  /** One blob's footer entry (offset/length address the blob payload). */
  final case class BlobMetadata(
      blobType: String,
      fields: Seq[Int],
      snapshotId: Long,
      sequenceNumber: Long,
      offset: Long,
      length: Long,
      properties: Map[String, String] = Map.empty)

  // ------------------------------------------------------------- DV codec

  /** Serialize sorted row positions as a deletion-vector-v1 blob payload. */
  def dvBlobBytes(positions: Iterator[Long]): Array[Byte] = {
    val bm = new Roaring64NavigableMap(false) // unsigned order (portable spec)
    positions.foreach { p =>
      require(p >= 0, s"row position must be non-negative: $p")
      bm.addLong(p)
    }
    dvBlobBytesOf(bm)
  }

  /** Serialize an already-built bitmap (e.g. new positions unioned with a
    * prior deletion vector being superseded) as a deletion-vector-v1 blob. */
  def dvBlobBytesOf(bm: Roaring64NavigableMap): Array[Byte] = {
    bm.runOptimize()
    val vec = new ByteArrayOutputStream()
    bm.serializePortable(new DataOutputStream(vec))
    val vector = vec.toByteArray
    val crc = new CRC32()
    crc.update(DvMagic)
    crc.update(vector)
    val out = ByteBuffer.allocate(4 + 4 + vector.length + 4)
      .order(ByteOrder.BIG_ENDIAN)
    out.putInt(4 + vector.length) // combined length of magic + vector
    out.put(DvMagic)
    out.put(vector)
    out.putInt(crc.getValue.toInt)
    out.array()
  }

  /** Decode a deletion-vector-v1 blob payload back to its bitmap,
    * validating the length prefix, magic, and CRC-32. */
  def readDvBlob(blob: Array[Byte]): Roaring64NavigableMap = {
    require(blob.length >= 12, s"deletion-vector blob too short: ${blob.length} bytes")
    val buf = ByteBuffer.wrap(blob).order(ByteOrder.BIG_ENDIAN)
    val combined = buf.getInt
    require(combined == blob.length - 8,
      s"deletion-vector length prefix $combined does not match blob size " +
        s"${blob.length} — not a deletion-vector-v1 blob (other Puffin blob " +
        "types, e.g. apache-datasketches-theta-v1 sketches, are preserved " +
        "in table metadata but are not readable as deletion vectors)")
    val magic = new Array[Byte](4); buf.get(magic)
    require(java.util.Arrays.equals(magic, DvMagic),
      s"bad deletion-vector magic: ${magic.map(b => f"$b%02x").mkString(" ")}")
    val vector = new Array[Byte](combined - 4); buf.get(vector)
    val expected = buf.getInt
    val crc = new CRC32(); crc.update(DvMagic); crc.update(vector)
    require(crc.getValue.toInt == expected,
      f"deletion-vector CRC mismatch: stored 0x$expected%08x computed 0x${crc.getValue.toInt}%08x")
    val bm = new Roaring64NavigableMap(false)
    bm.deserializePortable(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(vector)))
    bm
  }

  // ------------------------------------------------------------- container

  /** Write a Puffin file of pre-encoded blobs; returns each blob's footer
    * metadata with offsets filled in (in input order). */
  def write(path: String,
            blobs: Seq[(Array[Byte], BlobMetadata)],
            fileProperties: Map[String, String] = Map.empty)
      : Seq[BlobMetadata] = {
    val out = new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(path))
    try {
      out.write(Magic)
      var offset = 4L
      val metas = blobs.map { case (bytes, meta) =>
        out.write(bytes)
        val m = meta.copy(offset = offset, length = bytes.length.toLong)
        offset += bytes.length
        m
      }
      val payload = footerJson(metas, fileProperties)
        .getBytes(StandardCharsets.UTF_8)
      out.write(Magic)
      out.write(payload)
      val tail = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      tail.putInt(payload.length)
      tail.putInt(0) // flags: footer payload uncompressed
      out.write(tail.array())
      out.write(Magic)
      metas
    } finally out.close()
  }

  /** Parse a Puffin file's footer into its blob index. */
  def readFooter(path: String): (Seq[BlobMetadata], Map[String, String]) = {
    val f = new java.io.RandomAccessFile(path, "r")
    try {
      val size = f.length()
      require(size >= 20, s"$path too small to be a Puffin file ($size bytes)")
      val head = new Array[Byte](4); f.readFully(head)
      require(java.util.Arrays.equals(head, Magic), s"$path: bad Puffin magic")
      f.seek(size - 12)
      val tail = new Array[Byte](12); f.readFully(tail)
      val tb = ByteBuffer.wrap(tail).order(ByteOrder.LITTLE_ENDIAN)
      val payloadSize = tb.getInt
      val flags = tb.getInt
      require(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(tail, 8, 12), Magic),
        s"$path: bad trailing Puffin magic")
      require((flags & 1) == 0,
        s"$path: lz4-compressed Puffin footer payload is not supported")
      f.seek(size - 12 - payloadSize - 4)
      val fm = new Array[Byte](4); f.readFully(fm)
      require(java.util.Arrays.equals(fm, Magic), s"$path: bad footer magic")
      val payload = new Array[Byte](payloadSize); f.readFully(payload)
      parseFooter(new String(payload, StandardCharsets.UTF_8))
    } finally f.close()
  }

  /** Read one blob's payload bytes by its manifest coordinates. */
  def readBlob(path: String, offset: Long, length: Long): Array[Byte] = {
    val f = new java.io.RandomAccessFile(path, "r")
    try {
      require(length <= Int.MaxValue, s"blob too large: $length")
      f.seek(offset)
      val bytes = new Array[Byte](length.toInt)
      f.readFully(bytes)
      bytes
    } finally f.close()
  }

  private def footerJson(metas: Seq[BlobMetadata],
                         props: Map[String, String]): String = {
    val mapper = new ObjectMapper()
    val sw = new java.io.StringWriter()
    val g = mapper.createGenerator(sw)
    g.writeStartObject()
    g.writeArrayFieldStart("blobs")
    metas.foreach { m =>
      g.writeStartObject()
      g.writeStringField("type", m.blobType)
      g.writeArrayFieldStart("fields"); m.fields.foreach(g.writeNumber); g.writeEndArray()
      g.writeNumberField("snapshot-id", m.snapshotId)
      g.writeNumberField("sequence-number", m.sequenceNumber)
      g.writeNumberField("offset", m.offset)
      g.writeNumberField("length", m.length)
      if (m.properties.nonEmpty) {
        g.writeObjectFieldStart("properties")
        m.properties.foreach { case (k, v) => g.writeStringField(k, v) }
        g.writeEndObject()
      }
      g.writeEndObject()
    }
    g.writeEndArray()
    if (props.nonEmpty) {
      g.writeObjectFieldStart("properties")
      props.foreach { case (k, v) => g.writeStringField(k, v) }
      g.writeEndObject()
    }
    g.writeEndObject()
    g.close()
    sw.toString
  }

  private def parseFooter(json: String)
      : (Seq[BlobMetadata], Map[String, String]) = {
    val root = new ObjectMapper().readTree(json)
    val blobs = Vector.newBuilder[BlobMetadata]
    Option(root.get("blobs")).foreach(_.forEach { b =>
      val fields = Vector.newBuilder[Int]
      Option(b.get("fields")).foreach(_.forEach(n => fields += n.asInt()))
      val props = Map.newBuilder[String, String]
      Option(b.get("properties")).foreach(
        _.properties().forEach(e => props += e.getKey -> e.getValue.asText()))
      blobs += BlobMetadata(
        blobType = b.get("type").asText(),
        fields = fields.result(),
        snapshotId = Option(b.get("snapshot-id")).map(_.asLong()).getOrElse(0L),
        sequenceNumber = Option(b.get("sequence-number")).map(_.asLong()).getOrElse(0L),
        offset = b.get("offset").asLong(),
        length = b.get("length").asLong(),
        properties = props.result())
    })
    val fileProps = Map.newBuilder[String, String]
    Option(root.get("properties")).foreach(
      _.properties().forEach(e => fileProps += e.getKey -> e.getValue.asText()))
    (blobs.result(), fileProps.result())
  }
}
