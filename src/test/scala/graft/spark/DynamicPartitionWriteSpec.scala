package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** A task writer must hold a BOUNDED number of open data files no matter
  * how many partition tuples flow through it: an open parquet writer
  * buffers up to a row group, so "one open writer per tuple ever seen"
  * is the classic dynamic-partition OOM once a spec like (status,
  * day(ts)) yields thousands of tuples. The append path locally sorts by
  * tuple (one open file at a time); this spec pins the LRU cap that
  * protects the unsorted paths (CoW rewrites, streaming sink). */
class DynamicPartitionWriteSpec extends AnyFunSuite {

  private val schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("k",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("v",
      org.apache.spark.sql.types.LongType)))

  test("open files stay capped under round-robin tuples; no row is lost") {
    val dir = Files.createTempDirectory("dynpart").toFile.getPath
    val w = new GraftCowDataWriter(dir, 0, 0L, schema,
      partFields = Seq(PartFieldSpec("k", "identity", "k")),
      maxOpenFiles = 3)
    val tuples = 10
    var peak = 0
    for (i <- 0 until 200) {
      val row = new GenericInternalRow(
        Array[Any](UTF8String.fromString(s"t${i % tuples}"), i.toLong))
      w.write(row)
      peak = math.max(peak, w.openSinks)
    }
    assert(peak <= 3, s"peak open writers $peak exceeds the cap")
    val out = w.commit().asInstanceOf[GraftCowCommit]
    assert(out.files.map(_.rows).sum == 200, s"rows lost: ${out.files}")
    assert(out.files.map(_.partition("k")).toSet.size == tuples,
      "some partition tuple never reached a file")
    // eviction re-opens tuples as new files — every file still belongs to
    // exactly one tuple and carries rows
    assert(out.files.forall(_.rows > 0))
    assert(out.files.size >= tuples)
  }

  test("tuple-sorted input writes sequentially: one open file at a time") {
    val dir = Files.createTempDirectory("dynpart2").toFile.getPath
    val w = new GraftCowDataWriter(dir, 0, 1L, schema,
      partFields = Seq(PartFieldSpec("k", "identity", "k")),
      maxOpenFiles = 4)
    var peak = 0
    for (t <- 0 until 20; i <- 0 until 5) {
      w.write(new GenericInternalRow(
        Array[Any](UTF8String.fromString(s"t$t"), i.toLong)))
      peak = math.max(peak, w.openSinks)
    }
    // sorted input never needs more than the current tuple's file open
    // plus the LRU tail awaiting eviction — far below tuple count
    assert(peak <= 4, s"peak $peak")
    val out = w.commit().asInstanceOf[GraftCowCommit]
    assert(out.files.map(_.rows).sum == 100)
    // exactly one file per tuple: sorted input must NOT fragment files
    assert(out.files.size == 20, s"sorted input fragmented: ${out.files.size}")
  }
}
