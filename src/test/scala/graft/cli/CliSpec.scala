package graft.cli

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.spark.{SparkTestSession, TableWriter}

/** CLI verbs against a local table, asserting on captured stdout (the
  * automated analog of cmd/icegopher's output tests). */
class CliSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val tableLoc: String = {
    val loc = Files.createTempDirectory("cli_tbl").toFile.getPath
    val src = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    val t1 = TableWriter.create(src, loc, properties = Map("owner" -> "graft-tests"))
    TableWriter.append(t1, src)
    loc
  }

  private def run(args: String*): String = {
    val out = new ByteArrayOutputStream()
    Console.withOut(new PrintStream(out)) { Main.run(args.toArray) }
    out.toString("UTF-8")
  }

  test("describe") {
    val out = run("describe", tableLoc)
    assert(out.contains("Table format version: 2"))
    assert(out.contains("Current snapshot:"))
    assert(out.contains("r_regionkey"))
  }

  test("schema and uuid and location") {
    assert(run("schema", tableLoc).contains("r_name"))
    assert(run("uuid", tableLoc).trim.matches("[0-9a-f-]{36}"))
    assert(run("location", tableLoc).trim == tableLoc)
  }

  test("spec on unpartitioned table") {
    assert(run("spec", tableLoc).contains("[unpartitioned]"))
  }

  test("snapshots lists both commits") {
    val out = run("snapshots", tableLoc)
    assert(out.linesIterator.size == 2)
    assert(out.contains("append"))
  }

  test("refs lists main branch") {
    assert(run("refs", tableLoc).contains("main\tbranch"))
  }

  test("properties get") {
    assert(run("properties", "get", tableLoc).contains("owner\tgraft-tests"))
    assert(run("properties", "get", tableLoc, "owner").trim == "graft-tests")
  }

  test("files prints the snapshot tree") {
    val out = run("files", tableLoc)
    assert(out.contains("Snapshot "))
    assert(out.contains("Manifest:"))
    assert(out.contains("Datafile:"))
  }

  private def freshTable(): String = {
    val loc = Files.createTempDirectory("cli_mut").toFile.getPath
    TableWriter.create(
      spark.read.parquet("/root/testdata/sf0.001/region.parquet"), loc,
      properties = Map("owner" -> "graft-tests"))
    loc
  }

  test("properties set and remove") {
    val loc = freshTable()
    run("properties", "set", loc, "retention", "30d")
    assert(run("properties", "get", loc, "retention").trim == "30d")
    run("properties", "remove", loc, "retention")
    assert(intercept[Main.CliError](
      run("properties", "get", loc, "retention")).msg.contains("not found"))
    // removing a missing key is an error
    assert(intercept[Main.CliError](
      run("properties", "remove", loc, "nope")).msg.contains("not found"))
  }

  test("rename moves the table, old path stops resolving") {
    val loc = freshTable()
    val dst = loc + "_renamed"
    run("rename", loc, dst)
    assert(run("uuid", dst).trim.matches("[0-9a-f-]{36}"))
    assert(intercept[Main.CliError](run("rename", loc, dst + "2"))
      .msg.contains("not an Iceberg table"))
    // renaming onto an existing table is refused
    val other = freshTable()
    assert(intercept[Main.CliError](run("rename", other, dst))
      .msg.contains("already exists"))
  }

  test("drop deletes the table; dropping a non-table is an error") {
    val loc = freshTable()
    run("drop", loc)
    assert(!new java.io.File(loc, "metadata").exists())
    assert(intercept[Main.CliError](run("drop", loc))
      .msg.contains("not an Iceberg table"))
  }

  test("rollback and expire verbs") {
    val loc = freshTable()
    val t1 = graft.spark.IcebergTables.load(loc)
    val snap1 = t1.currentSnapshot.get.snapshotId
    TableWriter.append(t1,
      spark.read.parquet("/root/testdata/sf0.001/region.parquet"))
    // expire everything but the newest snapshot
    run("expire", loc, (System.currentTimeMillis() + 1000).toString, "1")
    val afterExpire = graft.spark.IcebergTables.load(loc)
    assert(afterExpire.metadata.snapshots.size == 1)
    assert(afterExpire.metadata.snapshots.head.snapshotId != snap1)
    // rollback within remaining history (roll to the survivor = no-op move)
    val survivor = afterExpire.currentSnapshot.get.snapshotId
    run("rollback", loc, survivor.toString)
    assert(graft.spark.IcebergTables.load(loc).currentSnapshot.get.snapshotId == survivor)
    assert(intercept[Main.CliError](run("rollback", "ns.tbl", "1"))
      .msg.contains("local table path"))
  }

  test("unknown verb and missing --uri are errors, not exits") {
    assert(intercept[Main.CliError](run("frobnicate")).msg.contains("usage:"))
    assert(intercept[Main.CliError](run("list")).msg.contains("--uri"))
  }
}
