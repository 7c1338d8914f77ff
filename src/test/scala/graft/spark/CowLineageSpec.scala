package graft.spark

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** V3 row lineage through COPY-ON-WRITE SQL DML: the group-based rewrite
  * requests the lineage metadata columns and the replacement files
  * materialize them, so carried rows keep their identity across
  * UPDATE/DELETE rewrites (the spec's id-preserving rewrite). */
class CowLineageSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // ONE warehouse for the suite: Spark caches the catalog instance per
  // name, so re-pointing the same catalog name at a new warehouse per
  // test would silently keep the first — distinct TABLES instead
  private lazy val wh: String = {
    val dir = Files.createTempDirectory("cow_lineage_wh").toFile.getPath
    spark.conf.set("spark.sql.catalog.gcl", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcl.warehouse", dir)
    dir
  }

  private def setup(name: String): String = {
    val s = spark
    import s.implicits._
    val loc = s"$wh/db/$name"
    var t = TableWriter.create(Seq.empty[(Long, String)].toDF("id", "v"), loc)
    t = TableWriter.upgradeFormatVersion(t, s, 3)
    t = TableWriter.append(t, Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("id", "v").coalesce(1).sortWithinPartitions("id"))
    loc
  }

  private def lineage(loc: String): Map[Long, (Option[Long], Option[Long])] =
    spark.read.format("icegopher").load(loc)
      .selectExpr("id", "_row_id", "_last_updated_sequence_number")
      .collect().map(r => r.getLong(0) -> (
        (if (r.isNullAt(1)) None else Some(r.getLong(1))),
        (if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap

  test("CoW DELETE: carried rows keep _row_id and _last_updated_seq") {
    val loc = setup("tdel")
    val before = lineage(loc)
    assert(before.view.mapValues(_._1).toMap ==
      Map(1L -> Some(0L), 2L -> Some(1L), 3L -> Some(2L), 4L -> Some(3L)))
    // non-pushable predicate → group-based CoW rewrite of the whole file
    spark.sql(s"DELETE FROM gcl.db.tdel WHERE id % 2 = 0 AND length(v) > 0")
    val after = lineage(loc)
    assert(after.keySet == Set(1L, 3L))
    // positions changed (row 3 is now at position 1) but ids did not
    assert(after(1L) == before(1L), after)
    assert(after(3L) == before(3L), after)
  }

  test("CoW UPDATE: unchanged rows keep identity; updated rows observed") {
    val loc = setup("tupd")
    val before = lineage(loc)
    spark.sql("UPDATE gcl.db.tupd SET v = upper(v) WHERE id = 2 OR id = 3")
    val after = lineage(loc)
    assert(after.keySet == Set(1L, 2L, 3L, 4L))
    // _row_id is preserved for EVERY row (Spark's If-shaped rewrite
    // delivers the scan's metadata for modified rows too) — the spec's
    // SHOULD for updates
    (1L to 4L).foreach(k => assert(after(k)._1 == before(k)._1, after))
    // _last_updated_sequence_number deliberately does NOT materialize on
    // UPDATE/MERGE (the carried metadata would keep the OLD value on
    // modified rows and a seq-keyed consumer would MISS the update), so
    // every row of the rewritten file reads the rewrite commit's data
    // sequence number — the safe file-granular over-approximation
    val newSeq = after(2L)._2
    assert(newSeq.exists(_ > before(2L)._2.get), after)
    (1L to 4L).foreach(k => assert(after(k)._2 == newSeq, after))
    val content = spark.read.format("icegopher").load(loc)
      .selectExpr("id", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(content == Set((1L, "a"), (2L, "B"), (3L, "C"), (4L, "d")))
  }

  test("CoW MERGE preserves carried ids and content matches") {
    val loc = setup("tmrg")
    val s = spark
    import s.implicits._
    val before = lineage(loc)
    Seq((2L, "bb"), (9L, "z")).toDF("id", "v").createOrReplaceTempView("cl_src")
    s.sql(
      """MERGE INTO gcl.db.tmrg t USING cl_src c ON t.id = c.id
         WHEN MATCHED THEN UPDATE SET t.v = c.v
         WHEN NOT MATCHED THEN INSERT *""")
    val after = lineage(loc)
    assert(after.keySet == Set(1L, 2L, 3L, 4L, 9L))
    // carried rows keep _row_id; _last moves to the merge commit's seq
    // (file-granular, see the UPDATE test)
    Seq(1L, 3L, 4L).foreach(k => assert(after(k)._1 == before(k)._1, after))
    // the new row gets a FRESH id above every pre-existing one
    assert(after(9L)._1.exists(_ >= 4L), after)
    // all ids distinct (no collision between materialized + derived)
    val ids = after.values.flatMap(_._1).toSeq
    assert(ids.distinct.size == ids.size, after)
  }
}
