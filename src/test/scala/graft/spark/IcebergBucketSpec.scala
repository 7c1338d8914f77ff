package graft.spark

import org.apache.spark.sql.functions.{col, lit, to_date, to_timestamp}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{BucketHash, IntLit, LongLit, StrLit, TsLit, DateLit}
import graft.spark.functions.functions.icebergBucket

/** The codegen'd bucket expression must agree bit-for-bit with the core
  * (interpreted) BucketHash on the Iceberg spec vectors and on random data —
  * both the codegen and the interpreted `nullSafeEval` paths. */
class IcebergBucketSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def evalBucket(c: org.apache.spark.sql.Column): Int = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("b")).collect()(0).getInt(0)
  }

  test("spec vectors through the Catalyst expression") {
    assert(evalBucket(icebergBucket(16, lit(34))) == (2017239379 & Int.MaxValue) % 16)
    assert(evalBucket(icebergBucket(16, lit(34L))) == (2017239379 & Int.MaxValue) % 16)
    assert(evalBucket(icebergBucket(16, lit("iceberg"))) == (1210000089 & Int.MaxValue) % 16)
    assert(evalBucket(icebergBucket(16, to_date(lit("2017-11-16")))) ==
      ((-653330422) & Int.MaxValue) % 16)
    assert(evalBucket(icebergBucket(16,
      to_timestamp(lit("2017-11-16 22:31:08")).cast("timestamp_ntz"))) ==
      ((-2047944441) & Int.MaxValue) % 16)
  }

  test("codegen agrees with interpreted core hash on random longs and strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val longs = Seq.fill(200)(rnd.nextLong())
    val gotL = longs.toDF("v").select(icebergBucket(1024, col("v")).as("b"))
      .collect().map(_.getInt(0)).toSeq
    assert(gotL == longs.map(v => BucketHash(LongLit(v), 1024)))

    val strs = Seq.fill(200)(rnd.nextString(rnd.nextInt(30)))
    val gotS = strs.toDF("v").select(icebergBucket(1024, col("v")).as("b"))
      .collect().map(_.getInt(0)).toSeq
    assert(gotS == strs.map(v => BucketHash(StrLit(v), 1024)))
  }

  test("null stays null") {
    import spark.implicits._
    val got = Seq[Option[Long]](None, Some(5L)).toDF("v")
      .select(icebergBucket(8, col("v")).as("b")).collect()
    assert(got(0).isNullAt(0) && !got(1).isNullAt(0))
  }

  test("hashLong fast path equals byte-array murmur") {
    val rnd = new scala.util.Random(9)
    for (_ <- 1 to 1000) {
      val v = rnd.nextLong()
      assert(functions.IcebergBucketExpr.hashLong(v) == BucketHash.hash(LongLit(v)))
    }
  }
}
