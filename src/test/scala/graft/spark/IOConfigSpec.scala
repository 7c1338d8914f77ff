package graft.spark

import org.scalatest.funsuite.AnyFunSuite

class IOConfigSpec extends AnyFunSuite {

  test("s3 table properties map to fs.s3a conf") {
    val props = Map(
      "s3.endpoint" -> "http://minio:9000",
      "s3.access-key-id" -> "ak",
      "s3.secret-access-key" -> "sk",
      "s3.region" -> "us-east-1",
      "write.parquet.compression-codec" -> "zstd") // non-IO prop ignored
    val conf = IOConfig.hadoopConf(props)
    assert(conf == Map(
      "fs.s3a.endpoint" -> "http://minio:9000",
      "fs.s3a.access.key" -> "ak",
      "fs.s3a.secret.key" -> "sk",
      "fs.s3a.endpoint.region" -> "us-east-1"))
  }

  test("session conf application reaches hadoopConfiguration") {
    val spark = SparkTestSession.spark
    IOConfig(spark, Map("s3.endpoint" -> "http://example-endpoint:9000"))
    assert(spark.sparkContext.hadoopConfiguration.get("fs.s3a.endpoint") ==
      "http://example-endpoint:9000")
  }

  test("scheme dispatch: local paths readable, unknown scheme errors lazily") {
    val io = IOConfig.fileIO(Map.empty)
    val f = java.io.File.createTempFile("iotest", ".txt")
    java.nio.file.Files.write(f.toPath, "hello".getBytes)
    val got = new String(io.open(f.getPath).readAllBytes())
    assert(got == "hello")
    val got2 = new String(io.open("file://" + f.getPath).readAllBytes())
    assert(got2 == "hello")
  }
}
