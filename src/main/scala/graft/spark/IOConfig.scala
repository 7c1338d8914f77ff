package graft.spark

import java.io.InputStream

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

import graft.core.{FileIO, LocalFileIO}

/** File IO configuration (parity with `io/io.go:199-297`): the reference
  * reads S3 settings (region, credentials, endpoint, proxy) from table
  * properties and builds its own S3 client; the Spark-native equivalent maps
  * the same property keys onto `fs.s3a.*` Hadoop configuration so BOTH our
  * metadata reads (via [[HadoopFileIO]]) and Spark's executor-side parquet
  * reads see the credentials. */
object IOConfig {

  /** Iceberg table property → Hadoop conf key (io/io.go: S3_* constants). */
  val S3PropertyMap: Map[String, String] = Map(
    "s3.endpoint" -> "fs.s3a.endpoint",
    "s3.access-key-id" -> "fs.s3a.access.key",
    "s3.secret-access-key" -> "fs.s3a.secret.key",
    "s3.session-token" -> "fs.s3a.session.token",
    "s3.region" -> "fs.s3a.endpoint.region",
    "client.region" -> "fs.s3a.endpoint.region",
    "s3.proxy-uri" -> "fs.s3a.proxy.host",
    "s3.path-style-access" -> "fs.s3a.path.style.access",
    "s3.connect-timeout" -> "fs.s3a.connection.establish.timeout")

  /** Translate table properties into Hadoop conf entries. */
  def hadoopConf(tableProps: Map[String, String]): Map[String, String] =
    tableProps.flatMap { case (k, v) => S3PropertyMap.get(k).map(_ -> v) }

  /** Apply a table's IO properties to a SparkSession (driver + executors:
    * `spark.hadoop.*` runtime settings). */
  def apply(spark: SparkSession, tableProps: Map[String, String]): Unit =
    hadoopConf(tableProps).foreach { case (k, v) =>
      spark.sparkContext.hadoopConfiguration.set(k, v)
    }

  /** Scheme-dispatched FileIO (io/io.go:275-297): local paths stay on the
    * fast path; tables vended REMOTE SIGNING (no storage keys — the
    * catalog signs each request instead) route s3/http(s) paths through
    * [[graft.catalog.SignedHttpIO]]; any other scheme goes through the
    * Hadoop FileSystem API so s3a/gs/abfs work wherever the connectors are
    * on the classpath. The decision is derived purely from the property
    * STRINGS, so executor-side planners rebuilding FileIO from broadcast
    * ioProps sign their own reads. */
  def fileIO(tableProps: Map[String, String]): FileIO = new FileIO {
    private lazy val conf: Configuration = {
      val c = new Configuration()
      hadoopConf(tableProps).foreach { case (k, v) => c.set(k, v) }
      c
    }
    private val signing = graft.catalog.SignedHttpIO.shouldSign(tableProps)
    def open(path: String): InputStream = {
      val scheme = java.net.URI.create(path).getScheme
      if (scheme == null || scheme == "file") LocalFileIO.open(path)
      else if (signing &&
          (scheme == "http" || scheme == "https" || scheme == "s3"))
        graft.catalog.SignedHttpIO.open(path, tableProps)
      else {
        val p = new Path(path)
        FileSystem.get(p.toUri, conf).open(p)
      }
    }
  }
}
