package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic scale-up of the test corpus: tile a source scale factor N×
  * with disjoint key ranges so every join relationship, modular predicate,
  * and date range is preserved while table sizes grow linearly.
  *
  *   sbt "runMain graft.tools.GenScale <srcDir> <outDir> <factor>"
  *
  * Key remapping adds `replica * KeyStride` to every primary and foreign
  * key (dimension keys with closed small domains — region, nation — are
  * copied once and left stable so FK references stay valid). Document text
  * gets a per-replica suffix so the near-dup structure scales instead of
  * becoming a 90%-duplicate corpus; embedding ids stay clear of the
  * out-of-corpus query range (1000001+) by the stride construction. */
object GenScale {

  /** Replica key offset — far above any base key and far below overflow at
    * any plausible factor; also keeps 1000001+ (the ann14 out-of-corpus
    * qids) outside every replica's id range. */
  val KeyStride = 10000000L

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, factorS) = args
    val factor = factorS.toInt
    require(factor >= 1, "factor must be >= 1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, srcDir, outDir, factor)
    spark.stop()
  }

  def generate(spark: SparkSession, srcDir: String, outDir: String,
               factor: Int): Unit = {
    new java.io.File(outDir).mkdirs()
    def src(name: String): DataFrame =
      if (name == "events") graft.tables.Tables.events(spark, srcDir)
      else spark.read.parquet(s"$srcDir/$name.parquet")
    // single FILE per table (matching the driver's testdata layout, which
    // both Tables.load and the DuckDB oracle expect): write via a temp dir,
    // then move the one part file into place
    def write(name: String, df: DataFrame): Unit = {
      val tmp = new java.io.File(outDir, s".tmp_$name")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
      val part = Option(tmp.listFiles()).getOrElse(Array.empty)
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file written for $name"))
      val dest = new java.io.File(outDir, s"$name.parquet")
      if (dest.exists()) dest.delete()
      java.nio.file.Files.move(part.toPath, dest.toPath)
      Option(tmp.listFiles()).foreach(_.foreach(_.delete()))
      tmp.delete()
      ()
    }

    // closed-domain dimensions: copy once, keys stable
    Seq("region", "nation").foreach(n => write(n, src(n)))

    /** Union `factor` replicas of `df`, shifting `keys` by the stride. */
    def tiled(df: DataFrame, keys: Seq[String])
             (perReplica: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until factor).map { i =>
        val shifted = keys.foldLeft(df)((d, k) =>
          d.withColumn(k, col(k) + lit(i * KeyStride)))
        perReplica(shifted, i)
      }.reduce(_.unionAll(_))

    write("customer", tiled(src("customer"), Seq("c_custkey"))())
    write("supplier", tiled(src("supplier"), Seq("s_suppkey"))())
    write("part", tiled(src("part"), Seq("p_partkey"))())
    write("orders", tiled(src("orders"), Seq("o_orderkey", "o_custkey"))())
    write("lineitem", tiled(src("lineitem"),
      Seq("l_orderkey", "l_partkey", "l_suppkey"))())
    write("events", tiled(src("events"), Seq("event_id", "user_id"))())
    // replica marker keeps exact-dup rates realistic while preserving the
    // shingle structure near-dup operators key on
    write("documents", tiled(src("documents"), Seq("doc_id")) { (d, i) =>
      if (i == 0) d
      else d.withColumn("text", concat(col("text"), lit(s" r$i")))
        .withColumn("n_chars", length(col("text")).cast("long"))
    })
    write("embeddings", tiled(src("embeddings"), Seq("vec_id"))())
  }
}
