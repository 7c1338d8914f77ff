import org.apache.spark.sql.SparkSession
object VTest {
  def main(args: Array[String]): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("vwtest4").toFile.getPath
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.extensions", "graft.spark.GraftSparkExtensions")
      .config("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
      .config("spark.sql.catalog.graft.warehouse", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sql <- Seq(
        "ALTER VIEW graft.vdb.v3 SET TBLPROPERTIES ('k'='v')",
        "ALTER VIEW graft.vdb.v3 UNSET TBLPROPERTIES ('k')",
        "ALTER VIEW graft.vdb.v3 RENAME TO graft.vdb.v4")) {
      val p = spark.sessionState.sqlParser.parsePlan(sql)
      println(sql + "\n  -> " + p.getClass.getName + " :: " +
        p.children.map(_.getClass.getName).mkString(",") + " :: " + p.toString.linesIterator.next)
    }
    spark.stop()
  }
}
