package graft
object TsDbg {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession(cpus = 4, appName = "tsdbg")
    graft.functions.GraftFunctions.register(spark)
    val g = GraftSql(spark, java.nio.file.Files.createTempDirectory("tsdbg").toString)
    g.execute("set timezone='Asia/Shanghai'")
    for (fn <- Seq("to_start_of_five_minutes", "to_start_of_ten_minutes",
        "to_start_of_fifteen_minutes", "time_slot", "to_start_of_day"))
      println(fn + " -> " + Slt.formatCell(
        g.execute(s"select $fn('2024-11-14 11:54:33.667269') as v").head.get(0),
        java.time.ZoneId.of("Asia/Shanghai")))
    spark.stop()
  }
}
