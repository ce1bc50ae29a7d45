package graft
object TmpProbe extends App {
  val spark = GraftSession(cpus = 4)
  functions.GraftFunctions.register(spark)
  val g = GraftSql(spark, java.nio.file.Files.createTempDirectory("tp").toString)
  g.execute("select CURRENT_TIME(3) a, CURRENT_TIME() b").show(false)
}
