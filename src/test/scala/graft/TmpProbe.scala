package graft
import org.apache.spark.sql.SparkSession
object TmpProbe extends App {
  val spark = GraftSession(cpus = 4)
  functions.GraftFunctions.register(spark)
  spark.sql("select to_date(18869) d, to_timestamp(1630833797123) t").explain(true)
}
