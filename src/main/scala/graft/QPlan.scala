package graft
object QPlan {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val df = SparkEntry.queries(args(0))(spark, args.lift(1).getOrElse("/root/testdata/sf0.01"))
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    println("PLAN_BEGIN")
    println(s.split("== Initial Plan ==")(0).take(20000))
    println("PLAN_END")
    spark.stop()
  }
}
