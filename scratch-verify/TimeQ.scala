object TimeQ extends App {
  val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[32]").appName("timeq")
    .config("spark.sql.shuffle.partitions", 32)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  spark.sparkContext.setLogLevel("WARN")
  val dir = "/root/testdata/sf0.1"
  for (name <- args) {
    val fn = graft.SparkEntry.queries(name)
    val t0 = System.nanoTime()
    val n = fn(spark, dir).count()
    println(f"TIMEQ $name ${(System.nanoTime() - t0) / 1e9}%.2f sec rows=$n")
    val t1 = System.nanoTime()
    val n2 = fn(spark, dir).count()
    println(f"TIMEQ $name(warm) ${(System.nanoTime() - t1) / 1e9}%.2f sec rows=$n2")
  }
  spark.stop()
}
