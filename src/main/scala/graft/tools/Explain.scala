package graft.tools

import graft.SparkEntry

/** Dev tool: print the formatted physical plan and wall time of one (or all)
  * registered queries. Usage:
  *
  *   sbt "runMain graft.tools.Explain <sfDir> [queryName ...]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    if (args.contains("--entry")) {
      val n = SparkEntry.entry(spark).count()
      println(s"ENTRY_ROWS=$n")
      spark.stop(); return
    }
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"===== $name =====")
      df.explain("formatted")
      val t0 = System.nanoTime()
      val n = df.count()
      val t1 = System.nanoTime()
      val n2 = df.count()
      val t2 = System.nanoTime()
      println(f"$name: rows=$n cold=${(t1 - t0) / 1e9}%.2fs warm=${(t2 - t1) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
