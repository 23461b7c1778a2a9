package graft

import org.apache.spark.sql.execution.ExplainMode
import graft.queries.Registry

/** Per-query formatted-plan dump for the optimization-round evidence
  * files (`plans/<round>/<query>_{before,after}.txt`): writes ONE file
  * per named query containing `.explain("formatted")`, so plan-shape
  * claims (Exchange count, join strategy, PushedFilters) are checkable
  * without running Spark. Unlike [[Plans]] (the curated PLANS.md audit)
  * this takes the query list and output dir from the command line:
  *
  *   sbt "runMain graft.PlanDump <sfDir> <outDir> <suffix> q1,q2,..."
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    java.nio.file.Files.createDirectories(outDir)
    // Same convention as Plans: size-based auto-broadcast off, so the
    // dump shows the at-scale join strategy (only explicit broadcast()
    // hints survive).
    val spark = graft.engine.Graft.session("graft-plandump", defaultCpus = "4",
      extraConf = Map("spark.sql.autoBroadcastJoinThreshold" -> "-1"))
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val q = Registry.all.find(_.name == name).getOrElse(
        sys.error(s"unknown query: $name"))
      val plan = q.run(spark, sfDir).queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        outDir.resolve(s"${name}_$suffix.txt"), plan)
      println(s"[plandump] wrote ${name}_$suffix.txt")
    }
    spark.stop()
  }
}
