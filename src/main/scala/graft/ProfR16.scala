package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Round-16 optimization scratch profiler: per-stage wall/task attribution
  * for named declared queries. `runMain graft.ProfR16 <sfDir> <name,...>`.
  * Prints, per query run (2nd run, after a warm run): each stage's task
  * count, wall span, summed executor run time, and shuffle bytes — the
  * local stand-in for the Spark UI's stage table (guide §1/§7).
  */
object ProfR16 {
  final case class StageRow(id: Int, name: String, nTasks: Int,
      submitted: Long, completed: Long, runTimeMs: Long,
      shufRead: Long, shufWrite: Long, input: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args(1).split(",").toSeq else Seq("agg_pricing_summary")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("PROF_OPEN_COST", "4194304"))
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("PROF_MAX_PART", "134217728"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try SparkEntry.prepareFixtures(spark, sfDir) catch { case _: Throwable => () }
    graft.core.Tables.all.foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }

    val stages = mutable.Map[Int, StageRow]()
    val taskAgg = mutable.Map[Int, (Long, Long, Long, Long, Int)]() // runTime, sr, sw, input, n
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = synchronized {
        val m = te.taskMetrics
        if (m != null) {
          val (rt, sr, sw, in, n) = taskAgg.getOrElse(te.stageId, (0L, 0L, 0L, 0L, 0))
          taskAgg(te.stageId) = (rt + m.executorRunTime,
            sr + m.shuffleReadMetrics.totalBytesRead,
            sw + m.shuffleWriteMetrics.bytesWritten,
            in + m.inputMetrics.bytesRead, n + 1)
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = synchronized {
        val si = sc.stageInfo
        val (rt, sr, sw, in, n) = taskAgg.getOrElse(si.stageId, (0L, 0L, 0L, 0L, 0))
        stages(si.stageId) = StageRow(si.stageId, si.name.take(60), n,
          si.submissionTime.getOrElse(0L), si.completionTime.getOrElse(0L),
          rt, sr, sw, in)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm run (uncounted)
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"WARM FAIL $name: $e") }
      var wall = Double.MaxValue
      for (_ <- 1 to 3) {
        stages.synchronized { stages.clear(); taskAgg.clear() }
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => println(s"RUN FAIL $name: $e") }
        wall = math.min(wall, (System.nanoTime() - t0) / 1e9)
      }
      Thread.sleep(500) // let the listener bus drain
      println(f"QUERY $name wall=$wall%.3f s  stages=${stages.size}")
      stages.values.toSeq.sortBy(_.submitted).foreach { r =>
        val span = (r.completed - r.submitted) / 1e3
        println(f"  stage ${r.id}%4d tasks=${r.nTasks}%3d span=$span%7.3f s run=${r.runTimeMs / 1e3}%7.3f s " +
          f"in=${r.input / 1e6}%8.2f MB sr=${r.shufRead / 1e6}%7.2f MB sw=${r.shufWrite / 1e6}%7.2f MB  ${r.name}")
      }
      try {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      } catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
