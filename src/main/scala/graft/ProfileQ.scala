package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Optimization-round profiling harness (guide §1): run ONE declared query
  * exactly the way Bench times it (`.count()`), with a listener recording
  * every Spark job's wall time, task count and shuffle bytes, so the
  * within-query cost breakdown (which DML/commit/stream phase dominates)
  * is measurable instead of guessed. Dev tool only — not part of the
  * driver contract and never invoked by Bench/Verify.
  *
  * Usage: ProfileQ <queryName> [sfDir] [reps]
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    // experiment hook: SPARK_GRAFT_EXTRA_CONFS="k=v;k=v" (dev only)
    sys.env.get("SPARK_GRAFT_EXTRA_CONFS").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class JobRec(id: Int, desc: String, start: Long,
                      var end: Long = 0L, var tasks: Int = 0,
                      var shufRead: Long = 0L, var shufWrite: Long = 0L,
                      var input: Long = 0L, var cpuMs: Long = 0L)
    val jobs = mutable.LinkedHashMap[Int, JobRec]()
    val stageToJob = mutable.HashMap[Int, Int]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        // first graft frame in any stage's call-site details = which
        // machinery phase submitted this job
        val graftFrame = e.stageInfos.iterator
          .flatMap(_.details.split('\n'))
          .find(l => l.contains("graft.") && !l.contains("ProfileQ"))
          .map(_.trim.stripPrefix("at ").takeWhile(_ != '(')).getOrElse("")
        val execId = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
          .getOrElse("-")
        val desc = (s"ex$execId " + Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .filter(_.nonEmpty).map(d => s"$d | $graftFrame")
          .getOrElse(graftFrame)).trim
        jobs(e.jobId) = JobRec(e.jobId, desc, e.time)
        e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = jobs.synchronized {
        val si = e.stageInfo
        stageToJob.get(si.stageId).flatMap(jobs.get).foreach { j =>
          j.tasks += si.numTasks
          j.shufRead += si.taskMetrics.shuffleReadMetrics.totalBytesRead
          j.shufWrite += si.taskMetrics.shuffleWriteMetrics.bytesWritten
          j.input += si.taskMetrics.inputMetrics.bytesRead
          j.cpuMs += si.taskMetrics.executorCpuTime / 1000000L
        }
      }
    }

    val fn = SparkEntry.queries(name)
    // warmup tables like Bench does
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .foreach(t => Tables.table(spark, sfDir, t).count())
    // one untimed warm pass so JIT/codegen caches are hot, as in a sweep
    try fn(spark, sfDir).count() catch { case e: Throwable =>
      System.err.println(s"warm pass failed: ${e.getMessage}") }

    spark.sparkContext.addSparkListener(listener)
    // Driver-side wall sampler: every 10 ms grab the MAIN thread's stack;
    // the aggregate attributes driver gaps (planning, commit FS ops,
    // footer reads, collects) that job metrics can't see.
    val mainThread = Thread.currentThread()
    val samples = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          val st = mainThread.getStackTrace
          // the deepest "interesting" frame: first graft/parquet/hadoop/
          // catalyst frame from the top, else the very top frame
          val hot = st.find { f =>
            val c = f.getClassName
            c.startsWith("graft.") || c.contains("parquet") ||
            c.contains("hadoop") || c.contains("catalyst") ||
            c.contains("execution")
          }.orElse(st.headOption)
          hot.foreach { f =>
            val k = s"${f.getClassName.split('.').takeRight(2).mkString(".")}.${f.getMethodName}"
            samples.merge(k, 1, (a, b) => a + b)
          }
        }
        Thread.sleep(10)
      }
    })
    sampler.setDaemon(true); sampler.start()
    // in-JVM A/B: SPARK_GRAFT_AB_CONF=<runtime conf key> alternates the
    // conf between "false" (odd reps) and "true" (even reps) so the two
    // variants share one warm JVM and one machine window
    // "key" alternates true/false; "key=v1|v2" alternates v1 (odd reps)
    // and v2 (even reps)
    val abConf = sys.env.get("SPARK_GRAFT_AB_CONF")
    (1 to reps).foreach { r =>
      abConf.foreach { spec =>
        val (k, v) = spec.split("=", 2) match {
          case Array(k0, vs) if vs.contains("|") =>
            val Array(v1, v2) = vs.split("\\|", 2); (k0, if (r % 2 == 1) v1 else v2)
          case Array(k0) => (k0, (r % 2 == 0).toString)
          case Array(k0, v0) => (k0, v0)
        }
        spark.conf.set(k, v)
        println(s"[ab] $k=$v")
      }
      jobs.synchronized { jobs.clear(); stageToJob.clear() }
      samples.clear(); sampling = true
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      sampling = false
      // let listener events drain
      Thread.sleep(300)
      val snap = jobs.synchronized { jobs.values.toSeq }
      val jobSum = snap.map(j => (j.end - j.start) / 1e3).sum
      // driver-side gaps: wall intervals where NO job is running (plan,
      // commit FS ops, footer reads, collects of previous results...)
      val intervals = snap.filter(_.end > 0).map(j => (j.start, j.end)).sortBy(_._1)
      val gaps = mutable.ArrayBuffer[(Long, Long, Int)]() // start, len, afterJob
      var cursor = intervals.headOption.map(_._1).getOrElse(0L)
      intervals.zipWithIndex.foreach { case ((s0, e0), i) =>
        if (s0 > cursor && i > 0) gaps += ((cursor, s0 - cursor, i))
        cursor = math.max(cursor, e0)
      }
      val gapSum = gaps.map(_._2).sum / 1e3
      println(f"%n=== $name rep $r: wall $wall%.3f s, ${snap.size} jobs, job-time sum $jobSum%.3f s, driver-gap sum $gapSum%.3f s ===")
      println("largest driver gaps (ms): " + gaps.sortBy(-_._2).take(12)
        .map { case (_, len, i) => s"${len}ms@j$i" }.mkString(", "))
      import scala.jdk.CollectionConverters._
      val hot = samples.asScala.toSeq.sortBy(-_._2).take(25)
      println("main-thread samples (10ms each): " + hot.map { case (k, n) =>
        s"$k=$n" }.mkString(", "))
      println(f"${"job"}%4s ${"gapB"}%6s ${"sec"}%8s ${"tasks"}%6s ${"input"}%10s ${"shufR"}%10s ${"shufW"}%10s ${"cpuMs"}%8s  desc")
      val byStart = snap.sortBy(_.start)
      byStart.zipWithIndex.foreach { case (j, i) =>
        val gapB = if (i == 0) 0L
          else math.max(0L, j.start - byStart.take(i).map(_.end).max)
        println(f"${j.id}%4d ${gapB}%6d ${(j.end - j.start) / 1e3}%8.3f ${j.tasks}%6d ${j.input}%10d ${j.shufRead}%10d ${j.shufWrite}%10d ${j.cpuMs}%8d  ${j.desc.take(90)}")
      }
    }
    spark.stop()
  }
}
