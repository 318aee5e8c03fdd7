package graft.sink

import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

/** K11: the reference's log sink (reference main.py:16-31) — a timestamped
  * run-log file under `<dir>/logs/` plus a stdout echo, in the reference's
  * "%(asctime)s [%(levelname)s] %(name)s: %(message)s" layout. The engine
  * itself narrates through log4j as usual; this sink is the per-RUN
  * artifact the reference produces (one file per pipeline invocation,
  * greppable after the fact). */
trait RunLog extends AutoCloseable {
  def info(msg: String): Unit
  def warn(msg: String): Unit
  def error(msg: String): Unit
  override def close(): Unit = ()
}

object RunLog {

  /** Default: no per-run file (library callers opt in). */
  object Noop extends RunLog {
    def info(msg: String): Unit = ()
    def warn(msg: String): Unit = ()
    def error(msg: String): Unit = ()
  }

  private val stampFmt = DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss")
  private val lineFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss,SSS")

  final class FileLog private[RunLog] (val path: Path, name: String,
                                       echo: Boolean) extends RunLog {
    private val writer = Files.newBufferedWriter(path,
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    private def log(level: String, msg: String): Unit = synchronized {
      val line = s"${LocalDateTime.now.format(lineFmt)} [$level] $name: $msg"
      writer.write(line); writer.newLine(); writer.flush()
      if (echo) println(line)
    }
    def info(msg: String): Unit = log("INFO", msg)
    def warn(msg: String): Unit = log("WARNING", msg)
    def error(msg: String): Unit = log("ERROR", msg)
    override def close(): Unit = writer.close()
  }

  /** Open `<dir>/logs/pipeline_<yyyyMMdd_HHmmss>.log` (dirs created),
    * mirroring the reference's layout and filename pattern. */
  def open(dir: String, name: String = "graft.pipeline",
           echo: Boolean = true): FileLog = {
    val logs = Paths.get(dir, "logs")
    Files.createDirectories(logs)
    val file = logs.resolve(s"pipeline_${LocalDateTime.now.format(stampFmt)}.log")
    new FileLog(file, name, echo)
  }
}
