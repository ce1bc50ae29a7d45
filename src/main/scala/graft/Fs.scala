package graft

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Directory listing helpers that CLOSE the underlying stream.
  * `Files.list`/`Files.walk` keep a directory fd open until closed;
  * the round-9 179-suite slt run leaked thousands of `_graft_log` dir
  * handles through the snapshot-log listing (one per `versions` call)
  * and hit EMFILE at ulimit 20000.
  */
object Fs {
  def list(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try s.iterator().asScala.toSeq finally s.close()
  }
  def walk(dir: Path): Seq[Path] = {
    val s = Files.walk(dir)
    try s.iterator().asScala.toSeq finally s.close()
  }
}
