package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import scala.collection.mutable.ArrayBuffer

/** S5 — the reference's HDFS utility surface (reference
  * BasicOperation.java:23-52: listFiles / create+writeBytes /
  * open+BufferedReader) on the Hadoop FileSystem API, scheme-agnostic
  * (file://, hdfs://, s3a:// — whatever the Configuration resolves).
  */
object FsUtil {

  private def fs(path: String, conf: Configuration): FileSystem =
    new Path(path).getFileSystem(conf)

  /** Recursive file listing (the reference's listFiles(dir, true) loop). */
  def ls(dir: String, conf: Configuration = new Configuration()): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    val it = fs(dir, conf).listFiles(new Path(dir), true)
    while (it.hasNext) out += it.next().getPath.toString
    out.toSeq
  }

  /** Create-or-overwrite a small text file (BasicOperation.java:32-41). */
  def writeString(path: String, content: String,
                  conf: Configuration = new Configuration()): Unit = {
    val os = fs(path, conf).create(new Path(path), true)
    try os.write(content.getBytes("UTF-8")) finally os.close()
  }

  /** Read a small text file fully (BasicOperation.java:43-52). Bounded
    * use only — datasets go through spark.read.
    */
  def readString(path: String, conf: Configuration = new Configuration()): String = {
    val in = fs(path, conf).open(new Path(path))
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      bos.toString("UTF-8")
    } finally in.close()
  }

  /** Delete-if-exists (the reference's pre-run output cleanup,
    * UserHotcar.java:221-224 — S7's imperative face).
    */
  def deleteIfExists(path: String,
                     conf: Configuration = new Configuration()): Boolean =
    fs(path, conf).delete(new Path(path), true)
}
