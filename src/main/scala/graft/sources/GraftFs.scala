package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Filesystem service layer — the `runner.fs` facade mrjob users
  * script with around jobs (mrjob/fs/base.py:50-148: ls/cat/du/exists/
  * mkdir/put/rm/touchz/md5sum; composite dispatch across local/HDFS/
  * object stores, mrjob/fs/composite.py).
  *
  * One thin wrapper over Hadoop `FileSystem.get(URI)` — the same
  * abstraction Spark itself reads through, so every scheme the cluster
  * can scan (file://, hdfs://, s3a://, ...) works here with zero
  * engine code, which is exactly how the reference's composite
  * filesystem resolves a scheme to an implementation.
  *
  * Glob semantics: Hadoop globStatus (`hadoop fs` globbing) — the
  * reference's ls/cat/du/rm/exists all accept globs too.
  */
// NOT Serializable on purpose: the only field is a Hadoop
// Configuration, which java.io can't serialize — capturing a GraftFs
// in an executor closure should fail at compile review, not with a
// misleading runtime NotSerializableException. (Executor-side fs work
// would hold a Spark SerializableConfiguration instead.)
final class GraftFs(conf: Configuration) {

  private def fsFor(path: String): FileSystem =
    new Path(path).getFileSystem(conf)

  /** Recursively list matching FILES with their statuses — one
    * metadata pass shared by ls and du (a du built on bare paths
    * would re-fetch getFileStatus per file: N extra namenode RPCs
    * ls just performed and discarded). */
  private def lsStatus(pathGlob: String): Seq[org.apache.hadoop.fs.FileStatus] = {
    val fs = fsFor(pathGlob)
    val matches = Option(fs.globStatus(new Path(pathGlob)))
      .getOrElse(Array.empty).toSeq
    matches.flatMap { st =>
      if (st.isDirectory) {
        val it = fs.listFiles(st.getPath, true)
        val out = scala.collection.mutable.ArrayBuffer
          .empty[org.apache.hadoop.fs.FileStatus]
        while (it.hasNext) out += it.next()
        out
      } else Seq(st)
    }
  }

  /** Recursively list matching FILES (no directories — the reference
    * omits them for S3 compatibility, fs/base.py:75-83). */
  def ls(pathGlob: String): Seq[String] =
    lsStatus(pathGlob).map(_.getPath.toString)

  /** Cat all files matching the glob, concatenated in ls order
    * (fs/base.py:54-66; the reference yields b'' separators between
    * files — callers here get one byte stream per the common use). */
  def cat(pathGlob: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    ls(pathGlob).foreach { p =>
      val in = fsFor(p).open(new Path(p))
      try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
      finally in.close()
    }
    out.toByteArray
  }

  /** Cat decoded as UTF-8 lines — the typical scripting form. */
  def catLines(pathGlob: String): Seq[String] =
    new String(cat(pathGlob), java.nio.charset.StandardCharsets.UTF_8)
      .linesIterator.toSeq

  /** Total size of matching files (`hadoop fs -du`, fs/base.py:68-73). */
  def du(pathGlob: String): Long = lsStatus(pathGlob).map(_.getLen).sum

  /** Does anything match? (`hadoop fs -test -e`, fs/base.py:90-95). */
  def exists(pathGlob: String): Boolean = {
    val fs = fsFor(pathGlob)
    val matches = Option(fs.globStatus(new Path(pathGlob)))
    matches.exists(_.nonEmpty) || fs.exists(new Path(pathGlob))
  }

  /** mkdir -p (fs/base.py:111-120). */
  def mkdir(path: String): Unit = { fsFor(path).mkdirs(new Path(path)); () }

  /** Upload a local file to `path` (`hadoop fs -put`,
    * fs/base.py:122-131). */
  def put(src: String, path: String): Unit = {
    val fs = fsFor(path)
    fs.copyFromLocalFile(false, true, new Path(src), new Path(path))
  }

  /** Recursive delete, no-op when missing (`hadoop fs -rm -R`,
    * fs/base.py:133-138). */
  def rm(pathGlob: String): Unit = {
    val fs = fsFor(pathGlob)
    Option(fs.globStatus(new Path(pathGlob))).getOrElse(Array.empty)
      .foreach(st => fs.delete(st.getPath, true))
  }

  /** Create an empty file; error if a non-empty one exists
    * (`hadoop fs -touchz`, fs/base.py:140-146). */
  def touchz(path: String): Unit = {
    val fs = fsFor(path)
    val p = new Path(path)
    if (fs.exists(p) && fs.getFileStatus(p).getLen > 0)
      throw new java.io.IOException(s"non-empty file exists at $path")
    fs.create(p, true).close()
  }

  /** md5 of ONE file's bytes (fs/base.py:148), streamed in 64 KiB
    * chunks — the previous cat()-based form buffered the whole object
    * on the driver (OOM / 2 GB array cap on big files) and, because
    * cat accepts globs, would silently hash a multi-file
    * CONCATENATION: a digest matching no actual file. A glob matching
    * several files is refused instead. */
  def md5sum(path: String): String = {
    val fs = fsFor(path)
    val matches = Option(fs.globStatus(new Path(path)))
      .getOrElse(Array.empty).filter(st => st.isFile)
    require(matches.length == 1,
      s"md5sum needs exactly one file, got ${matches.length} for $path")
    val md = java.security.MessageDigest.getInstance("MD5")
    val in = fs.open(matches(0).getPath)
    try {
      val buf = new Array[Byte](65536)
      var r = in.read(buf)
      while (r >= 0) {
        if (r > 0) md.update(buf, 0, r)
        r = in.read(buf)
      }
    } finally in.close()
    md.digest().map(b => f"$b%02x").mkString
  }

  /** URI-aware path join (fs/base.py:97-109): posixpath.join
    * semantics — a later component that is absolute or carries its
    * own scheme REPLACES everything before it. */
  def join(path: String, paths: String*): String =
    paths.foldLeft(path) { (acc, p) =>
      if (p.startsWith("/") || p.contains("://")) p
      else if (acc.endsWith("/")) acc + p
      else acc + "/" + p
    }
}

object GraftFs {
  /** The facade against the active Hadoop config (inherits Spark's
    * fs.* settings when called with the session's config). */
  def apply(spark: org.apache.spark.sql.SparkSession): GraftFs =
    new GraftFs(spark.sparkContext.hadoopConfiguration)

  def local(): GraftFs = new GraftFs(new Configuration())

  /** Scheme-agnostic scratch dir for engine-managed intermediate data
    * (derived fixtures, multi-output round-trips). Resolution:
    * `spark.graft.scratch.dir` if set — any FileSystem scheme the
    * cluster reads (hdfs://, s3a://, ...) — else the JVM tmpdir, which
    * is only correct in local mode. A Spark WRITE to a bare local path
    * breaks on a real cluster (each executor writes its own machine's
    * disk), so production deployments must set the conf; queries that
    * use scratch go through here instead of java.io.tmpdir directly. */
  def scratchDir(spark: org.apache.spark.sql.SparkSession,
      name: String): String = {
    val root = spark.conf.getOption("spark.graft.scratch.dir")
      .getOrElse("file:///" + sys.props("java.io.tmpdir")
        .replace('\\', '/').stripPrefix("/"))
    root.stripSuffix("/") + "/" + name
  }

  /** Small-file compaction — the maintenance operator every
    * long-running ingest needs (a 100 TB landing zone accretes
    * millions of part files; scans then pay one task + one open per
    * file). Rewrites a parquet directory into
    * ceil(bytes / targetBytes) files, then swaps it in with two
    * renames (dir → dir_old, tmp → dir, delete dir_old), so the
    * window with no live directory is a single rename — NOT a true
    * atomic swap (HDFS has no atomic directory exchange): a crash
    * between the renames leaves dir_old intact for manual recovery,
    * and concurrent readers can still catch the gap. Returns the
    * output file count. */
  def compactParquet(spark: org.apache.spark.sql.SparkSession,
      dir: String, targetBytes: Long = 128L << 20): Int = {
    val conf0 = spark.sparkContext.hadoopConfiguration
    val dirPath = new Path(dir)
    val dirFs = dirPath.getFileSystem(conf0)
    // REFUSE hive-partitioned layouts: the flat glob below would size
    // them at 0 bytes → repartition(1) funnels the dataset through
    // one task, AND the rewrite would flatten key=value dirs into
    // data columns — the opposite of maintenance. Partitioned
    // compaction is per-partition-dir by design (call per leaf dir).
    val children = dirFs.listStatus(dirPath)
    val partitioned = children.exists(st =>
      st.isDirectory && st.getPath.getName.contains("="))
    require(!partitioned,
      s"compactParquet: $dir is hive-partitioned (key=value subdirs); " +
        "compact each leaf partition dir instead")
    val fs = apply(spark)
    val n = math.max(1, math.ceil(
      fs.du(s"$dir/*.parquet").max(fs.du(s"$dir/part-*")).toDouble /
        targetBytes).toInt)
    val tmp = dir.stripSuffix("/") + "_compact_tmp"
    spark.read.parquet(dir).repartition(n)
      .write.mode("overwrite").parquet(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(dir)
    val hfs = p.getFileSystem(conf)
    val old = new Path(dir.stripSuffix("/") + "_compact_old")
    hfs.delete(old, true)
    // rename returns FALSE on failure rather than throwing — ignoring
    // it would let the second rename move tmp INSIDE the still-present
    // dir (Hadoop rename-into-existing-directory semantics) and report
    // success over a corrupted layout
    require(hfs.rename(p, old),
      s"compactParquet: could not move $dir aside (live data untouched)")
    require(hfs.rename(new Path(tmp), p),
      s"compactParquet: could not swap in $tmp — previous data is at $old")
    hfs.delete(old, true)
    fs.ls(s"$dir/part-*").size
  }
}
