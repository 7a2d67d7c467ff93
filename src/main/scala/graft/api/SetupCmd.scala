package graft.api

import java.io.{File, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.zip.{ZipEntry, ZipOutputStream}
import java.util.regex.Pattern

import org.apache.spark.SparkFiles
import org.apache.spark.sql.SparkSession

/** The `--setup` command surface — mrjob's parse-and-stage pipeline for
  * task working directories (mrjob/setup.py:56-185 `parse_setup_cmd`,
  * :239-282 `name_uniquely`, :350-447 `WorkingDirManager`;
  * mrjob/bin.py:545-650 `_setup_wrapper_script_content`), re-expressed
  * for Spark's execution model.
  *
  * A setup command is a shell command that may embed Hadoop
  * DistributedCache-style "hash paths": `path#name` uploads a file,
  * `path#name/` uploads an archive to be unpacked into dir `name`,
  * `path/#name` tarballs a local DIRECTORY and unpacks it remotely.
  * `path` may be followed by `:`/`=`-separated script text
  * (`export PYTHONPATH=$PYTHONPATH:foo.egg#` works), quoting and
  * backslash escapes follow the reference tokenizer exactly.
  *
  * Execution-model mapping (the Spark-first part):
  *  - mrjob wraps every task binary in a Bourne script that takes a
  *    machine-wide flock, runs the setup commands in the task working
  *    dir with stdout redirected to stderr, then execs the task
  *    (bin.py:601-650). Spark tasks are threads in a long-lived
  *    executor JVM, so the analog is ONCE PER EXECUTOR: [[StagedSetup
  *    .ensure]] memoizes per (JVM, jobKey), takes the same
  *    machine-wide file lock (two executors on one node can't race a
  *    shared `make`), materializes the mrjob working-dir layout by
  *    symlinking each staged file/unpacked archive under its assigned
  *    name, and runs the commands via `sh -c` with `__GRAFT_PWD`
  *    exported (mrjob's `$__mrjob_PWD`), cwd = that dir, stdout
  *    routed to stderr (reference Issue #803: setup output must not
  *    corrupt task output).
  *  - files ride `SparkContext.addFile`, archives/dirs
  *    `SparkContext.addArchive` — torrent distribution instead of
  *    10⁵ tasks re-reading a shared store, which is the whole point
  *    at cluster scale; the setup commands themselves run
  *    O(executors) times, not O(tasks).
  */
object SetupCmd {

  /** One parsed token: either literal script text, or a hash path
    * (`tpe` ∈ file | archive | dir) with its optionally-assigned
    * working-dir name. After [[stage]], `assigned` holds the final
    * unique working-dir name and `shipped` the basename registered
    * with SparkFiles. */
  sealed trait Token extends Serializable
  final case class Raw(s: String) extends Token
  final case class HashPath(path: String, name: Option[String], tpe: String,
      assigned: String = "", shipped: String = "") extends Token

  // parse_setup_cmd's tokenizer (mrjob/setup.py:57-71), one alternation
  // tried in order at each position. Group names camel-cased for Java.
  private val TOKEN_RE: Pattern = Pattern.compile(
    "(?<singleQuoted>'[^']*')|" +
      "(?<doubleQuoted>\"([^\"\\\\]|\\\\.)*\")|" +
      "(?<hashPath>" +
        "(?<path>([A-Za-z][A-Za-z0-9.-]*://([^'\"\\s\\\\]|\\\\.)+)|" +
          "([^'\":=\\s\\\\]|\\\\.)*([^'\":=\\s\\\\/]|\\\\.))" +
        "(?<pathSlash>/)?" +
        "#(?<name>([^'\":;><|=/#\\s\\\\]|\\\\.)*)" +
        "(?<nameSlash>/)?)|" +
      "(?<unquoted>([^'\":=\\s\\\\]|\\\\.)+)|" +
      "(?<colonOrEquals>[:=])|" +
      "(?<whitespace>\\s+)|" +
      "(?<error>.+)")

  private val ESCAPE_RE: Pattern =
    Pattern.compile("\\\\(?<escaped>.)|(?<unescaped>[^\\\\]+)|(?<err>.+)")

  /** Parse one setup command into raw-script and hash-path tokens —
    * the port of parse_setup_cmd (mrjob/setup.py:76-163): hash paths
    * are only recognized outside quotes; `:`/`=` end a plain path (so
    * PATH-style appends work) but not a `scheme://` URI; a trailing
    * slash on the PATH marks a directory, on the NAME an archive, and
    * the slash is kept in the rendered command either way. */
  def parse(cmd: String): List[Token] = {
    val out = scala.collection.mutable.ListBuffer.empty[Token]
    def addRaw(s: String): Unit = out.lastOption match {
      case Some(Raw(prev)) => out.update(out.size - 1, Raw(prev + s))
      case _ => out += Raw(s)
    }
    val m = TOKEN_RE.matcher(cmd)
    while (m.find()) {
      val keep = Seq("singleQuoted", "doubleQuoted", "unquoted",
        "whitespace", "colonOrEquals").flatMap(g => Option(m.group(g)))
      if (keep.nonEmpty) addRaw(keep.head)
      else if (m.group("hashPath") != null) {
        val tpe =
          if (m.group("pathSlash") != null) "dir"
          else if (m.group("nameSlash") != null) "archive"
          else "file"
        val name = Option(m.group("name")).filter(_.nonEmpty)
        out += HashPath(resolvePath(m.group("path")), name, tpe)
        if (m.group("pathSlash") != null || m.group("nameSlash") != null)
          addRaw("/")
      } else if (m.group("error") != null) {
        // same error strings as the reference (which mirrors shlex)
        if (m.group("error").startsWith("\\"))
          throw new IllegalArgumentException("No escaped character")
        else throw new IllegalArgumentException("No closing quotation")
      }
    }
    out.toList
  }

  /** `_resolve_path` (mrjob/setup.py:165-180): unescape backslashes;
    * expand `~` and `$VAR`/`${VAR}` in the UNESCAPED spans only (a
    * backslash stops expansion). Unset vars are left as-is, matching
    * os.path.expandvars. */
  private[api] def resolvePath(path: String): String = {
    val sb = new StringBuilder
    val m = ESCAPE_RE.matcher(path)
    while (m.find()) {
      if (m.group("escaped") != null) sb.append(m.group("escaped"))
      else if (m.group("unescaped") != null)
        sb.append(expandPath(m.group("unescaped")))
      else throw new IllegalArgumentException("No escaped character")
    }
    sb.toString
  }

  private def expandPath(s: String): String = {
    val home = System.getProperty("user.home", "~")
    val tilded =
      if (s == "~") home
      else if (s.startsWith("~/")) home + s.substring(1)
      else s
    val varRe = "\\$(\\{([A-Za-z_][A-Za-z0-9_]*)\\}|([A-Za-z_][A-Za-z0-9_]*))".r
    varRe.replaceAllIn(tilded, mm => {
      val v = Option(mm.group(2)).getOrElse(mm.group(3))
      java.util.regex.Matcher.quoteReplacement(
        sys.env.getOrElse(v, mm.matched))
    })
  }

  /** `name_uniquely` (mrjob/setup.py:239-282): propose the basename
    * (or the caller's name); on collision insert `-1`, `-2`, … before
    * the file extension. */
  def nameUniquely(path: String, namesTaken: Set[String],
      proposedName: Option[String] = None): String = {
    val filename = proposedName.getOrElse(
      new File(path.reverse.dropWhile(_ == '/').reverse).getName)
    // file_ext (mrjob/util.py:67-84): everything from the FIRST dot
    // after any leading dots — `foo.tar.gz` keeps `.tar.gz` intact
    val lead = filename.takeWhile(_ == '.')
    val rest = filename.substring(lead.length)
    val dot = rest.indexOf('.')
    val (prefix, ext) =
      if (dot == -1) (filename, "")
      else (lead + rest.substring(0, dot), rest.substring(dot))
    if (prefix.nonEmpty && !namesTaken.contains(filename)) filename
    else Iterator.from(1).map { i =>
      if (prefix.nonEmpty) s"$prefix-$i$ext" else s"$i$ext"
    }.find(!namesTaken.contains(_)).get
  }

  /** WorkingDirManager (mrjob/setup.py:350-447): tracks assigned and
    * auto names; a name may map to exactly one (type, path) —
    * re-adding the same mapping is a no-op, a different one is the
    * reference's ValueError. A path may carry several names, or be
    * added as both file and archive. */
  final class WorkingDirNames {
    private val nameTo = scala.collection.mutable.Map.empty[String, (String, String)]
    private val autoName = scala.collection.mutable.Map.empty[(String, String), String]

    def add(tpe: String, path: String, name: Option[String]): Unit = {
      require(Seq("archive", "file").contains(tpe), s"bad path type $tpe")
      name match {
        case Some(n) => nameTo.get(n) match {
          case Some(cur) if cur == (tpe, path) => ()
          case Some((ct, cp)) => throw new IllegalArgumentException(
            s"$tpe $path#$n won't work because we already have $ct $cp#$n")
          case None => nameTo(n) = (tpe, path)
        }
        case None => autoName.getOrElseUpdate((tpe, path), null)
      }
    }

    def name(tpe: String, path: String, name: Option[String]): String =
      name match {
        case Some(n) => n
        case None =>
          val cur = autoName.getOrElse((tpe, path),
            throw new IllegalArgumentException(s"unknown $tpe path $path"))
          if (cur != null) cur
          else {
            val n = nameUniquely(path, nameTo.keySet.toSet)
            nameTo(n) = (tpe, path)
            autoName((tpe, path)) = n
            n
          }
      }
  }

  /** Parse + stage a list of setup commands: every referenced file is
    * registered with addFile, every archive (and every tarballed
    * directory) with addArchive, under a SHIPPED basename derived from
    * its unique working-dir name so Spark-side basenames can't
    * collide either. Driver-side, once per job. */
  def stage(spark: SparkSession, cmds: Seq[String],
      jobKey: String): StagedSetup = {
    val parsed = cmds.map(parse)
    val names = new WorkingDirNames
    // two passes, like the reference runner: first register every path
    // (collision checks see all assigned names), then assign auto names
    parsed.foreach(_.foreach {
      case hp: HashPath =>
        names.add(if (hp.tpe == "file") "file" else "archive", hp.path, hp.name)
      case _ => ()
    })
    val staging = Files.createTempDirectory("graft-setup-stage").toFile
    staging.deleteOnExit()
    val shippedFor = scala.collection.mutable.Map.empty[(String, String), String]
    val rendered = parsed.map(_.map {
      case hp: HashPath =>
        val effTpe = if (hp.tpe == "file") "file" else "archive"
        val assigned = names.name(effTpe, hp.path, hp.name)
        val shipped = shippedFor.getOrElseUpdate((effTpe, assigned), {
          val src = new File(hp.path)
          require(src.exists, s"setup path does not exist: ${hp.path}")
          // SparkContext refuses a second addFile under an existing
          // basename with a different path, so shipped names carry the
          // jobKey — assigned names stay job-scoped via the symlink
          // layout in runOnce
          hp.tpe match {
            case "file" =>
              val dst = new File(staging, s"$jobKey-$assigned")
              Files.copy(src.toPath, dst.toPath,
                StandardCopyOption.REPLACE_EXISTING)
              spark.sparkContext.addFile(dst.getAbsolutePath)
              dst.getName
            case "archive" =>
              val ext = {
                val n = src.getName
                val i = n.indexOf('.')
                if (i >= 0) n.substring(i) else ".zip"
              }
              val dst = new File(staging, s"$jobKey-$assigned$ext")
              Files.copy(src.toPath, dst.toPath,
                StandardCopyOption.REPLACE_EXISTING)
              spark.sparkContext.addArchive(dst.getAbsolutePath)
              dst.getName
            case "dir" =>
              // mrjob tarballs the directory (runner.py archives dirs
              // before upload); zip is Spark's most portable unpacker
              val dst = new File(staging, s"$jobKey-$assigned.zip")
              zipDir(src.toPath, dst)
              spark.sparkContext.addArchive(dst.getAbsolutePath)
              dst.getName
          }
        })
        hp.copy(assigned = assigned, shipped = shipped)
      case t => t
    })
    StagedSetup(rendered, jobKey)
  }

  private def zipDir(dir: Path, out: File): Unit = {
    val zos = new ZipOutputStream(new FileOutputStream(out))
    try {
      val base = dir.toAbsolutePath
      val stream = Files.walk(base)
      try {
        stream.filter(Files.isRegularFile(_)).forEach { p =>
          zos.putNextEntry(new ZipEntry(base.relativize(p).toString))
          Files.copy(p, zos)
          zos.closeEntry()
        }
      } finally stream.close()
    } finally zos.close()
  }

  // once-per-JVM memo, keyed by jobKey (executor side). Concurrent
  // tasks serialize on a per-key monitor so none proceeds before the
  // setup has COMPLETED; a failure is not memoized — a retried task
  // re-attempts, exactly like mrjob's re-run wrapper script.
  private val inFlight =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private val done =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private[api] def runOnce(staged: StagedSetup): Unit = {
    if (done.contains(staged.jobKey)) return
    val monitor = inFlight.computeIfAbsent(staged.jobKey, _ => new Object)
    monitor.synchronized {
      if (!done.contains(staged.jobKey)) {
        doRun(staged)
        done.add(staged.jobKey)
      }
    }
  }

  private def doRun(staged: StagedSetup): Unit = {
    // machine-wide exclusive lock, the flock analog (bin.py:611-621):
    // two executor JVMs on one node must not race a shared setup
    val lockFile = new File(System.getProperty("java.io.tmpdir"),
      s"graft-setup-${staged.jobKey}.lock")
    val ch = new FileOutputStream(lockFile).getChannel
    val lock = ch.lock()
    try {
      val workDir = Files.createTempDirectory(
        s"graft-setup-${staged.jobKey}").toFile
      // mrjob working-dir layout: each staged artifact appears under
      // its assigned name (Hadoop symlinks the distributed cache the
      // same way)
      staged.cmds.flatten.collect { case hp: HashPath => hp }
        .distinctBy(_.assigned).foreach { hp =>
          val target = Paths.get(SparkFiles.get(hp.shipped))
          val link = new File(workDir, hp.assigned).toPath
          if (!Files.exists(link)) Files.createSymbolicLink(link, target)
        }
      staged.cmds.foreach { tokens =>
        val cmdLine = tokens.map {
          case Raw(s) => s
          case hp: HashPath => "\"$__GRAFT_PWD\"/" + shellQuote(hp.assigned)
        }.mkString
        val pb = new ProcessBuilder("/bin/sh", "-c", cmdLine)
        pb.directory(workDir)
        pb.environment().put("__GRAFT_PWD", workDir.getAbsolutePath)
        // setup output must not interleave with the job's output
        // (reference Issue #803 redirects it `0</dev/null 1>&2`,
        // bin.py:641-645); the engine's stdout additionally carries
        // Bench's machine-read JSON line, so route BOTH streams to a
        // per-workdir log instead of the JVM's channels
        pb.redirectInput(new File("/dev/null"))
        pb.redirectErrorStream(true)
        pb.redirectOutput(ProcessBuilder.Redirect.appendTo(
          new File(workDir, "__setup.log")))
        val rc = pb.start().waitFor()
        if (rc != 0) throw new IllegalStateException(
          s"setup command failed (exit $rc): $cmdLine")
      }
      StagedSetup.lastWorkDir.set(workDir.getAbsolutePath)
    } finally { lock.release(); ch.close() }
  }

  private def shellQuote(s: String): String =
    if (s.matches("[A-Za-z0-9._/-]+")) s
    else "'" + s.replace("'", "'\"'\"'") + "'"
}

/** The staged, serializable form of a job's setup commands: call
  * [[ensure]] from any task bracket (mapper_init is the natural spot)
  * — it runs the commands once per executor JVM under a machine-wide
  * lock and is a fast memo-hit afterwards. */
final case class StagedSetup(cmds: Seq[List[SetupCmd.Token]],
    jobKey: String) extends Serializable {
  def ensure(): Unit = SetupCmd.runOnce(this)

  /** Rendered command lines as they execute (working-dir names
    * substituted), for logging/inspection — the analog of mrjob's
    * generated wrapper-script body. */
  def renderedCmds: Seq[String] = cmds.map(_.map {
    case SetupCmd.Raw(s) => s
    case hp: SetupCmd.HashPath => "$__GRAFT_PWD/" + hp.assigned
  }.mkString)
}

object StagedSetup {
  /** Executor-local working dir of the most recent setup run —
    * task code that needs an artifact the setup produced resolves it
    * here (tests use it to observe effects). */
  private[api] val lastWorkDir = new java.util.concurrent.atomic.AtomicReference[String]()
  def workDir: Option[String] = Option(lastWorkDir.get())
}
