package graft.api

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Run an arbitrary jar as a pipeline step — the analog of the
  * reference's JarStep (mrjob/step.py:421-460): `jar` path, optional
  * `main_class` ("If not specified, Hadoop will use the main class in
  * the jar's manifest file" — here `java -jar` does exactly that),
  * positional `args` carrying the [[JarStep.Input]] / [[JarStep.Output]]
  * / [[JarStep.GenericArgs]] markers, and a `jobconf` map.
  *
  * Interpolation contract (mrjob/step.py:55-72, bin.py:386-402):
  *  - `<input>` → the step's input path(s), comma-joined when several;
  *  - `<output>` → the step's output path;
  *  - `<generic args>` → the jobconf rendered as Hadoop generic
  *    `-Dkey=value` args, in sorted-key order (mrjob's
  *    _hadoop_generic_args_for_step renders -D pairs; -libjars has no
  *    analog here). As in the reference, jobconf reaches the jar ONLY
  *    through this marker — args are positional to an arbitrary main,
  *    so the runner cannot know where generic args are legal.
  *
  * Execution: a child `java` process on the driver node, which is the
  * honest local analog of mrjob's hadoop runner shelling out
  * `hadoop jar ...` from the edge node (bin.py); the reference's OWN
  * sim runners (inline/local) cannot run jar steps at all, so running
  * the jar for real is a superset of the surface a migrating user had.
  * The step is driver-side by design — a jar that should fan out onto
  * the cluster is a SparkJarStep (spark-submit), which this engine IS;
  * JarStep exists for the pre/post-processing binaries a legacy
  * pipeline glues between distributed steps. Scale posture: the jar
  * sees only the file paths it is handed; keep its inputs on a shared
  * filesystem and it composes with every distributed step around it.
  */
final case class JarStep(
    jar: String,
    args: Seq[String] = Nil,
    mainClass: Option[String] = None,
    jobconf: Map[String, String] = Map.empty) {

  /** The marker-resolved argv (everything after the main-class /
    * -jar token). Exposed separately from [[JarStep.run]] so specs
    * and dry-run tooling can audit the exact command line. */
  def interpolatedArgs(inputPaths: Seq[String], outputDir: String)
      : Seq[String] =
    args.flatMap {
      case JarStep.GenericArgs =>
        jobconf.toSeq.sortBy(_._1).map { case (k, v) => s"-D$k=$v" }
      case JarStep.Input => Seq(inputPaths.mkString(","))
      case JarStep.Output => Seq(outputDir)
      case a => Seq(a)
    }
}

object JarStep {

  /** mrjob.step.INPUT (step.py:63): replaced with the step's input
    * path(s), comma-joined. */
  val Input = "<input>"

  /** mrjob.step.OUTPUT (step.py:68): replaced with the step's output
    * path. */
  val Output = "<output>"

  /** mrjob.step.GENERIC_ARGS (step.py:70-72): replaced with generic
    * hadoop args rendered from jobconf. */
  val GenericArgs = "<generic args>"

  final class JarStepFailedException(msg: String)
    extends RuntimeException(msg)

  /** Execute the step: `java -cp jar mainClass args...` (explicit
    * main) or `java -jar jar args...` (manifest main), inheriting the
    * parent JVM's `java` binary. Child stdout+stderr are merged and
    * STREAMED by the OS into `logPath` (or a temp file) — never
    * buffered on the driver heap, so a per-record-verbose jar over a
    * large input cannot OOM the driver; the runner keeps per-step
    * logs the way mrjob preserves step log dirs. stdin is /dev/null:
    * a filter-style binary that falls back to reading stdin gets
    * immediate EOF instead of hanging forever on a silent open pipe.
    * A nonzero exit throws (mirroring StepFailedException) with the
    * log TAIL in the message, instead of letting a half-written
    * output dir masquerade as success. Returns the log file path. */
  def run(step: JarStep, inputPaths: Seq[String], outputDir: String,
      logPath: Option[String] = None): String = {
    require(Files.isRegularFile(Paths.get(step.jar)),
      s"jar not found: ${step.jar}")
    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    val argv = step.mainClass match {
      case Some(mc) => Seq(javaBin, "-cp", step.jar, mc)
      case None     => Seq(javaBin, "-jar", step.jar)
    }
    val cmd = argv ++ step.interpolatedArgs(inputPaths, outputDir)
    val log = logPath.map(Paths.get(_)).getOrElse(
      Files.createTempFile("graft-jarstep-", ".log"))
    // a bare-filename logPath has a null parent — nothing to create
    Option(log.toAbsolutePath.getParent)
      .foreach(Files.createDirectories(_))
    val pb = new ProcessBuilder(cmd: _*)
      .redirectErrorStream(true)
      .redirectInput(new java.io.File("/dev/null"))
      .redirectOutput(log.toFile)
    val rc = pb.start().waitFor()
    if (rc != 0) {
      throw new JarStepFailedException(
        s"jar step failed (rc=$rc): ${cmd.mkString(" ")}\n${logTail(log)}")
    }
    log.toString
  }

  /** Last ≤20 lines of the last ≤64 KiB of the log — bounded work no
    * matter how large the child's output grew. */
  private def logTail(log: java.nio.file.Path): String = {
    val size = Files.size(log)
    val from = math.max(0L, size - 65536L)
    val ch = Files.newByteChannel(log)
    try {
      ch.position(from)
      val buf = java.nio.ByteBuffer.allocate((size - from).toInt)
      while (buf.hasRemaining && ch.read(buf) >= 0) {}
      new String(buf.array(), 0, buf.position(), StandardCharsets.UTF_8)
        .linesIterator.toSeq.takeRight(20).mkString("\n")
    } finally ch.close()
  }
}
