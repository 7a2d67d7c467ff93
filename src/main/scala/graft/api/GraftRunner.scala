package graft.api

import org.apache.spark.sql.SparkSession
import graft.sources.GraftFs

/** Minimal runner orchestration — the slice of mrjob's runner layer
  * that survives the move to Spark (SURVEY §2.2 scopes the rest out:
  * spark-submit + YARN/K8s replace process management, log forensics,
  * and cloud provisioning):
  *
  *  - unique job keys (`<label>.<owner>.<yyyyMMdd.HHmmss>.<micros>`,
  *    mrjob/runner.py:740-756) naming per-run output/tmp dirs;
  *  - conf loading: a java-properties file feeding [[JobArgs]] — the
  *    analog of mrjob.conf option stacking (keys prefixed `file.`
  *    become file args, everything else passthru);
  *  - cleanup modes over the job's tmp dir via [[GraftFs]]
  *    (mrjob/runner.py:617-657 CLEANUP_CHOICES, reduced to the two
  *    that still mean anything: TMP and NONE), with the
  *    `with make_runner() as runner:` lifetime expressed as a
  *    loan-pattern [[GraftRunner.withRunner]].
  */
final class GraftRunner(val spark: SparkSession, label: String,
    owner: String, baseTmp: String, cleanupMode: String) {

  val jobKey: String = GraftRunner.makeJobKey(label, owner)

  /** Per-run scratch dir, created on first use (runner.py tmp-dir
    * contract: everything under one job-key-named dir). */
  private var tmpMade = false

  lazy val tmpDir: String = {
    val d = s"$baseTmp/$jobKey"
    fs.mkdir(d)
    tmpMade = true
    d
  }

  def fs: GraftFs = GraftFs(spark)

  /** Output dir naming (runner chooses output dir from the job key
    * when none given, runner.py:744-746). */
  def defaultOutputDir: String = s"$tmpDir/output"

  /** cleanup (runner.py:617-657): "TMP" removes the job's scratch
    * space but PRESERVES `output/` — unlike mrjob nothing streams the
    * results out before cleanup, so deleting the documented default
    * output location on success would end every run with no output
    * and no error (a review catch); "ALL" removes everything
    * including output; "NONE" keeps everything for debugging.
    *
    * Deletion goes through a literal (non-glob) Hadoop delete: the
    * job key embeds caller-supplied label/owner, and handing that to
    * the glob-interpreting GraftFs.rm would turn `agg[v2]` into a
    * character class that deletes OTHER runs' dirs while leaking
    * this one (makeJobKey also sanitizes, as defense in depth). */
  def cleanup(mode: String = cleanupMode): Unit =
    // only if the scratch dir was ever materialized — referencing the
    // lazy tmpDir here would mkdir it just to rm it (two remote fs
    // calls per no-scratch run on hdfs/s3a)
    if (tmpMade) {
      val p = new org.apache.hadoop.fs.Path(tmpDir)
      val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (mode.equalsIgnoreCase("ALL")) hfs.delete(p, true)
      else if (mode.equalsIgnoreCase("TMP") && hfs.exists(p)) {
        hfs.listStatus(p).foreach { st =>
          if (st.getPath.getName != "output") hfs.delete(st.getPath, true)
        }
        // no output written ⇒ nothing to preserve — remove the job
        // dir itself (the historical TMP behavior for scratch-only
        // runs)
        if (hfs.listStatus(p).isEmpty) hfs.delete(p, true)
      }
    }
}

object GraftRunner {

  /** Job-key charset: glob/path metacharacters in label/owner are
    * mapped to '_' (mrjob's _job_key uses the same alnum-and-dots
    * shape, runner.py:740-756) — a literal `agg[v2]` label would
    * otherwise reach filesystem APIs that treat `[...]` as a
    * character class. */
  private def sanitize(s: String): String =
    s.replaceAll("[^A-Za-z0-9_.-]", "_")

  def makeJobKey(label: String, owner: String): String = {
    val now = java.time.ZonedDateTime.now(java.time.ZoneOffset.UTC)
    val stamp = now.format(
      java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd.HHmmss"))
    f"${sanitize(label)}.${sanitize(owner)}.$stamp.${now.getNano / 1000}%06d"
  }

  /** Load and STACK java-properties conf files into [[JobArgs]] with
    * mrjob.conf's combining semantics (mrjob reads a chain of conf
    * files — !include / MRJOB_CONF cascade — and combines them per
    * opt, mrjob/conf.py combine_opts): SCALAR keys take the
    * latest-file value (combine_values); `list.<name>` keys
    * CONCATENATE earlier→later (combine_lists — setup commands,
    * application args), surfaced as the comma-joined passthru
    * `<name>`; `file.<name>` entries merge as a dict with later-file
    * override per name (combine_dicts). A properties file is the
    * JVM-native stand-in for mrjob's YAML. */
  def loadConf(paths: String*): JobArgs = {
    import scala.jdk.CollectionConverters._
    var scalars = Map.empty[String, String]
    var lists = Map.empty[String, Vector[String]]
    var files = Map.empty[String, String]
    var archs = Map.empty[String, String]
    paths.foreach { path =>
      val props = new java.util.Properties()
      // Reader, not InputStream: Properties.load(InputStream) decodes
      // ISO-8859-1 by spec, mojibake-ing UTF-8 conf values
      val in = new java.io.InputStreamReader(
        new java.io.FileInputStream(path),
        java.nio.charset.StandardCharsets.UTF_8)
      try props.load(in) finally in.close()
      props.asScala.toSeq.sortBy(_._1).foreach {
        case (k, v) if k.startsWith("file.") =>
          files += k.stripPrefix("file.") -> v
        case (k, v) if k.startsWith("archive.") =>
          archs += k.stripPrefix("archive.") -> v
        case (k, v) if k.startsWith("list.") =>
          // `list.<name>.<idx>` allows several entries in ONE
          // properties file (duplicate keys are illegal there; mrjob's
          // YAML just writes a list) — entries append in sorted-key
          // order, so zero-pad indices past 9
          val name = k.stripPrefix("list.").replaceAll("\\.\\d+$", "")
          lists += name -> (lists.getOrElse(name, Vector.empty) :+ v)
        case (k, v) => scalars += k -> v
      }
    }
    JobArgs(
      passthru = scalars ++
        lists.map { case (k, v) => k -> v.mkString(",") },
      fileArgs = files,
      archives = archs,
      // verbatim list values too: the comma-joined passthru is lossy
      // for values that CONTAIN commas (setup shell commands do)
      listArgs = lists)
  }

  /** `with mr_job.make_runner() as runner:` (runner.py:621-624) —
    * cleanup runs on exit, success or failure. */
  def withRunner[T](spark: SparkSession, label: String,
      owner: String = sys.props.getOrElse("user.name", "unknown"),
      baseTmp: String = sys.props("java.io.tmpdir"),
      cleanupMode: String = "TMP")(body: GraftRunner => T): T = {
    val r = new GraftRunner(spark, label, owner, baseTmp, cleanupMode)
    try body(r) finally r.cleanup()
  }
}
