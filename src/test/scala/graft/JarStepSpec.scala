package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.jar.{JarEntry, JarOutputStream, Manifest => JarManifest}

import org.scalatest.funsuite.AnyFunSuite

import graft.api.{JarStep, MrPipeline, MrStep}

/** JarStep parity (mrjob/step.py:421-460; example chain
  * mrjob/examples/mr_jar_step_example.py:62-90): a REAL jar is
  * compiled at test time (javax.tools, JDK-bundled), packaged both
  * with and without a manifest Main-Class, and executed through
  * [[JarStep.run]] — covering `<input>` comma-joining, `<output>`,
  * `<generic args>` jobconf rendering, the manifest-main fallback,
  * and nonzero-exit failure surfacing. The reference's own sim
  * runners refuse jar steps (EMR/Hadoop/Dataproc only), so this is
  * strictly more than a migrating user's local surface. */
class JarStepSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def tmp(prefix: String): Path =
    Files.createTempDirectory(prefix)

  /** Wordcount main, Hadoop-example-shaped: `[-Dk=v ...] <input> <output>`
    * where input is comma-joined paths, output must NOT pre-exist
    * (FileOutputFormat contract), and `wc.min.len` drops short words
    * so the generic-args path is observable in the output. */
  private val javaSrc =
    """import java.io.PrintWriter;
      |import java.nio.file.*;
      |import java.util.*;
      |
      |public class JarWordCount {
      |  public static void main(String[] args) throws Exception {
      |    List<String> rest = new ArrayList<>();
      |    int minLen = 0;
      |    for (String a : args) {
      |      if (a.startsWith("-D")) {
      |        String kv = a.substring(2);
      |        int eq = kv.indexOf('=');
      |        if (kv.substring(0, eq).equals("wc.min.len"))
      |          minLen = Integer.parseInt(kv.substring(eq + 1));
      |      } else rest.add(a);
      |    }
      |    if (rest.size() != 2) { System.err.println("usage: in out"); System.exit(2); }
      |    Path out = Paths.get(rest.get(1));
      |    if (Files.exists(out)) { System.err.println("output exists: " + out); System.exit(1); }
      |    TreeMap<String, Long> counts = new TreeMap<>();
      |    for (String in : rest.get(0).split(",")) {
      |      Path p = Paths.get(in);
      |      if (!Files.exists(p)) { System.err.println("no such input: " + in); System.exit(1); }
      |      List<Path> files = new ArrayList<>();
      |      if (Files.isDirectory(p)) {
      |        try (java.util.stream.Stream<Path> s = Files.list(p)) {
      |          s.filter(Files::isRegularFile).sorted().forEach(files::add);
      |        }
      |      } else files.add(p);
      |      for (Path f : files)
      |        for (String line : Files.readAllLines(f))
      |          for (String w : line.trim().split("\\s+"))
      |            if (w.length() > minLen) counts.merge(w, 1L, Long::sum);
      |    }
      |    Files.createDirectories(out);
      |    try (PrintWriter w = new PrintWriter(Files.newBufferedWriter(out.resolve("part-00000")))) {
      |      for (Map.Entry<String, Long> e : counts.entrySet())
      |        w.println(e.getKey() + "\t" + e.getValue());
      |    }
      |    System.out.println("wrote " + counts.size() + " words");
      |  }
      |}
      |""".stripMargin

  /** Compile javaSrc and package it; `withManifestMain` controls
    * whether the jar carries Main-Class (the java -jar path) or the
    * caller must name the class (the -cp path). */
  private def buildJar(withManifestMain: Boolean): String = {
    val dir = tmp("graft-jar-build")
    val src = dir.resolve("JarWordCount.java")
    Files.write(src, javaSrc.getBytes(StandardCharsets.UTF_8))
    val javac = javax.tools.ToolProvider.getSystemJavaCompiler
    assert(javac != null, "JDK compiler unavailable")
    val rc = javac.run(null, null, null, src.toString)
    assert(rc == 0, s"javac failed rc=$rc")
    val jarPath = dir.resolve(
      if (withManifestMain) "wc-manifest.jar" else "wc-plain.jar")
    val mf = new JarManifest()
    mf.getMainAttributes.putValue("Manifest-Version", "1.0")
    if (withManifestMain)
      mf.getMainAttributes.putValue("Main-Class", "JarWordCount")
    val jos = new JarOutputStream(Files.newOutputStream(jarPath), mf)
    try {
      jos.putNextEntry(new JarEntry("JarWordCount.class"))
      jos.write(Files.readAllBytes(dir.resolve("JarWordCount.class")))
      jos.closeEntry()
    } finally jos.close()
    jarPath.toString
  }

  private lazy val manifestJar = buildJar(withManifestMain = true)
  private lazy val plainJar = buildJar(withManifestMain = false)

  private def writeInput(lines: Seq[String]): String = {
    val d = tmp("graft-jar-in")
    Files.write(d.resolve("input.txt"),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    d.toString
  }

  private def readCounts(outDir: String): Map[String, Long] =
    Files.readAllLines(Paths.get(outDir, "part-00000")).toArray
      .map(_.toString.split("\t")).map(a => a(0) -> a(1).toLong).toMap

  test("manifest main + <generic args> + comma-joined multi-input") {
    val in1 = writeInput(Seq("aa bb aa", "c"))
    val in2 = writeInput(Seq("bb dddd"))
    val out = tmp("graft-jar-out").resolve("wc").toString
    val log = tmp("graft-jar-log").resolve("step-0.log").toString
    val step = JarStep(manifestJar,
      args = Seq(JarStep.GenericArgs, JarStep.Input, JarStep.Output),
      jobconf = Map("wc.min.len" -> "1"))
    // marker audit before running: jobconf renders as sorted -D pairs,
    // inputs comma-join, output passes through
    assert(step.interpolatedArgs(Seq(in1, in2), out) ===
      Seq("-Dwc.min.len=1", s"$in1,$in2", out))
    JarStep.run(step, Seq(in1, in2), out, logPath = Some(log))
    // min.len=1 drops the 1-char "c"; counts merge across both inputs
    assert(readCounts(out) === Map("aa" -> 2L, "bb" -> 2L, "dddd" -> 1L))
    val logged = new String(Files.readAllBytes(Paths.get(log)),
      StandardCharsets.UTF_8)
    assert(logged.contains("wrote 3 words"))
  }

  test("explicit main_class runs via -cp (no manifest Main-Class)") {
    val in = writeInput(Seq("x y x"))
    val out = tmp("graft-jar-out").resolve("wc").toString
    val step = JarStep(plainJar, args = Seq(JarStep.Input, JarStep.Output),
      mainClass = Some("JarWordCount"))
    JarStep.run(step, Seq(in), out)
    assert(readCounts(out) === Map("x" -> 2L, "y" -> 1L))
  }

  test("nonzero exit surfaces as JarStepFailedException with the log tail") {
    val out = tmp("graft-jar-out").resolve("wc").toString
    val step = JarStep(manifestJar,
      args = Seq(JarStep.Input, JarStep.Output))
    val e = intercept[JarStep.JarStepFailedException] {
      JarStep.run(step, Seq("/nonexistent/graft/input"), out)
    }
    assert(e.getMessage.contains("rc=1"))
    assert(e.getMessage.contains("no such input"))
  }

  test("missing jar fails fast, before any process spawns") {
    intercept[IllegalArgumentException] {
      JarStep.run(JarStep("/nonexistent/graft.jar"), Nil, "/tmp/never")
    }
  }

  test("pre-existing output dir fails (FileOutputFormat contract held by the jar)") {
    val in = writeInput(Seq("a"))
    val out = tmp("graft-jar-out").toString // exists already
    val step = JarStep(manifestJar, args = Seq(JarStep.Input, JarStep.Output))
    val e = intercept[JarStep.JarStepFailedException] {
      JarStep.run(step, Seq(in), out)
    }
    assert(e.getMessage.contains("output exists"))
  }

  test("a stdin-reading jar gets immediate EOF instead of hanging") {
    val dir = tmp("graft-jar-stdin")
    val src = dir.resolve("StdinCount.java")
    Files.write(src,
      """public class StdinCount {
        |  public static void main(String[] a) throws Exception {
        |    int n = 0;
        |    while (System.in.read() >= 0) n++;
        |    System.out.println("stdin bytes: " + n);
        |  }
        |}
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    assert(javax.tools.ToolProvider.getSystemJavaCompiler
      .run(null, null, null, src.toString) == 0)
    val jarPath = dir.resolve("stdin.jar")
    val mf = new JarManifest()
    mf.getMainAttributes.putValue("Manifest-Version", "1.0")
    mf.getMainAttributes.putValue("Main-Class", "StdinCount")
    val jos = new JarOutputStream(Files.newOutputStream(jarPath), mf)
    try {
      jos.putNextEntry(new JarEntry("StdinCount.class"))
      jos.write(Files.readAllBytes(dir.resolve("StdinCount.class")))
      jos.closeEntry()
    } finally jos.close()
    // no timeout machinery needed: /dev/null stdin means EOF at once
    val log = JarStep.run(JarStep(jarPath.toString), Nil, "/tmp/unused")
    val logged = new String(Files.readAllBytes(Paths.get(log)),
      StandardCharsets.UTF_8)
    assert(logged.contains("stdin bytes: 0"))
  }

  test("mr_jar_step_example chain: jar wordcount -> typed MR frequency-of-frequencies") {
    import spark.implicits._
    val in = writeInput(Seq("the quick the lazy the", "quick lazy dog"))
    val out = tmp("graft-jar-out").resolve("wc").toString
    JarStep.run(JarStep(manifestJar,
      args = Seq(JarStep.Input, JarStep.Output)), Seq(in), out)
    // second step of the example (mr_jar_step_example.py:80-90): map
    // (word, count) -> (count, 1), reduce by sum = how many words have
    // each frequency
    val parsed = spark.read.textFile(out)
      .map { l => val a = l.split("\t"); (a(0), a(1).toLong) }
    val freqOfFreq = MrPipeline.fromDataset(parsed)
      .step(MrStep[String, Long, Long, Long, Long, Long](
        mapper = (_, c) => Iterator((c, 1L)),
        reducer = (c, ones) => Iterator((c, ones.sum))))
      .ds.collect().toMap
    // the=3; quick,lazy=2 each; dog=1
    assert(freqOfFreq === Map(3L -> 1L, 2L -> 2L, 1L -> 1L))
  }
}
