package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.api.{SetupCmd, StagedSetup}
import graft.api.SetupCmd.{HashPath, Raw}

/** The --setup surface: tokenizer golden cases straight from the
  * reference docstring (mrjob/setup.py:76-163), name assignment
  * (setup.py:239-282, 350-447), and an end-to-end run proving
  * once-per-JVM execution with the mrjob working-dir layout. */
class SetupCmdSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  // ---- parse_setup_cmd golden cases ----

  test("hash path after colon: export PYTHONPATH=$PYTHONPATH:foo.egg#") {
    val toks = SetupCmd.parse("export PYTHONPATH=$PYTHONPATH:foo.egg#")
    assert(toks == List(
      Raw("export PYTHONPATH=$PYTHONPATH:"),
      HashPath("foo.egg", None, "file")))
  }

  test("name stops at forbidden chars: sudo dpkg -i fooify.deb#; fooify bar") {
    val toks = SetupCmd.parse("sudo dpkg -i fooify.deb#; fooify bar")
    assert(toks == List(
      Raw("sudo dpkg -i "),
      HashPath("fooify.deb", None, "file"),
      Raw("; fooify bar")))
  }

  test("quoted strings are never parsed as hash paths") {
    assert(SetupCmd.parse("echo 'foo.txt#bar'") ==
      List(Raw("echo 'foo.txt#bar'")))
    assert(SetupCmd.parse("echo \"a#b\" c") == List(Raw("echo \"a#b\" c")))
  }

  test("trailing slash on PATH means dir; slash is kept in the command") {
    val toks = SetupCmd.parse("make -C src/#")
    assert(toks == List(
      Raw("make -C "), HashPath("src", None, "dir"), Raw("/")))
  }

  test("trailing slash on NAME means archive") {
    val toks = SetupCmd.parse("cd foo.tar.gz#foo/; make")
    assert(toks == List(
      Raw("cd "), HashPath("foo.tar.gz", Some("foo"), "archive"),
      Raw("/; make")))
  }

  test("explicit names and URIs parse; backslash escapes unescape") {
    assert(SetupCmd.parse("cp data.txt#stop_words.txt .") == List(
      Raw("cp "), HashPath("data.txt", Some("stop_words.txt"), "file"),
      Raw(" .")))
    // a URI path may contain ':' (scheme) — the :/= stop rule is lifted
    val uri = SetupCmd.parse("get hdfs://nn:8020/key.txt#k")
    assert(uri == List(
      Raw("get "), HashPath("hdfs://nn:8020/key.txt", Some("k"), "file")))
    // escaped space survives INTO the path, unescaped
    assert(SetupCmd.parse("""cat my\ file.txt#""") == List(
      Raw("cat "), HashPath("my file.txt", None, "file")))
  }

  test("tokenizer errors match the reference messages") {
    val e1 = intercept[IllegalArgumentException](SetupCmd.parse("echo 'oops"))
    assert(e1.getMessage == "No closing quotation")
    val e2 = intercept[IllegalArgumentException](SetupCmd.parse("echo a\\"))
    assert(e2.getMessage == "No escaped character")
  }

  // ---- naming ----

  test("name_uniquely keeps multi-part extensions intact") {
    assert(SetupCmd.nameUniquely("foo.txt", Set("foo.txt")) == "foo-1.txt")
    assert(SetupCmd.nameUniquely("bar.tar.gz", Set("bar.tar.gz")) ==
      "bar-1.tar.gz")
    assert(SetupCmd.nameUniquely("/a/b/baz.py", Set.empty) == "baz.py")
    assert(SetupCmd.nameUniquely("x", Set("x", "x-1")) == "x-2")
  }

  test("working-dir name collision is an error; re-add is a no-op") {
    val n = new SetupCmd.WorkingDirNames
    n.add("file", "/a/one.txt", Some("data"))
    n.add("file", "/a/one.txt", Some("data")) // same mapping: fine
    val e = intercept[IllegalArgumentException](
      n.add("file", "/b/two.txt", Some("data")))
    assert(e.getMessage.contains("won't work because we already have"))
    // auto names never collide with assigned ones
    n.add("file", "/c/data", None)
    assert(n.name("file", "/c/data", None) == "data-1")
  }

  // ---- end-to-end: stage + run on executors ----

  test("setup commands run once per executor JVM, in the mrjob " +
    "working-dir layout, under a machine lock") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_setup_e2e")
    val greeting = tmp.resolve("greeting.txt")
    Files.writeString(greeting, "hello setup\n")
    val proj = Files.createDirectory(tmp.resolve("proj"))
    Files.writeString(proj.resolve("notes.txt"), "n1\n")
    val marker = tmp.resolve("marker.txt").toString

    val staged = SetupCmd.stage(spark, Seq(
      s"cat $greeting# > copied.txt",
      s"echo once >> $marker",
      s"ls $proj/# > listing.txt"), jobKey = "setup-e2e-1")

    // rendered commands substitute $__GRAFT_PWD/<assigned name>
    assert(staged.renderedCmds(0) ==
      "cat $__GRAFT_PWD/greeting.txt > copied.txt")
    assert(staged.renderedCmds(2) == "ls $__GRAFT_PWD/proj/ > listing.txt")

    // 8 rows over 4 partitions: ensure() fires in every task but the
    // commands must run exactly once in this JVM
    val n = spark.range(8).repartition(4).mapPartitions { it =>
      staged.ensure(); it
    }.count()
    assert(n == 8)
    assert(Files.readAllLines(java.nio.file.Paths.get(marker)).size == 1)

    val wd = StagedSetup.workDir.get
    assert(Files.readString(java.nio.file.Paths.get(wd, "copied.txt")) ==
      "hello setup\n")
    // the dir-type hash path was tarballed, shipped, and unpacked:
    // `ls` of the working-dir name sees its contents
    val listing = Files.readString(java.nio.file.Paths.get(wd, "listing.txt"))
    assert(listing.contains("notes.txt"))
  }

  test("conf-file setup lists concatenate earlier->later and stage " +
    "verbatim (combine_lists, mrjob/conf.py)") {
    import graft.api.GraftRunner
    val tmp = Files.createTempDirectory("graft_setup_conf")
    val data = tmp.resolve("data.txt")
    Files.writeString(data, "x\n")
    // one file with TWO indexed entries, a second file appending one
    // more — and a comma INSIDE a command, which the comma-joined
    // passthru form cannot carry
    val confA = tmp.resolve("a.properties")
    Files.writeString(confA,
      s"list.setup.0=cat $data# > a.txt\n" +
        "list.setup.1=echo one,two > b.txt\n")
    val confB = tmp.resolve("b.properties")
    Files.writeString(confB, "list.setup=echo three > c.txt\n")
    val args = GraftRunner.loadConf(confA.toString, confB.toString)
    assert(args.setupCmds == Seq(
      s"cat $data# > a.txt", "echo one,two > b.txt", "echo three > c.txt"))

    val staged = SetupCmd.stage(spark, args.setupCmds, "setup-conf-1")
    assert(staged.renderedCmds == Seq(
      "cat $__GRAFT_PWD/data.txt > a.txt",
      "echo one,two > b.txt", "echo three > c.txt"))
    import spark.implicits._
    spark.range(2).repartition(2).mapPartitions { it =>
      staged.ensure(); it
    }.count()
    val wd = StagedSetup.workDir.get
    assert(Files.readString(java.nio.file.Paths.get(wd, "a.txt")) == "x\n")
    assert(Files.readString(java.nio.file.Paths.get(wd, "b.txt")) ==
      "one,two\n")
    assert(Files.readString(java.nio.file.Paths.get(wd, "c.txt")) ==
      "three\n")
  }

  test("a failing setup command aborts with its exit status") {
    import spark.implicits._
    val staged = SetupCmd.stage(spark, Seq("exit 3"), jobKey = "setup-fail-1")
    val e = intercept[org.apache.spark.SparkException] {
      spark.range(2).repartition(2)
        .mapPartitions { it => staged.ensure(); it }.count()
    }
    assert(e.getMessage.contains("setup command failed (exit 3)") ||
      Option(e.getCause).exists(_.getMessage.contains(
        "setup command failed (exit 3)")))
  }
}
