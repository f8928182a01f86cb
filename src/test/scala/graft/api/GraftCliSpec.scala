package graft.api

import graft.SparkSpec

class GraftCliSpec extends SparkSpec {

  test("argument parsing mirrors the reference CLI contract") {
    val ok = GraftCli.parse(List("--job", "wordcount", "--output", "/tmp/o",
      "--partitions", "4", "--no-combiner", "a.txt", "b.txt"))
    assert(ok === Right(GraftCli.Args(job = "wordcount", output = "/tmp/o",
      partitions = 4, combiner = false, inputs = Vector("a.txt", "b.txt"))))
    assert(GraftCli.parse(List("--bogus")).isLeft)
  }

  test("end-to-end: CLI run produces the inverted index with metrics") {
    val dir = java.nio.file.Files.createTempDirectory("cli").toFile
    java.nio.file.Files.writeString(
      new java.io.File(dir, "in.txt").toPath, "apple banana\napple")
    val out = new java.io.File(dir, "out").toString
    val metrics = new java.io.File(dir, "metrics_report.txt").toString
    GraftCli.run(spark, GraftCli.Args(job = "inverted", output = out,
      partitions = 2, inputs = Vector(dir + "/in.txt"),
      metrics = Some(metrics)))
    val lines = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("part-"))
      .flatMap(f => scala.io.Source.fromFile(f).getLines().toSeq)
    assert(lines.exists(l => l.startsWith("apple\t") && l.contains("in.txt")))
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(metrics)).contains("GRAFT METRICS REPORT"))
  }
}
