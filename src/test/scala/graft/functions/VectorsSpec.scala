package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorsSpec extends SparkSpec {
  import spark.implicits._

  private def runPair(a: Seq[Double], b: Seq[Double],
                      f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column): Double =
    Seq((a, b)).toDF("a", "b").select(f(col("a"), col("b")).as("r"))
      .collect().head.getDouble(0)

  test("dot product matches scalar loop (codegen path)") {
    val a = Seq(1.0, 2.0, 3.0)
    val b = Seq(4.0, -5.0, 6.0)
    assert(runPair(a, b, Vectors.dot) === (4.0 - 10.0 + 18.0))
  }

  test("cosine of identical vectors is 1.0") {
    val v = Seq(0.3, -0.7, 1.1, 2.0)
    assert(math.abs(runPair(v, v, Vectors.cosine) - 1.0) < 1e-12)
  }

  test("cosine of orthogonal vectors is 0.0") {
    assert(runPair(Seq(1.0, 0.0), Seq(0.0, 5.0), Vectors.cosine) === 0.0)
  }

  test("expressions agree with reference scalar math on random vectors") {
    val rnd = new scala.util.Random(42)
    val pairs = (1 to 20).map { _ =>
      (Seq.fill(8)(rnd.nextDouble() * 20 - 10),
        Seq.fill(8)(rnd.nextDouble() * 20 - 10))
    }
    // one Spark job for all pairs, then compare each against scalar math
    val got = pairs.toDF("a", "b")
      .select(Vectors.dot(col("a"), col("b")).as("dot"),
        Vectors.cosine(col("a"), col("b")).as("cos"))
      .collect()
    pairs.zip(got).foreach { case ((a, b), row) =>
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      assert(math.abs(row.getDouble(0) - dot) < 1e-9)
      assert(math.abs(row.getDouble(1) - dot / (na * nb)) < 1e-9)
    }
  }

  test("interpreted eval path matches codegen result") {
    val a = Seq(1.5, -2.5, 3.5)
    val b = Seq(0.5, 4.0, -1.0)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    def lit(v: Seq[Double]) =
      Literal.create(ArrayData.toArrayData(v.toArray), ArrayType(DoubleType))
    val interp = CosineSimilarity(lit(a), lit(b)).eval(null)
      .asInstanceOf[Double]
    assert(math.abs(interp - runPair(a, b, Vectors.cosine)) < 1e-15)
  }

  test("SQL front-end resolves the registered native functions") {
    val r = spark.sql(
      """SELECT vector_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       cosine_similarity(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c
        |""".stripMargin).collect().head
    assert(r.getDouble(0) === 11.0)
    assert(r.getDouble(1) === 1.0)
  }

  test("SQL front-end resolves the registered text primitives") {
    val r = spark.sql(
      """SELECT graft_tokens('Hello, World! 42x') AS t,
        |       graft_normalize('  Foo--BAR  baz ') AS n,
        |       graft_quality('the cat sat') AS q
        |""".stripMargin).collect().head
    assert(r.getSeq[String](0) === Seq("hello", "world", "42x"))
    assert(r.getString(1) === "foo bar baz")
    // same arithmetic as the column API (single definition, no drift)
    val viaApi = Seq("the cat sat").toDF("text")
      .select(graft.operators.TextQueries.qualityScore(col("text"),
        graft.functions.Text.tokens(col("text"))).as("q"))
      .collect().head.getDouble(0)
    assert(r.getDouble(2) === viaApi)
  }

  test("float->double cast is exact before arithmetic") {
    val df = Seq(Seq(0.1f, 0.2f)).toDF("v")
      .select(Vectors.asDouble(col("v")).as("d"))
    val d = df.collect().head.getSeq[Double](0)
    assert(d === Seq(0.1f.toDouble, 0.2f.toDouble))
  }
}
