package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MathStreams
import graft.operators.MathStreams._

/** Parser + evaluator checks for the `let`/`eval` math-stream surface.
  * Value-level verification against DuckDB is the driver's oracle
  * (`let_*` entries); here we pin the parser shape, the binding rules,
  * and spot statistics against brute force over the same sf0.001 data.
  */
class MathStreamsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  // ---------- parser ----------

  test("parser: nested calls, named + positional args, literals") {
    val e = MathStreams.parse(
      "let(a=search(events, q=\"event_type:click\", rows=10), describe(round(col(a, value))))")
    e match {
      case Call("let", List((Some("a"), Call("search", sargs)), (None, body))) =>
        assert(sargs.head == (None, Ref("events")))
        assert(sargs.contains((Some("q"), StrLit("event_type:click"))))
        assert(sargs.contains((Some("rows"), NumLit(10))))
        body match {
          case Call("describe", List((None, Call("round",
            List((None, Call("col", List((None, Ref("a")), (None, Ref("value")))))))))) => ()
          case other => fail(s"unexpected body: $other")
        }
      case other => fail(s"unexpected parse: $other")
    }
  }

  test("parser: negative numbers, trailing-input and unbalanced errors") {
    assert(MathStreams.parse("scalarMultiply(-2.5, v)") ==
      Call("scalarMultiply", List((None, NumLit(-2.5)), (None, Ref("v")))))
    intercept[IllegalArgumentException](MathStreams.parse("describe(v) x"))
    intercept[IllegalArgumentException](MathStreams.parse("describe(v"))
  }

  // ---------- evaluator ----------

  private def brute(): Array[Long] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/events.parquet")
      .where("event_type = 'click'")
      .orderBy("event_id").limit(500)
      .select("value").as[Double].collect()
      .map(v => math.round(v * 10000))
  }

  test("describe matches brute-force exact integer moments") {
    val vs = brute()
    val row = MathStreams.run(spark, dir,
      "let(a=search(events, q=\"event_type:click\", sort=\"event_id asc\", rows=500), " +
        "describe(round(scalarMultiply(10000, col(a, value)))))").collect()(0)
    val n = vs.length.toLong
    assert(row.getAs[Long]("n") == n)
    assert(row.getAs[Long]("sum_v") == vs.sum)
    assert(row.getAs[Long]("min_v") == vs.min)
    assert(row.getAs[Long]("max_v") == vs.max)
    val mean = vs.sum.toDouble / n
    assert(math.abs(row.getAs[Double]("mean") - mean) < 1e-9)
    val sumsq = vs.map(v => v * v).sum
    val varE = (n.toDouble * sumsq - vs.sum.toDouble * vs.sum.toDouble) / (n.toDouble * (n - 1))
    assert(math.abs(row.getAs[Double]("variance") - varE) < math.abs(varE) * 1e-12)
  }

  test("movingAvg: trailing window, exact sums, first win-1 rows dropped") {
    val vs = brute().take(50)
    val got = MathStreams.run(spark, dir,
      "let(a=search(events, q=\"event_type:click\", sort=\"event_id asc\", rows=50), " +
        "movingAvg(round(scalarMultiply(10000, col(a, value))), 7))")
      .orderBy("ord").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.length == vs.length - 6)
    got.foreach { case (ord, ma) =>
      val expect = vs.slice(ord.toInt - 6, ord.toInt + 1).sum.toDouble / 7
      assert(math.abs(ma - expect) < 1e-9, s"ord $ord")
    }
  }

  test("hist: bins partition the vector (counts sum to n), bin ids in range") {
    val rows = MathStreams.run(spark, dir,
      "let(a=search(events, q=\"*:*\", sort=\"event_id asc\", rows=1000), " +
        "hist(round(scalarMultiply(10000, col(a, value))), 10))")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.map(_._2).sum == 1000L)
    assert(rows.forall { case (bin, _) => bin >= 0 && bin <= 9 })
  }

  test("zscores: sum of z ~ 0; regress on exact linear gives slope=2, r2=1") {
    val zs = MathStreams.run(spark, dir,
      "let(a=search(events, q=\"event_type:view\", sort=\"event_id asc\", rows=300), " +
        "zscores(round(scalarMultiply(10000, col(a, value)))))")
      .collect().map(_.getDouble(1))
    assert(zs.nonEmpty) // rows is a cap; sf0.001 has fewer 'view' events
    assert(math.abs(zs.sum) < 1e-6)
    val r = MathStreams.run(spark, dir,
      "let(a=search(events, q=\"*:*\", sort=\"event_id asc\", rows=100), " +
        "x=round(scalarMultiply(10000, col(a, value))), " +
        "regress(x, scalarMultiply(2, x)))").collect()(0)
    assert(math.abs(r.getAs[Double]("slope") - 2.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("intercept")) < 1e-9)
    assert(math.abs(r.getAs[Double]("r2") - 1.0) < 1e-12)
  }

  test("ebeAdd/ebeSubtract roundtrip; let bindings see earlier bindings") {
    val out = MathStreams.run(spark, dir,
      "let(a=search(events, q=\"*:*\", sort=\"event_id asc\", rows=20), " +
        "x=round(scalarMultiply(100, col(a, value))), " +
        "y=ebeAdd(x, x), " +
        "d=ebeSubtract(y, x), " +
        "z=ebeSubtract(d, x), " +
        "describe(z))").collect()(0)
    assert(out.getAs[Long]("n") == 20L)
    assert(out.getAs[Long]("min_v") == 0L)
    assert(out.getAs[Long]("max_v") == 0L)
  }

  test("dotProduct/cosineSimilarity: exact on known vectors; diff∘cumsum identity") {
    // x and 3x: cos must be exactly 1 (common factor cancels in the
    // double expression tree), dot = 3 * Σx²
    val t = MathStreams.run(spark, dir,
      "let(a=search(events, q=\"*:*\", sort=\"event_id asc\", rows=50), " +
        "x=round(scalarMultiply(100, col(a, value))), " +
        "tuple(dot=dotProduct(x, scalarMultiply(3, x)), " +
        "cos=cosineSimilarity(x, scalarMultiply(3, x))))").collect()(0)
    import spark.implicits._
    val vs = spark.read.parquet(s"$dir/events.parquet")
      .orderBy("event_id").limit(50).select("value").as[Double].collect()
      .map(v => math.round(v * 100))
    assert(t.getAs[Double]("dot") == 3.0 * vs.map(v => v * v).sum)
    assert(math.abs(t.getAs[Double]("cos") - 1.0) < 1e-12)
    // cumulativeSum(diff(v))[i] == v[i+1] - v[0]
    val c = MathStreams.run(spark, dir,
      "let(a=search(events, q=\"*:*\", sort=\"event_id asc\", rows=50), " +
        "cumulativeSum(diff(round(scalarMultiply(100, col(a, value))))))")
      .orderBy("ord").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(c.length == vs.length - 1)
    c.foreach { case (ord, v) => assert(v == vs(ord.toInt + 1) - vs(0)) }
  }

  test("ebeMultiply keeps the integer domain; ebeDivide leaves it") {
    val m = MathStreams.run(spark, dir,
      "let(a=search(events, q=\"*:*\", sort=\"event_id asc\", rows=10), " +
        "x=round(scalarMultiply(100, col(a, value))), " +
        "describe(ebeMultiply(x, x)))").collect()(0)
    assert(m.getAs[Long]("min_v") >= 0) // squares
    val ex = intercept[Exception](MathStreams.run(spark, dir,
      "let(a=search(events, q=\"*:*\", sort=\"event_id asc\", rows=10), " +
        "x=round(scalarMultiply(100, col(a, value))), " +
        "describe(ebeDivide(x, x)))"))
    assert(ex.getMessage.contains("integer-unit"))
  }

  test("statistics reject non-quantized (double) vectors") {
    val ex = intercept[Exception](MathStreams.run(spark, dir,
      "let(a=search(events, q=\"*:*\", sort=\"event_id asc\", rows=10), " +
        "describe(col(a, value)))"))
    assert(ex.getMessage.contains("integer-unit"))
  }

  test("cov: sample covariance equals brute force on aligned series") {
    import spark.implicits._
    val rows = spark.read.parquet(s"$dir/events.parquet")
      .where("event_type = 'click'")
      .orderBy("event_id").limit(200)
      .select("value", "user_id").as[(Double, Long)].collect()
    val xs = rows.map(r => math.round(r._1 * 100).toDouble)
    val ys = rows.map(_._2.toDouble)
    val n = xs.length
    val mx = xs.sum / n; val my = ys.sum / n
    val expected = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum / (n - 1)
    val got = MathStreams.run(spark, dir,
      "let(a=search(events, q=\"event_type:click\", sort=\"event_id asc\", rows=200), " +
        "cov(round(scalarMultiply(100, col(a, value))), round(col(a, user_id))))")
      .collect()(0)
    assert(got.getAs[Long]("n") == n)
    assert(math.abs(got.getAs[Double]("cov") - expected) < 1e-6 * math.abs(expected) + 1e-9)
  }

  test("conv: full convolution matches known vectors") {
    import spark.implicits._
    // conv([1,2,3],[4,5]) = [4, 13, 22, 15] — build via diff-free
    // bounded vectors from a one-off in-memory table is not in the
    // grammar, so verify via the algebraic identity on corpus data:
    // sum(conv(a,b)) == sum(a) * sum(b)
    val out = MathStreams.run(spark, dir,
      "let(a=search(events, q=\"*:*\", sort=\"event_id asc\", rows=12), " +
        "b=search(events, q=\"event_type:view\", sort=\"event_id asc\", rows=5), " +
        "conv(round(scalarMultiply(100, col(a, value))), round(col(b, user_id))))")
      .collect().map(r => r.getAs[Long]("ord") -> r.getAs[Long]("v")).toMap
    val a = spark.read.parquet(s"$dir/events.parquet")
      .orderBy("event_id").limit(12)
      .select("value").as[Double].collect().map(v => math.round(v * 100))
    val b = spark.read.parquet(s"$dir/events.parquet")
      .where("event_type = 'view'").orderBy("event_id").limit(5)
      .select("user_id").as[Long].collect()
    val expected = (for {
      i <- a.indices; j <- b.indices
    } yield (i + j).toLong -> a(i) * b(j))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(out == expected)
    assert(out.values.sum == a.sum * b.sum)
    assert(out.size == a.length + b.length - 1)
  }

  test("ebeDivide: element-wise double quotient (success path)") {
    val out = MathStreams.run(spark, dir,
      "let(a=search(events, q=\"*:*\", sort=\"event_id asc\", rows=10), " +
        "x=round(scalarMultiply(100, col(a, value))), " +
        "ebeDivide(ebeAdd(x, x), x))") // (2x)/x = 2.0 exactly, x > 0 here
      .collect()
    assert(out.length == 10)
    assert(out.forall(r => r.getAs[Double]("v") == 2.0))
  }

  test("search over the index: BM25 top-k stream feeds col/describe") {
    val row = MathStreams.run(spark, dir,
      "let(a=search(documents, q=\"spark join\", rows=20), " +
        "describe(round(scalarMultiply(10000, col(a, score)))))").collect()(0)
    assert(row.getAs[Long]("n") > 0)
    assert(row.getAs[Long]("min_v") > 0) // BM25 scores of matching docs are positive
  }
}
