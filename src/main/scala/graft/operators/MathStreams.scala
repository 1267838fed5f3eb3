package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Solr streaming-expression `let`/`eval` math surface [8x
  * solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/LetStream.java
  * + io/eval/DescribeEvaluator.java, RegressionEvaluator.java,
  * HistogramEvaluator.java, MovingAverageEvaluator.java,
  * NormalizeEvaluator.java, CorrelationEvaluator.java]: `let` binds named
  * variables (streams, vectors, numbers) evaluated in order, then evaluates
  * one final expression over them. The reference materializes every vector
  * on a single node inside the /stream handler; here a vector stays a
  * DataFrame of (ord, v) rows — bounded by the source stream's `rows`
  * contract, never corpus-scale — and every statistic is computed from
  * EXACT integer moments (count/sum/sum-of-squares over integer-unit
  * values), so results are independent of partitioning and replayable by
  * the DuckDB oracle bit-for-bit. Statistics therefore REQUIRE an
  * integer-unit vector: quantize first with `round(scalarMultiply(10^s, v))`
  * — the same floats-to-integers rule every other entry follows.
  *
  * Supported expression grammar (hand-rolled recursive descent, the
  * function-call shape of the reference's streaming expressions):
  *
  *   expr := ident '(' [arg (',' arg)*] ')' | number | "string" | ident
  *   arg  := ident '=' expr | expr
  *
  * Functions: let, search, col, round, scalarMultiply, ebeAdd,
  * ebeSubtract, ebeMultiply, ebeDivide, dotProduct, cosineSimilarity,
  * diff, cumulativeSum, tuple, describe, regress, corr, cov, conv,
  * hist, movingAvg, zscores, percentile.
  */
object MathStreams {

  // ---------- expression AST + parser ----------

  sealed trait MExpr
  final case class Call(fn: String, args: List[(Option[String], MExpr)]) extends MExpr
  final case class NumLit(v: Double) extends MExpr
  final case class StrLit(v: String) extends MExpr
  final case class Ref(name: String) extends MExpr

  def parse(input: String): MExpr = new Parser(input).parseAll()

  private final class Parser(s: String) {
    private var i = 0
    private def ws(): Unit = { while (i < s.length && s.charAt(i).isWhitespace) i += 1 }
    private def peek: Char = if (i < s.length) s.charAt(i) else '\u0000'
    private def expect(c: Char): Unit = {
      ws(); require(peek == c, s"expected '$c' at offset $i in: $s"); i += 1
    }

    def parseAll(): MExpr = {
      val e = parseExpr(); ws()
      require(i == s.length, s"trailing input at offset $i in: $s")
      e
    }

    def parseExpr(): MExpr = {
      ws()
      val c = peek
      if (c == '"') parseStr()
      else if (c == '-' || c.isDigit) parseNum()
      else {
        val id = parseIdent()
        ws()
        if (peek == '(') {
          i += 1
          val args = scala.collection.mutable.ListBuffer[(Option[String], MExpr)]()
          ws()
          if (peek != ')') {
            var more = true
            while (more) {
              args += parseArg()
              ws()
              if (peek == ',') { i += 1; more = true } else more = false
            }
          }
          expect(')')
          Call(id, args.toList)
        } else Ref(id)
      }
    }

    private def parseArg(): (Option[String], MExpr) = {
      ws()
      val save = i
      if (peek.isLetter || peek == '_') {
        val id = parseIdent(); ws()
        if (peek == '=') { i += 1; (Some(id), parseExpr()) }
        else { i = save; (None, parseExpr()) }
      } else (None, parseExpr())
    }

    private def parseIdent(): String = {
      ws(); val start = i
      while (i < s.length &&
        (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_' || s.charAt(i) == '.')) i += 1
      require(i > start, s"expected identifier at offset $start in: $s")
      s.substring(start, i)
    }

    private def parseNum(): MExpr = {
      ws(); val start = i
      if (peek == '-') i += 1
      while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
      val txt = s.substring(start, i)
      // '-', '1..2' etc. pass the scan but not toDouble — raise the
      // grammar's own IllegalArgumentException, never a raw
      // NumberFormatException (same contract as every require above)
      val v =
        try txt.toDouble
        catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"bad number '$txt' at offset $start in: $s")
        }
      NumLit(v)
    }

    private def parseStr(): MExpr = {
      expect('"'); val start = i
      while (i < s.length && s.charAt(i) != '"') i += 1
      val v = s.substring(start, i); expect('"')
      StrLit(v)
    }
  }

  // ---------- values ----------

  sealed trait MVal
  /** ordered tuple stream; the 0-based `ord` column is already materialized */
  final case class MStream(df: DataFrame) extends MVal
  /** numeric vector: (ord LONG, v LONG or DOUBLE) */
  final case class MVec(df: DataFrame) extends MVal
  final case class MNum(v: Double) extends MVal

  /** Parse + evaluate; streams/vectors/numbers all surface as a DataFrame. */
  def run(spark: SparkSession, dir: String, expression: String): DataFrame =
    eval(spark, dir, parse(expression), Map.empty) match {
      case MStream(df) => df
      case MVec(df)    => df.select(col("ord"), col("v"))
      case MNum(v)     =>
        import spark.implicits._
        Seq(v).toDF("value")
    }

  // ---------- evaluator ----------

  private def isLongVec(df: DataFrame): Boolean =
    df.schema("v").dataType == LongType

  private def requireLong(df: DataFrame, op: String): Unit =
    require(isLongVec(df),
      s"$op requires an integer-unit vector — quantize first with round(scalarMultiply(10^s, v))")

  /** 0-based ord over the stream's own sort — the vector index. The window
    * is single-partition by construction, but it runs AFTER the stream's
    * `rows` limit, so it is bounded by the result-set contract (the
    * reference materializes the same vector on one node).
    */
  private def withOrd(df: DataFrame, sort: Seq[Column]): DataFrame =
    df.withColumn("ord",
      (row_number().over(Window.orderBy(sort: _*)) - 1).cast("long"))

  private def eval(spark: SparkSession, dir: String, e: MExpr,
                   env: Map[String, MVal]): MVal = e match {
    case NumLit(v) => MNum(v)
    case StrLit(_) => sys.error("bare string is not a value; strings only appear as arguments")
    case Ref(n)    => env.getOrElse(n, sys.error(s"unbound variable: $n"))
    case Call(fn, args) => apply0(spark, dir, fn, args, env)
  }

  private def str(e: MExpr): String = e match {
    case StrLit(v) => v
    case Ref(n)    => n
    case other     => sys.error(s"expected string, got $other")
  }

  private def num(e: MExpr): Double = e match {
    case NumLit(v) => v
    case other     => sys.error(s"expected number, got $other")
  }

  private def apply0(spark: SparkSession, dir: String, fn: String,
                     args: List[(Option[String], MExpr)],
                     env: Map[String, MVal]): MVal = {

    def vec(e: MExpr, env0: Map[String, MVal]): DataFrame =
      eval(spark, dir, e, env0) match {
        case MVec(df) => df
        case other    => sys.error(s"$fn expects a vector, got $other")
      }
    def stream(e: MExpr, env0: Map[String, MVal]): DataFrame =
      eval(spark, dir, e, env0) match {
        case MStream(df) => df
        case other       => sys.error(s"$fn expects a stream, got $other")
      }
    def pos: List[MExpr] = args.collect { case (None, e) => e }

    fn match {
      case "let" =>
        // named bindings evaluate in order and see earlier bindings;
        // the single positional expression is the body [8x LetStream]
        val bodyE = {
          val p = pos
          require(p.size == 1, s"let requires exactly one body expression, got ${p.size}")
          p.head
        }
        val boundEnv = args.foldLeft(env) {
          case (acc, (Some(name), ex)) => acc + (name -> eval(spark, dir, ex, acc))
          case (acc, (None, _))        => acc
        }
        eval(spark, dir, bodyE, boundEnv)

      case "search" =>
        val coll = pos.headOption.map(str).getOrElse(sys.error("search requires a collection"))
        val named = args.collect { case (Some(k), ex) => k -> ex }.toMap
        val q = named.get("q").map(str).getOrElse("*:*")
        val rows = named.get("rows").map(ex => num(ex).toInt).getOrElse(10)
        if (coll == "documents" && !q.contains(":")) {
          // full-text q over the prebuilt inverted index: BM25 top-`rows`,
          // scored by the BMW kernel (bit-identical to the exact path)
          val view = graft.IndexCache.documentsIndex(spark, dir)
          val terms = q.trim.split("\\s+").toSeq
          val df = graft.search.BmwSearch.topK(spark, view, terms, rows,
            graft.search.DoubleOracle)
          MStream(withOrd(df, Seq(col("score").desc, col("doc_id").asc)))
        } else {
          var df = spark.read.parquet(s"$dir/$coll.parquet")
          if (q != "*:*") {
            val Array(f, v) = q.split(":", 2)
            val rhs = if (v.matches("-?\\d+")) lit(v.toLong) else lit(v)
            df = df.where(col(f) === rhs)
          }
          val sortSpec = named.get("sort").map(str)
            .getOrElse(sys.error("search over a table requires sort=\"f asc[,g desc…]\""))
          val sortCols = sortSpec.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { p =>
            val parts = p.split("\\s+")
            if (parts.length > 1 && parts(1).equalsIgnoreCase("desc")) col(parts(0)).desc
            else col(parts(0)).asc
          }
          val limited = df.orderBy(sortCols: _*).limit(rows)
          val withIdx = withOrd(limited, sortCols)
          val out = named.get("fl").map(str) match {
            case Some(fl) =>
              val cols = fl.split(",").map(_.trim).toSeq :+ "ord"
              withIdx.select(cols.map(col): _*)
            case None => withIdx
          }
          MStream(out)
        }

      case "col" =>
        val st = stream(pos.head, env)
        val field = str(pos(1))
        MVec(st.select(col("ord"), col(field).cast("double").as("v")))

      case "round" =>
        val v = vec(pos.head, env)
        if (isLongVec(v)) MVec(v)
        else MVec(v.select(col("ord"), round(col("v")).cast("long").as("v")))

      case "scalarMultiply" =>
        val k = num(pos.head)
        val v = vec(pos(1), env)
        val prod =
          if (isLongVec(v) && k == math.rint(k)) (col("v") * lit(k.toLong)).as("v")
          else (col("v") * lit(k)).as("v")
        MVec(v.select(col("ord"), prod))

      case "ebeAdd" | "ebeSubtract" | "ebeMultiply" | "ebeDivide" =>
        val a = vec(pos.head, env).select(col("ord"), col("v").as("va"))
        val b = vec(pos(1), env).select(col("ord"), col("v").as("vb"))
        val op = fn match {
          case "ebeAdd"      => col("va") + col("vb")
          case "ebeSubtract" => col("va") - col("vb")
          case "ebeMultiply" => col("va") * col("vb")
          // division leaves the integer domain — the result is a double
          // vector (re-quantize with round(scalarMultiply(...)) before
          // feeding a statistic)
          case _             => col("va").cast("double") / col("vb").cast("double")
        }
        MVec(a.join(b, Seq("ord")).select(col("ord"), op.as("v")))

      case "dotProduct" | "cosineSimilarity" =>
        // exact integer moments (DoubleEvaluator analogs over the joined
        // bounded vectors); dot stays exact while |Σ x·y| < 2^53 — callers
        // quantize inputs small enough, same contract as every statistic
        val x = vec(pos.head, env); val y = vec(pos(1), env)
        requireLong(x, fn); requireLong(y, fn)
        val j = x.select(col("ord"), col("v").as("x"))
          .join(y.select(col("ord"), col("v").as("y")), Seq("ord"))
        val m = j.agg(sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy")).head()
        // sum() over zero rows is null — surface the empty ord-join as a
        // clean error, not a driver NPE (regress/corr/cov stay lazy and
        // return a null row instead; scalars must be defined)
        require(!m.isNullAt(0), s"$fn of empty/disjoint vectors")
        if (fn == "dotProduct") MNum(m.getLong(0).toDouble)
        else MNum(m.getLong(0).toDouble /
          (math.sqrt(m.getLong(1).toDouble) * math.sqrt(m.getLong(2).toDouble)))

      case "diff" =>
        // serial/lagged difference [8x solrj io/eval/
        // TimeDifferencingEvaluator.java — diff(vec[, lag])]:
        // out[i] = v[i+lag] − v[i], length n−lag, re-indexed from 0
        val v = vec(pos.head, env)
        requireLong(v, "diff")
        val lagN = if (pos.size > 1) num(pos(1)).toInt else 1
        require(lagN >= 1, "diff lag must be >= 1")
        val w = Window.orderBy(col("ord").asc)
        MVec(v.select((col("ord") - lagN).as("ord"),
            (col("v") - lag("v", lagN).over(w)).as("v"))
          .where(col("ord") >= 0))

      case "cumulativeSum" =>
        val v = vec(pos.head, env)
        requireLong(v, "cumulativeSum")
        val w = Window.orderBy(col("ord").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        MVec(v.select(col("ord"), sum("v").over(w).as("v")))

      case "tuple" =>
        // one named row of scalar results [8x io/eval/TupleEvaluator]
        val named = args.collect { case (Some(k), ex) => k ->
          (eval(spark, dir, ex, env) match {
            case MNum(d) => d
            case other   => sys.error(s"tuple fields must be numbers, got $other")
          }) }
        require(named.nonEmpty, "tuple requires named number fields")
        MStream(spark.createDataFrame(
          java.util.Collections.singletonList(
            org.apache.spark.sql.Row.fromSeq(named.map(_._2))),
          org.apache.spark.sql.types.StructType(named.map(n =>
            org.apache.spark.sql.types.StructField(n._1,
              org.apache.spark.sql.types.DoubleType)))))

      case "describe" =>
        val v = vec(pos.head, env)
        requireLong(v, "describe")
        val m = v.agg(
          count(lit(1)).as("n"), sum("v").as("sum_v"),
          min("v").as("min_v"), max("v").as("max_v"),
          sum(col("v") * col("v")).as("sumsq"),
          percentile(col("v"), lit(0.5)).as("p50"))
        val nD = col("n").cast("double")
        def d(c: String) = col(c).cast("double")
        val varE = (nD * d("sumsq") - d("sum_v") * d("sum_v")) / (nD * (nD - 1))
        MStream(m.select(col("n"), col("sum_v"), col("min_v"), col("max_v"),
          (d("sum_v") / nD).as("mean"), varE.as("variance"),
          sqrt(varE).as("stddev"), col("p50")))

      case "regress" | "corr" =>
        val x = vec(pos.head, env); val y = vec(pos(1), env)
        requireLong(x, fn); requireLong(y, fn)
        val j = x.select(col("ord"), col("v").as("x"))
          .join(y.select(col("ord"), col("v").as("y")), Seq("ord"))
        val m = j.agg(count(lit(1)).as("n"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        val nD = col("n").cast("double")
        def d(c: String) = col(c).cast("double")
        val numE = nD * d("sxy") - d("sx") * d("sy")
        val denx = nD * d("sxx") - d("sx") * d("sx")
        val deny = nD * d("syy") - d("sy") * d("sy")
        if (fn == "corr")
          MStream(m.select(col("n"), (numE / sqrt(denx * deny)).as("corr")))
        else {
          val slope = numE / denx
          MStream(m.select(col("n"), slope.as("slope"),
            ((d("sy") - slope * d("sx")) / nD).as("intercept"),
            ((numE * numE) / (denx * deny)).as("r2"),
            (numE / sqrt(denx * deny)).as("corr")))
        }

      case "cov" =>
        // sample covariance [8x solrj io/eval/CovarianceEvaluator.java —
        // Commons Math Covariance, n−1 denominator]: exact integer
        // moments, ONE double division at the end
        val x = vec(pos.head, env); val y = vec(pos(1), env)
        requireLong(x, fn); requireLong(y, fn)
        val j = x.select(col("ord"), col("v").as("x"))
          .join(y.select(col("ord"), col("v").as("y")), Seq("ord"))
        val m = j.agg(count(lit(1)).as("n"), sum("x").as("sx"),
          sum("y").as("sy"), sum(col("x") * col("y")).as("sxy"))
        val nD = col("n").cast("double")
        def dc(c: String) = col(c).cast("double")
        MStream(m.select(col("n"),
          ((nD * dc("sxy") - dc("sx") * dc("sy")) / (nD * (nD - 1))).as("cov")))

      case "conv" =>
        // full convolution [8x solrj io/eval/ConvolutionEvaluator.java]:
        // out[k] = Σ_i a[i]·b[k−i], k = 0..|a|+|b|−2 — exact integer
        // sums over the bounded-vector cross join (rows= contract keeps
        // both sides tiny; never a corpus-scale product)
        val a = vec(pos.head, env); val b = vec(pos(1), env)
        requireLong(a, fn); requireLong(b, fn)
        MVec(a.select(col("ord").as("ia"), col("v").as("va"))
          .crossJoin(broadcast(b.select(col("ord").as("ib"), col("v").as("vb"))))
          .groupBy((col("ia") + col("ib")).as("ord"))
          .agg(sum(col("va") * col("vb")).as("v")))

      case "hist" =>
        val v = vec(pos.head, env)
        requireLong(v, "hist")
        val bins = num(pos(1)).toInt
        val m = v.agg(min("v").as("vmin"), max("v").as("vmax"))
        val bin = when(col("vmax") === col("vmin"), lit(0L))
          .otherwise(least(expr(s"((v - vmin) * $bins) div (vmax - vmin)"),
            lit(bins - 1L)))
        MStream(v.crossJoin(broadcast(m))
          .select(bin.as("bin"))
          .groupBy("bin").agg(count(lit(1)).as("n")))

      case "movingAvg" =>
        val v = vec(pos.head, env)
        requireLong(v, "movingAvg")
        val win = num(pos(1)).toInt
        require(win >= 1, "movingAvg window must be >= 1")
        // trailing window over the vector's own ord — exact integer sums,
        // then ONE deterministic double division per row
        val w = Window.orderBy(col("ord").asc).rowsBetween(-(win - 1), 0)
        MVec(v.select(col("ord"),
            (sum("v").over(w).cast("double") / win).as("v"))
          .where(col("ord") >= win - 1))

      case "zscores" =>
        val v = vec(pos.head, env)
        requireLong(v, "zscores")
        val m = v.agg(count(lit(1)).as("n"), sum("v").as("sv"),
          sum(col("v") * col("v")).as("sq"))
        val nD = col("n").cast("double")
        def d(c: String) = col(c).cast("double")
        val varE = (nD * d("sq") - d("sv") * d("sv")) / (nD * (nD - 1))
        MVec(v.crossJoin(broadcast(m))
          .select(col("ord"),
            ((col("v").cast("double") - d("sv") / nD) / sqrt(varE)).as("v")))

      case "percentile" =>
        val v = vec(pos.head, env)
        requireLong(v, "percentile")
        val p = num(pos(1))
        MStream(v.agg(percentile(col("v"), lit(p)).as("pct")))

      case other => sys.error(s"unknown math-stream function: $other")
    }
  }
}
