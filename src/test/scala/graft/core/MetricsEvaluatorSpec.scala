package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Expression bind/rewrite + file-skipping evaluator semantics
  * (visitors tests + planned-file-set assertions over synthetic stats). */
class MetricsEvaluatorSpec extends AnyFunSuite {

  val schema: Schema = Schema(0, StructT(Seq(
    NestedField(1, "id", LongT, required = true),
    NestedField(2, "name", StringT),
    NestedField(3, "price", DoubleT),
    NestedField(4, "qty", IntT))))

  test("rewriteNot pushes NOT to leaves (NNF)") {
    val e = Not(And(Expr.equalTo("id", LongLit(1)), Expr.isNull("name")))
    val n = Expr.rewriteNot(e)
    assert(n == Or(UnboundPredicate(OpNotEq, "id", Seq(LongLit(1))),
      UnboundPredicate(OpNotNull, "name")))
    assert(Expr.rewriteNot(Not(Not(AlwaysTrue))) == AlwaysTrue)
  }

  test("bind resolves names and casts literals") {
    val b = Expr.bind(schema, Expr.equalTo("qty", LongLit(5)))
    b match {
      case BoundPredicate(OpEq, f, Seq(lit)) =>
        assert(f.id == 4); assert(lit == IntLit(5))
      case other => fail(s"unexpected: $other")
    }
    // out-of-range literal saturates at bind time
    val s = Expr.bind(schema, Expr.greaterThan("qty", LongLit(Long.MaxValue)))
    s match {
      case BoundPredicate(OpGt, _, Seq(lit)) => assert(lit == IntAboveMax)
      case other => fail(s"unexpected: $other")
    }
  }

  test("bind null checks on required columns fold to constants") {
    assert(Expr.bind(schema, Expr.isNull("id")) == AlwaysFalse)
    assert(Expr.bind(schema, Expr.notNull("id")) == AlwaysTrue)
  }

  test("bind case sensitivity") {
    intercept[IllegalArgumentException](Expr.bind(schema, Expr.equalTo("ID", LongLit(1))))
    assert(Expr.bind(schema, Expr.equalTo("ID", LongLit(1)), caseSensitive = false)
      .isInstanceOf[BoundPredicate])
  }

  private def stats(rows: Long, lower: Map[Int, Literal] = Map.empty,
                    upper: Map[Int, Literal] = Map.empty,
                    nulls: Map[Int, Long] = Map.empty,
                    vals: Map[Int, Long] = Map.empty,
                    nans: Map[Int, Long] = Map.empty): FileStats =
    FileStats(rows,
      valueCounts = vals, nullCounts = nulls, nanCounts = nans,
      lowerBounds = lower.map { case (k, v) => k -> v.toBytes },
      upperBounds = upper.map { case (k, v) => k -> v.toBytes })

  test("record count short circuits") {
    val ev = new InclusiveMetricsEvaluator(schema, Expr.equalTo("id", LongLit(5)))
    assert(!ev.eval(stats(0))) // empty file → skip
    assert(ev.eval(stats(-1))) // legacy avro -1 → keep
  }

  test("equality against bounds") {
    val ev = new InclusiveMetricsEvaluator(schema, Expr.equalTo("id", LongLit(5)))
    assert(ev.eval(stats(10, Map(1 -> LongLit(0)), Map(1 -> LongLit(10)))))
    assert(!ev.eval(stats(10, Map(1 -> LongLit(6)), Map(1 -> LongLit(10)))))
    assert(!ev.eval(stats(10, Map(1 -> LongLit(0)), Map(1 -> LongLit(4)))))
    // missing stats → keep
    assert(ev.eval(stats(10)))
  }

  test("range predicates against bounds") {
    def ev(e: BooleanExpression) = new InclusiveMetricsEvaluator(schema, e)
    val f = stats(10, Map(1 -> LongLit(10)), Map(1 -> LongLit(20)))
    assert(!ev(Expr.lessThan("id", LongLit(10))).eval(f))
    assert(ev(Expr.lessThanOrEq("id", LongLit(10))).eval(f))
    assert(!ev(Expr.greaterThan("id", LongLit(20))).eval(f))
    assert(ev(Expr.greaterThanOrEq("id", LongLit(20))).eval(f))
    assert(ev(Expr.greaterThan("id", LongLit(19))).eval(f))
    assert(!ev(Expr.greaterThanOrEq("id", LongLit(21))).eval(f))
  }

  test("in predicate") {
    val ev = new InclusiveMetricsEvaluator(schema,
      Expr.in("id", Seq(LongLit(1), LongLit(25))))
    assert(!ev.eval(stats(10, Map(1 -> LongLit(10)), Map(1 -> LongLit(20)))))
    val ev2 = new InclusiveMetricsEvaluator(schema,
      Expr.in("id", Seq(LongLit(1), LongLit(15))))
    assert(ev2.eval(stats(10, Map(1 -> LongLit(10)), Map(1 -> LongLit(20)))))
  }

  test("null count predicates") {
    val isNull = new InclusiveMetricsEvaluator(schema, Expr.isNull("name"))
    assert(!isNull.eval(stats(10, nulls = Map(2 -> 0L))))
    assert(isNull.eval(stats(10, nulls = Map(2 -> 3L))))
    assert(isNull.eval(stats(10))) // unknown → keep

    val notNull = new InclusiveMetricsEvaluator(schema, Expr.notNull("name"))
    assert(!notNull.eval(stats(10, nulls = Map(2 -> 10L), vals = Map(2 -> 10L))))
    assert(notNull.eval(stats(10, nulls = Map(2 -> 3L), vals = Map(2 -> 10L))))
  }

  test("only-null and only-nan columns cannot match equality") {
    val ev = new InclusiveMetricsEvaluator(schema, Expr.equalTo("price", DoubleLit(1.0)))
    assert(!ev.eval(stats(10, nulls = Map(3 -> 10L), vals = Map(3 -> 10L))))
    assert(!ev.eval(stats(10, nans = Map(3 -> 10L), vals = Map(3 -> 10L))))
  }

  test("NaN bounds are ignored (might match)") {
    val ev = new InclusiveMetricsEvaluator(schema, Expr.equalTo("price", DoubleLit(1.0)))
    assert(ev.eval(stats(10, Map(3 -> DoubleLit(Double.NaN)), Map(3 -> DoubleLit(Double.NaN)))))
  }

  test("string startsWith bounds") {
    val ev = new InclusiveMetricsEvaluator(schema, Expr.startsWith("name", "ice"))
    assert(ev.eval(stats(10, Map(2 -> StrLit("iac")), Map(2 -> StrLit("ind")))))
    assert(!ev.eval(stats(10, Map(2 -> StrLit("j")), Map(2 -> StrLit("k")))))
    assert(!ev.eval(stats(10, Map(2 -> StrLit("a")), Map(2 -> StrLit("h")))))
  }

  test("not-equal always might match") {
    val ev = new InclusiveMetricsEvaluator(schema, Expr.notEqualTo("id", LongLit(5)))
    assert(ev.eval(stats(10, Map(1 -> LongLit(5)), Map(1 -> LongLit(5)))))
  }

  test("and/or composition over stats") {
    val e = And(Expr.greaterThan("id", LongLit(15)), Expr.lessThan("qty", IntLit(3)))
    val ev = new InclusiveMetricsEvaluator(schema, e)
    val hit = stats(10, Map(1 -> LongLit(10), 4 -> IntLit(0)),
      Map(1 -> LongLit(20), 4 -> IntLit(10)))
    val miss = stats(10, Map(1 -> LongLit(10), 4 -> IntLit(5)),
      Map(1 -> LongLit(20), 4 -> IntLit(10)))
    assert(ev.eval(hit))
    assert(!ev.eval(miss))
  }

  test("planned file set exactness over a synthetic battery") {
    // 5 files with id ranges [0,9],[10,19],...,[40,49]
    val files = (0 until 5).map(i =>
      stats(10, Map(1 -> LongLit(i * 10L)), Map(1 -> LongLit(i * 10L + 9))))
    def planned(e: BooleanExpression): Seq[Int] = {
      val ev = new InclusiveMetricsEvaluator(schema, e)
      files.zipWithIndex.collect { case (f, i) if ev.eval(f) => i }
    }
    assert(planned(Expr.equalTo("id", LongLit(25))) == Seq(2))
    assert(planned(Expr.lessThan("id", LongLit(15))) == Seq(0, 1))
    assert(planned(Expr.greaterThanOrEq("id", LongLit(30))) == Seq(3, 4))
    assert(planned(Or(Expr.lessThan("id", LongLit(5)),
      Expr.greaterThan("id", LongLit(44)))) == Seq(0, 4))
    assert(planned(Expr.equalTo("id", LongLit(100))).isEmpty)
  }
}
