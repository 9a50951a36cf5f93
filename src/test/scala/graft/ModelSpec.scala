package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core._

/** Model-based testing of the order-coupled operator surface: random
  * pipelines of sort / take / drop / head / tail / init / filter are run
  * both through KFrame (ordering spec, id flips, logical-order machinery)
  * and through a trivially-correct in-memory list model implementing the
  * reference's semantics directly:
  *
  *  - sort asc = STABLE sort of the current row list
  *    (`Combinator.hs:228-237`);
  *  - sort desc = reverse of that stable asc — the reference's
  *    `Descending = reverse` quirk, which also reverses equal-key runs;
  *  - take/drop = Haskell list semantics; head/tail/init = 1-row slices;
  *  - typed filter keeps matching rows in current order.
  *
  * The model is a dozen lines over Vector[Row]; if KFrame's far more
  * intricate deferred-order implementation ever diverges under ANY
  * composition of these ops, a seed here catches it.
  */
class ModelSpec extends AnyFunSuite with Matchers {

  lazy val spark = TestSpark.spark

  lazy val base: KFrame = KFrame.fromCsvFile(spark, "src/test/resources/retail.csv")
  // model rows in frame order: (gender, city, product, year, sale, cost, discount)
  lazy val baseRows: Vector[Vector[Any]] = base.toOrderedDF.collect()
    .map(_.toSeq.toVector).toVector
  lazy val cols: Vector[String] = base.dataColumns.toVector

  private def numIdx(c: String) = cols.indexOf(c)

  sealed trait Op
  case class Sort(field: String, asc: Boolean) extends Op
  case class Take(n: Int) extends Op
  case class Drop(n: Int) extends Op
  case object Tail extends Op
  case object Init extends Op
  case class FilterGt(field: String, x: Double) extends Op

  private def applyModel(rows: Vector[Vector[Any]], op: Op): Vector[Vector[Any]] =
    op match {
      case Sort(f, asc) =>
        val i = numIdx(f)
        val sorted = rows.sortBy { r =>
          r(i) match {
            case d: java.lang.Double => Left(d.doubleValue): Either[Double, String]
            case other => Right(String.valueOf(other)): Either[Double, String]
          }
        }(Ordering.fromLessThan {
          case (Left(a), Left(b)) => a < b
          case (Right(a), Right(b)) => a < b
          case _ => false
        }) // sortBy is stable
        if (asc) sorted else sorted.reverse
      case Take(n) => rows.take(n)
      case Drop(n) => rows.drop(n)
      case Tail => rows.drop(1)
      case Init => rows.dropRight(1)
      case FilterGt(f, x) =>
        val i = numIdx(f)
        rows.filter(_(i).asInstanceOf[java.lang.Double].doubleValue > x)
    }

  private def applyFrame(kf: KFrame, op: Op): KFrame = op match {
    case Sort(f, asc) => kf.sort(f, asc)
    case Take(n) => kf.take(n)
    case Drop(n) => kf.drop(n)
    case Tail => kf.tail
    case Init => kf.init
    case FilterGt(f, x) => kf.filterNumber(f, (v: Double) => v > x)
  }

  private def randomOp(rnd: scala.util.Random): Op = rnd.nextInt(6) match {
    case 0 => Sort(cols(rnd.nextInt(cols.length)), rnd.nextBoolean())
    case 1 => Take(rnd.nextInt(15) - 1)
    case 2 => Drop(rnd.nextInt(15) - 1)
    case 3 => Tail
    case 4 => Init
    case 5 => FilterGt(Vector("sale", "cost", "discount")(rnd.nextInt(3)),
      Vector(300.0, 1500.0, 0.1)(rnd.nextInt(3)))
  }

  test("random prefix + groupby/aggregate(sum) matches the model (key-asc)") {
    // aggregate collapses the VISIBLE rows' groups to one row per key in
    // key-ascending order (Combinator.hs:66-68 sortOn snd); model = plain
    // groupBy + sum + sorted keys over whatever the random prefix left.
    val rnd = new scala.util.Random(4242L)
    val keyPool = Vector("gender", "city", "product")
    for (trial <- 1 to 20) {
      var model = baseRows
      var frame = base
      val ops = scala.collection.mutable.ArrayBuffer.empty[Op]
      for (_ <- 1 to 3) {
        var op = randomOp(rnd)
        while ((op == Tail || op == Init) && model.isEmpty) op = randomOp(rnd)
        ops += op
        model = applyModel(model, op)
        frame = applyFrame(frame, op)
      }
      val key = keyPool(rnd.nextInt(keyPool.length))
      val ki = numIdx(key)
      val vi = numIdx("sale")
      val want = model.groupBy(r => r(ki).asInstanceOf[String]).toVector
        .map { case (k, rs) =>
          Vector[Any](k,
            rs.map(_(vi).asInstanceOf[java.lang.Double].doubleValue).sum)
        }
        .sortBy(_(0).asInstanceOf[String])
      val got = frame.groupby(key).aggregate(Agg.sum, "sale")
        .toOrderedDF.collect().map(_.toSeq.toVector).toVector
      withClue(s"trial $trial ops=${ops.mkString(" -> ")} key=$key: ") {
        got.map(r => Vector(r(0),
          math.rint(r(1).asInstanceOf[Double] * 1e9) / 1e9)) shouldBe
          want.map(r => Vector(r(0),
            math.rint(r(1).asInstanceOf[Double] * 1e9) / 1e9))
      }
    }
  }

  test("pipeline results are independent of shuffle partition count") {
    // the same pipelines under a 3-partition session must produce byte-
    // identical results — order, ids, aggregates must never depend on
    // parallelism (the property that holds at 32 partitions locally and
    // thousands on a cluster).
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "3")
    val kf2 = KFrame.fromCsvFile(s2, "src/test/resources/retail.csv")
    def run(kf: KFrame): Seq[Seq[Any]] =
      kf.sort("cost", ascending = false).drop(3).tail
        .toOrderedDF.collect().map(_.toSeq).toSeq
    run(kf2) shouldBe run(base)
    def agg(kf: KFrame): Seq[Seq[Any]] =
      kf.filterNumber("sale", (v: Double) => v > 1000)
        .groupby("city").aggregate(Agg.sum, "sale")
        .toOrderedDF.collect().map(_.toSeq).toSeq
    agg(kf2) shouldBe agg(base)
  }

  test("random prefix + melt matches the model (var-major order)") {
    // melt output = for each var (argument order), every visible row in
    // frame order (`Combinator.hs:78-120`): id cols + fixed (variable,
    // value) columns. Exercises the id-stride renumber under whatever
    // non-contiguous ids / pending sorts the random prefix produced.
    val rnd = new scala.util.Random(99L)
    val valuePool = Vector("sale", "cost", "discount")
    for (trial <- 1 to 15) {
      var model = baseRows
      var frame = base
      val ops = scala.collection.mutable.ArrayBuffer.empty[Op]
      for (_ <- 1 to 3) {
        var op = randomOp(rnd)
        while ((op == Tail || op == Init) && model.isEmpty) op = randomOp(rnd)
        ops += op
        model = applyModel(model, op)
        frame = applyFrame(frame, op)
      }
      val ids = Seq("gender", "city").take(1 + rnd.nextInt(2))
      val vars = rnd.shuffle(valuePool).take(1 + rnd.nextInt(3))
      val want: Vector[Vector[Any]] = vars.toVector.flatMap { v =>
        val vi = numIdx(v)
        model.map(r => ids.toVector.map(c => r(numIdx(c))) ++
          Vector[Any](v, r(vi)))
      }
      val got = frame.melt(ids, vars).toOrderedDF.collect()
        .map(_.toSeq.toVector).toVector
      withClue(s"trial $trial ops=${ops.mkString(" -> ")} ids=$ids vars=$vars: ") {
        got shouldBe want
      }
    }
  }

  test("random order-coupled pipelines match the reference list model") {
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 1 to 40) {
      var model = baseRows
      var frame = base
      val ops = scala.collection.mutable.ArrayBuffer.empty[Op]
      for (_ <- 1 to 5) {
        var op = randomOp(rnd)
        // head/tail/init crash on empty in the reference — regenerate
        while ((op == Tail || op == Init) && model.isEmpty) op = randomOp(rnd)
        ops += op
        model = applyModel(model, op)
        frame = applyFrame(frame, op)
      }
      val got = frame.toOrderedDF.collect().map(_.toSeq.toVector).toVector
      withClue(s"trial $trial ops=${ops.mkString(" -> ")}: ") {
        got shouldBe model
      }
    }
  }
}
