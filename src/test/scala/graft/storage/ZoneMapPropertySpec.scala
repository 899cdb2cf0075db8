package graft.storage

import org.apache.spark.sql.Row
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** PROPERTY-BASED soundness of file-level zone-map pruning: for randomly
  * generated data and randomly generated predicates, a file containing
  * ANY row the predicate would return must never be pruned. (The spec
  * complements FileZoneMapSpec's example matrix: examples prove the
  * pruner CAN refute; the property proves it never refutes wrongly —
  * the one direction that would silently lose data at 100 TB.)
  *
  * Matching follows SQL semantics: a row matches when the predicate
  * evaluates to TRUE — null comparisons are not-matched, which is also
  * exactly the set a pruned scan must preserve. */
class ZoneMapPropertySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("i", IntegerType),
    StructField("s", StringType),
    StructField("d", DoubleType)))

  private val genRow: Gen[Row] = for {
    i <- Gen.oneOf(Gen.const(null),
      Gen.chooseNum(-1000, 1000).map(Integer.valueOf))
    s <- Gen.oneOf(Gen.const(null),
      Gen.oneOf("a", "b", "mm", "n5", "n50", "zz", "", " x"))
    d <- Gen.oneOf(Gen.const(null),
      Gen.oneOf(-1.5, 0.0, 2.25, 999.75).map(java.lang.Double.valueOf))
  } yield Row(i, s, d)

  private def genPred: Gen[Filter] = {
    val ints: Gen[Any] = Gen.chooseNum(-1100, 1100).map(Integer.valueOf)
    val strs: Gen[Any] = Gen.oneOf("a", "b", "mm", "n5", "zz", "", "q")
    val dbls: Gen[Any] = Gen.oneOf(-2.0, -1.5, 0.0, 2.25, 500.0)
      .map(java.lang.Double.valueOf)
    def leaf(col: String, v: Gen[Any]): Gen[Filter] = Gen.oneOf(
      v.map(EqualTo(col, _)), v.map(LessThan(col, _)),
      v.map(GreaterThan(col, _)), v.map(LessThanOrEqual(col, _)),
      v.map(GreaterThanOrEqual(col, _)),
      Gen.listOfN(3, v).map(vs => In(col, vs.toArray)),
      Gen.const(IsNull(col)), Gen.const(IsNotNull(col)))
    val anyLeaf = Gen.oneOf(leaf("i", ints), leaf("s", strs), leaf("d", dbls))
    Gen.oneOf(
      anyLeaf,
      Gen.zip(anyLeaf, anyLeaf).map { case (a, b) => And(a, b) },
      Gen.zip(anyLeaf, anyLeaf).map { case (a, b) => Or(a, b) })
  }

  /** SQL-TRUE evaluation of a pushed filter over a row. */
  private def matches(f: Filter, r: Row): Boolean = {
    def v(c: String): Any = r.get(schema.fieldIndex(c))
    def cmp(c: String, x: Any): Option[Int] = {
      val a = v(c)
      if (a == null || x == null) None
      else Some((a, x) match {
        case (a: Integer, x: Integer) => a.compareTo(x)
        case (a: String, x: String) => a.compareTo(x)
        case (a: java.lang.Double, x: java.lang.Double) => a.compareTo(x)
        case other => fail(s"unexpected comparison $other")
      })
    }
    f match {
      case EqualTo(c, x) => cmp(c, x).contains(0)
      case LessThan(c, x) => cmp(c, x).exists(_ < 0)
      case GreaterThan(c, x) => cmp(c, x).exists(_ > 0)
      case LessThanOrEqual(c, x) => cmp(c, x).exists(_ <= 0)
      case GreaterThanOrEqual(c, x) => cmp(c, x).exists(_ >= 0)
      case In(c, xs) => xs.exists(x => cmp(c, x).contains(0))
      case IsNull(c) => v(c) == null
      case IsNotNull(c) => v(c) != null
      case And(a, b) => matches(a, r) && matches(b, r)
      case Or(a, b) => matches(a, r) || matches(b, r)
      case other => fail(s"unexpected filter $other")
    }
  }

  test("a file holding any TRUE row survives pruning (500 random predicates)") {
    import spark.implicits._
    var seed = Seed(20260812L)
    def next[T](g: Gen[T]): T = {
      var out: Option[T] = None
      while (out.isEmpty) { seed = seed.next; out = g(Gen.Parameters.default, seed) }
      out.get
    }
    val loc = tmpDir("zm-prop") + "/t"
    val t = GraftTable.create(spark, loc, schema)
    // four appends of 25 random rows; remember which file got which rows
    val fileRows = scala.collection.mutable.Map[String, Seq[Row]]()
    for (_ <- 1 to 4) {
      val rows = Seq.fill(25)(next(genRow))
      val before = t.committedFiles.toSet
      t.append(spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema).coalesce(1))
      val added = t.committedFiles.toSet -- before
      assert(added.size === 1)
      fileRows(added.head) = rows
    }
    var refuted = 0
    for (_ <- 1 to 500) {
      val pred = next(genPred)
      val keptNames = t.prunedFiles(Seq(pred)).map(_.split('/').takeRight(2).mkString("/")).toSet
      fileRows.foreach { case (file, rows) =>
        val hasMatch = rows.exists(matches(pred, _))
        val kept = keptNames.exists(k => file.endsWith(k) || k.endsWith(file))
        if (!kept) refuted += 1
        assert(!hasMatch || kept,
          s"UNSOUND: $pred refuted file $file which holds a matching row")
      }
    }
    assert(refuted > 0, "degenerate test: no predicate ever pruned anything")
    // end-to-end: a DSv2 read under a random filter returns exactly the
    // SQL-TRUE rows (pruning composes with the parquet residual filters)
    val df = spark.read.format("graft").load(loc)
    val all = fileRows.values.flatten.toSeq
    for (_ <- 1 to 20) {
      val pred = next(genPred)
      val expected = all.count(matches(pred, _))
      val got = df.filter(toColumn(pred)).count()
      assert(got === expected.toLong, s"read under $pred")
    }
    GraftTable.drop(loc)
  }

  private def toColumn(f: Filter): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, lit}
    f match {
      case EqualTo(c, x) => col(c) === lit(x)
      case LessThan(c, x) => col(c) < lit(x)
      case GreaterThan(c, x) => col(c) > lit(x)
      case LessThanOrEqual(c, x) => col(c) <= lit(x)
      case GreaterThanOrEqual(c, x) => col(c) >= lit(x)
      case In(c, xs) => col(c).isin(xs.toIndexedSeq.map(lit(_)): _*)
      case IsNull(c) => col(c).isNull
      case IsNotNull(c) => col(c).isNotNull
      case And(a, b) => toColumn(a) && toColumn(b)
      case Or(a, b) => toColumn(a) || toColumn(b)
      case other => fail(s"unexpected filter $other")
    }
  }
}
