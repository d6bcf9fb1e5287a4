package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.FrameEngine

/** Property tests from the SURVEY §5 plan: explosion row-count laws,
  * toPuffy∘toLong round-trip, shared-axis alignment counts. Uses raw
  * ScalaCheck generators with a fixed seed (deterministic, no
  * scalatestplus bridge needed offline).
  */
class PropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val rowGen: Gen[(List[Long], List[String])] = for {
    na <- Gen.choose(0, 4)
    a <- Gen.listOfN(na, Gen.choose(-100L, 100L))
    nb <- Gen.choose(0, 3)
    b <- Gen.listOfN(nb, Gen.alphaStr.map(s => s.take(4)))
  } yield (a, b)

  private def sampleTables(n: Int): Seq[List[(Long, List[Long], List[String])]] =
    (1 to n).map { i =>
      val seed = rng.Seed(i.toLong)
      val nRows = 1 + (i % 7)
      (0 until nRows).toList.map { r =>
        val (a, b) = rowGen.pureApply(Gen.Parameters.default, seed.slide.reseed(r))
        (r.toLong, a, b)
      }
    }

  test("toLong row count: |a|x|b| per key when both sides explode, " +
       "else the surviving side (full-outer merge semantics)") {
    sampleTables(15).foreach { rows =>
      val df = rows.toDF("k", "a", "b")
      val out = FrameEngine(df, Seq("k")).toLong()
      val expected = rows.map { case (_, a, b) =>
        if (a.nonEmpty && b.nonEmpty) a.size.toLong * b.size
        else a.size.toLong + b.size // outer merge keeps the non-empty side
      }.sum
      assert(out.count() === expected, s"rows=$rows")
    }
  }

  test("toPuffy(sorted) inverts toLong on array columns") {
    sampleTables(10).foreach { rows =>
      val nonEmpty = rows.filter(_._2.nonEmpty)
      if (nonEmpty.nonEmpty) {
        val df = nonEmpty.map(r => (r._1, r._2)).toDF("k", "a")
        val long = FrameEngine(df, Seq("k")).toLong("a")
        val back = FrameEngine(long, Seq("k", "a_level0"))
          .toPuffy(Seq("k"), keepMissingIdcs = false,
            aggfunc = (_, c) => sort_array(collect_list(c)))
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
        nonEmpty.foreach { case (k, a, _) =>
          assert(back(k) === a.sorted, s"key $k of $nonEmpty")
        }
      }
    }
  }

  test("shared axis yields max(|x|,|y|) rows per key (outer-aligned)") {
    sampleTables(15).foreach { rows =>
      val df = rows.map(r => (r._1, r._2, r._3)).toDF("k", "x", "y")
      val aligned = FrameEngine(df, Seq("k"))
        .toLong(sharedAxes = Map("axis" -> Map("x" -> 0, "y" -> 0)))
      val expected = rows.map { case (_, x, y) =>
        math.max(x.size, y.size).toLong
      }.sum
      assert(aligned.count() === expected, s"rows=$rows")
    }
  }
}
