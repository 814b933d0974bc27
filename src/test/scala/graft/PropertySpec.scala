package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.Clean

/** ScalaCheck property tests for the fragile scalar pieces (SURVEY.md §5.3):
  * the 4-format date parser (incl. its documented slash-format precedence),
  * garbage-to-null behavior, the contains-conditional weight (F8), and the
  * NaN scrubber (F2). Generators run seeded on the driver; each property is
  * checked in ONE Spark job over the generated table.
  */
class PropertySpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): List[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(42L))
      .getOrElse(fail("generator exhausted"))

  test("property: any rendered date parses per the coalesce precedence") {
    val gen = for {
      y <- Gen.choose(1900, 2030)
      m <- Gen.choose(1, 12)
      dd <- Gen.choose(1, 28)
      fmt <- Gen.choose(0, 3)
    } yield (y, m, dd, fmt)
    val cases = samples(gen, 400).map { case (y, m, dd, fmt) =>
      val rendered = fmt match {
        case 0 => f"$m%02d/$dd%02d/$y%04d"
        case 1 => f"$y%04d-$m%02d-$dd%02d"
        case 2 => f"$dd%02d-$m%02d-$y%04d"
        case 3 => f"$dd%02d/$m%02d/$y%04d"
      }
      // the reference tries MM/dd/yyyy first, so a dd/MM/yyyy rendering
      // with day ≤ 12 is (correctly, per reference semantics) read
      // month-first — the property encodes that precedence
      val (em, ed) = if (fmt == 3 && dd <= 12) (dd, m) else (m, dd)
      (rendered, f"$y%04d-$em%02d-$ed%02d")
    }
    val df = cases.toDF("dstr", "expected")
      .withColumn("parsed",
        date_format(Clean.parseDateMulti(col("dstr")), "yyyy-MM-dd"))
    val bad = df.filter(col("parsed").isNull ||
      col("parsed") =!= col("expected")).collect()
    assert(bad.isEmpty, bad.take(5).mkString("\n"))
  }

  test("property: digit-free garbage always parses to null") {
    val garbage = samples(Gen.asciiPrintableStr, 300)
      .map(_.take(30)).filter(s => s.nonEmpty && !s.exists(_.isDigit))
    assert(garbage.nonEmpty)
    val nonNull = garbage.toDF("dstr")
      .withColumn("parsed", Clean.parseDateMulti(col("dstr")))
      .filter(col("parsed").isNotNull).count()
    assert(nonNull == 0)
  }

  test("property: contains-conditional weight matches driver-side eval") {
    val gen = for {
      base <- Gen.alphaStr.map(_.take(20))
      insert <- Gen.oneOf("", "Cup", "Euro", "cup", "EURO")
      pos <- Gen.choose(0, 20)
    } yield {
      val p = math.min(pos, base.length)
      base.substring(0, p) + insert + base.substring(p)
    }
    val cases = samples(gen, 300).zipWithIndex.map(_.swap)
    val got = cases.toDF("id", "t")
      .withColumn("w",
        when(col("t").contains("Cup") || col("t").contains("Euro"), 1)
          .otherwise(100))
      .orderBy("id").select("w").collect().map(_.getInt(0))
    val want = cases.map { case (_, t) =>
      if (t.contains("Cup") || t.contains("Euro")) 1 else 100
    }
    assert(got.toSeq == want)
  }

  test("property: nanToNull removes every NaN, preserves everything else") {
    val gen = Gen.frequency(
      6 -> Gen.choose(-1e6, 1e6),
      2 -> Gen.const(Double.NaN),
      1 -> Gen.const(Double.PositiveInfinity),
      1 -> Gen.const(Double.NegativeInfinity))
    val cases = samples(gen, 400).zipWithIndex.map(_.swap)
    val scrubbed = Clean.nanToNull(cases.toDF("id", "x"), Seq("x"))
      .orderBy("id").select("x").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    cases.map(_._2).zip(scrubbed).foreach { case (in, out) =>
      if (in.isNaN) assert(out.isEmpty, "NaN survived")
      else assert(out.contains(in), s"$in changed to $out")
    }
  }
}
