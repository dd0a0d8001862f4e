package graft.functions

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Property fuzz over the native byte kernels — the custom codegen'd
  * expressions are the one place a byte-level bug would corrupt results
  * silently (no oracle catches a kernel that agrees with itself), so each
  * kernel is checked against an obviously-correct Scala reimplementation
  * on adversarial inputs: empty strings, runs, multi-byte UTF-8,
  * separator-only strings. Pure JVM — no SparkSession. */
class FnKernelsPropertySpec extends AnyFunSuite {

  /** Run a scalacheck property and fail the scalatest test on any
    * counterexample (no scalatest-plus bridge in the offline cache). */
  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private val wordGen: Gen[String] = Gen.oneOf(
    Gen.stringOfN(3, Gen.alphaLowerChar),
    Gen.oneOf("the", "a", "of", "x", "", "héllo", "日本語"),
    Gen.stringOfN(1, Gen.alphaLowerChar))

  private val textGen: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))

  test("topWordRun equals groupBy-count max frequency on arbitrary texts") {
    check(Prop.forAll(textGen) { text =>
      val expected = text.split(" ", -1).groupBy(identity)
        .values.map(_.length.toLong).max
      FnKernels.topWordRun(UTF8String.fromString(text)) == expected
    })
  }

  test("splitIndex equals Java split with trailing empties kept") {
    val sepGen = Gen.oneOf(",", "|", "ab", "é")
    check(Prop.forAll(textGen, sepGen, Gen.chooseNum(-1, 6)) { (text, sep, i) =>
      val got = FnKernels.splitIndex(UTF8String.fromString(text),
        UTF8String.fromString(sep), i)
      val parts = text.split(java.util.regex.Pattern.quote(sep), -1)
      val expected =
        if (i < 0 || i >= parts.length) null else parts(i)
      (got == null && expected == null) ||
        (got != null && got.toString == expected)
    })
  }

  test("keyValue finds the first-kvSep-prefixed pair or null") {
    val kvGen = for {
      keys <- Gen.listOf(Gen.stringOfN(2, Gen.alphaLowerChar))
      vals <- Gen.listOfN(keys.length, Gen.stringOfN(2, Gen.alphaNumChar))
    } yield keys.zip(vals)
    check(Prop.forAll(kvGen, Gen.stringOfN(2, Gen.alphaLowerChar)) { (pairs, probe) =>
      val s = pairs.map { case (k, v) => s"$k=$v" }.mkString("&")
      val got = FnKernels.keyValue(UTF8String.fromString(s),
        UTF8String.fromString("&"), UTF8String.fromString("="),
        UTF8String.fromString(probe))
      val expected = pairs.find(_._1 == probe).map(_._2).orNull
      (got == null && expected == null) ||
        (got != null && got.toString == expected)
    })
  }

  test("sortedIntersectSize equals Set intersection on arbitrary sorted " +
    "duplicate-free long arrays (incl. empties and disjoint ranges)") {
    val setGen: Gen[Array[Long]] = Gen.chooseNum(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-50L, 50L)))
      .map(_.distinct.sorted.toArray)
    check(Prop.forAll(setGen, setGen) { (a, b) =>
      val got = FnKernels.sortedIntersectSize(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(a),
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(b))
      got == a.toSet.intersect(b.toSet).size.toLong
    })
  }

  test("minHashSig96 equals the MinHashSig aggregator fold on arbitrary " +
    "hash arrays (any element order, incl. negatives and empties)") {
    val hashGen: Gen[Array[Long]] = Gen.chooseNum(0, 80).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Long.MinValue, Long.MaxValue)))
      .map(_.toArray)
    val agg = graft.operators.Dedup.MinHashSig
    check(Prop.forAll(hashGen) { hs =>
      val got = FnKernels.minHashSig96(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(hs))
        .toLongArray()
      val expected = hs.foldLeft(agg.zero)(agg.reduce)
      got.sameElements(expected)
    })
  }

  test("minHashBands96 equals Spark's XxHash64 expression over the " +
    "minHashSig96 band slices, for every divisor band count") {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val hashGen: Gen[Array[Long]] = Gen.chooseNum(0, 80).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Long.MinValue, Long.MaxValue)))
      .map(_.toArray)
    val bandsGen = Gen.oneOf(1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 96)
    check(Prop.forAll(hashGen, bandsGen) { (hs, bands) =>
      val rows = 96 / bands
      val sig = FnKernels.minHashSig96(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(hs))
        .toLongArray()
      // independent reference: the exact column construction the kernel
      // replaced — xxhash64(lit(b), sig slice) via Spark's own expression
      val expected = (0 until bands).map { b =>
        XxHash64(Literal(b) +: (0 until rows).map(k =>
          Literal(sig(b * rows + k))).toSeq, 42L).eval(null)
          .asInstanceOf[Long]
      }
      val got = FnKernels.minHashBands96(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(hs), bands)
        .toLongArray().toSeq
      got == expected
    })
  }

  test("shingleHashSet equals hashing the concat_ws-built n-gram strings " +
    "(multi-space runs, unicode, short/empty texts, n in 1..8 — covers " +
    "the shipped widths 3 (dedup), 6 (sketches), 8 (decontaminate))") {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val spacyTextGen: Gen[String] = Gen.chooseNum(0, 30).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf(wordGen, Gen.const(""), Gen.const(" "))))
      .map(_.mkString(" "))
    check(Prop.forAll(spacyTextGen, Gen.chooseNum(1, 8)) { (text, n) =>
      val words = text.split(" ", -1)
      val expected = (0 to words.length - n).map { i =>
        val u = UTF8String.fromString(words.slice(i, i + n).mkString(" "))
        XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      }.distinct.sorted
      val got = FnKernels.shingleHashSet(UTF8String.fromString(text), n)
        .toLongArray().toSeq
      got == expected
    })
  }

  test("isDigit/isAlpha/isDecimal agree with regex references") {
    val asciiish = Gen.listOf(Gen.oneOf(
      Gen.numChar, Gen.alphaChar, Gen.oneOf('+', '-', '.', ' ', 'é')))
      .map(_.mkString)
    check(Prop.forAll(asciiish) { s =>
      val u = UTF8String.fromString(s)
      FnKernels.isDigit(u) == s.matches("[0-9]+") &&
        FnKernels.isAlpha(u) == s.matches("[A-Za-z]+") &&
        FnKernels.isDecimal(u) ==
          s.matches("[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)")
    })
  }
}
