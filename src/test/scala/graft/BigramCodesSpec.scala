package graft

import org.apache.spark.sql.functions._

/** graft_bigram_codes must agree with the string bigram formulation —
  * same multiset per row (via an injective, order-preserving encoding)
  * — because t01's profile counts, tie-breaks, and intersections all
  * ride on that equivalence while the DuckDB oracle keeps computing
  * two-char strings.
  */
class BigramCodesSpec extends SparkSpec {
  import spark.implicits._

  private val cases = Seq(
    (1L, "abab"),
    (2L, "a"),                 // one codepoint -> empty
    (3L, ""),                  // empty -> empty
    (4L, "hello world"),
    (5L, "café au lait"), // 2-byte é
    (6L, "中文 mixed 中"), // 3-byte CJK
    (7L, "g clef 𝄞 here"),  // astral (surrogate pair)
    (8L, "𝄞𝄞")   // adjacent astral pair
  )

  test("codes equal the codepoint-pair encoding of the string bigrams") {
    val df = cases.toDF("id", "text")
      .select($"id", expr("graft_bigram_codes(text)").as("codes"))
    val got = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    for ((id, text) <- cases) {
      val cps = text.codePoints().toArray
      val want = cps.zip(cps.drop(1)).map { case (a, b) => a.toLong * 0x110000L + b }
      assert(got(id) === want.toSeq, s"row $id ('$text')")
    }
  }

  test("numeric code order equals binary string order of the bigrams") {
    // UTF-8 byte order is codepoint order, so sorting pair codes must
    // sort exactly like sorting the concatenated two-char strings — the
    // property t01's profile tie-break (bg ASC) relies on.
    val bigrams = cases.flatMap { case (_, text) =>
      val cps = text.codePoints().toArray
      cps.zip(cps.drop(1)).map { case (a, b) =>
        (new String(Character.toChars(a)) + new String(Character.toChars(b)),
          a.toLong * 0x110000L + b)
      }
    }.distinct
    val byString = bigrams.sortBy(_._1).map(_._2)
    val byCode = bigrams.map(_._2).sorted
    assert(byString === byCode)
    // and Spark's own string comparison agrees with the Java sort above
    val sparkSorted = bigrams.map(_._1).toDF("bg")
      .orderBy($"bg".asc).collect().map(_.getString(0)).toSeq
    assert(sparkSorted === bigrams.map(_._1).sorted)
  }

  test("null text yields null, not a crash") {
    val df = Seq((1L, Option("ab")), (2L, Option.empty[String]))
      .toDF("id", "text")
      .select($"id", expr("graft_bigram_codes(text)").as("codes"))
    val rows = df.orderBy($"id").collect()
    assert(rows(0).getSeq[Long](1) === Seq('a'.toLong * 0x110000L + 'b'.toLong))
    assert(rows(1).isNullAt(1))
  }

  test("stays inside whole-stage codegen") {
    // a non-foldable input (LocalTableScan with a literal gets constant-
    // folded away entirely): range -> concat -> codes must fuse into one
    // codegen stage
    val plan = spark.range(10)
      .select(expr("graft_bigram_codes(concat('ab', id))").as("codes"))
      .queryExecution.executedPlan
    val fused = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(fused.nonEmpty, s"expected a WholeStageCodegen stage in:\n$plan")
    assert(fused.exists(_.toString.contains("graft_bigram_codes")),
      s"expression must sit INSIDE the fused stage:\n$plan")
  }
}
