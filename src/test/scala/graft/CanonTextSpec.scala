package graft

import org.apache.spark.sql.functions._

/** graft_canon must equal the declarative chain it replaces —
  * trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""),
  * " +", " ")) — byte-for-byte, because d13's md5(canon) grouping keys
  * are row-compared against the DuckDB oracle, which keeps computing
  * the regex formulation.
  */
class CanonTextSpec extends SparkSpec {
  import spark.implicits._

  private val chain = trim(regexp_replace(
    regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))

  private def both(texts: Seq[String]): Seq[(String, String, String)] =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .select($"text", expr("graft_canon(text)").as("fast"), chain.as("slow"))
      .collect().toSeq.map(r => (r.getString(0), r.getString(1), r.getString(2)))

  test("edge cases equal the regex chain (incl. unicode lowering into ascii)") {
    val cases = Seq(
      "", " ", "   ", "a", "A", "  Hello,   WORLD!!  ",
      "a . b", "a.b", "a\tb", "a\nb", "a\r\nb", "tabs\t\tand  spaces",
      "123-456", "...", "!@#$%", "x  !!  y",
      // unicode whose LOWERCASE lands inside [a-z0-9 ]: the strip must
      // see the lowered form, so a drop-non-ascii shortcut would diverge
      "İstanbul",       // İ -> full lowering i + combining dot
      "Kelvin",         // Kelvin sign -> k
      "ſs",             // long s ſ (lowercase already, stripped? no: ſ is not [a-z])
      "STRASSE ß",      // ß stays ß -> stripped
      "ı dotless",      // Turkish dotless ı -> stripped
      "café au lait", "中文 mixed 中", "éclair", // combining acute
      "nb sp",          // NBSP is not the space char -> stripped, no split
      "emoji 🎼 note", "𝄞 clef",
      "ǅungeon",        // titlecase Dž -> dž
      "ABCİDEF GHIKJKL")
    for ((t, fast, slow) <- both(cases))
      assert(fast === slow, s"input ${t.map(c => f"\\u${c.toInt}%04x").mkString}")
  }

  test("property: equals the regex chain on 2000 random strings") {
    // deterministic seeded generator, two modes: ascii-ish (exercises
    // the fast path's branchy cases) and unicode soup (forces the
    // fallback, weighted toward chars whose lowercase lands in ascii)
    val rnd = new scala.util.Random(0xd13)
    val special = "\u0130\u212a\u00df\u00e9\u4e2d\u0301 \ud834\udd1e\u01c5\u0131"
    def asciiish(): String = Seq.fill(rnd.nextInt(40))(rnd.nextInt(12) match {
      case n if n < 6 => ('a' + rnd.nextInt(26)).toChar
      case 6 | 7 => ('A' + rnd.nextInt(26)).toChar
      case 8 => ('0' + rnd.nextInt(10)).toChar
      case 9 | 10 => ' '
      case _ => rnd.nextInt(128).toChar
    }).mkString
    def soup(): String = Seq.fill(rnd.nextInt(30))(rnd.nextInt(8) match {
      case n if n < 3 => ('a' + rnd.nextInt(26)).toChar.toString
      case 3 => " "
      case 4 | 5 => special(rnd.nextInt(special.length)).toString
      case _ => (0x20 + rnd.nextInt(0x2fe0)).toChar.toString
    }).mkString
    val texts = Seq.fill(1000)(asciiish()) ++ Seq.fill(1000)(soup())
    for ((t, fast, slow) <- both(texts))
      assert(fast === slow, s"input ${t.map(c => f"\\u${c.toInt}%04x").mkString}")
  }

  test("null text yields null, not a crash") {
    val rows = Seq((1L, Option("A b")), (2L, Option.empty[String]))
      .toDF("id", "text")
      .select($"id", expr("graft_canon(text)").as("c"))
      .orderBy($"id").collect()
    assert(rows(0).getString(1) === "a b")
    assert(rows(1).isNullAt(1))
  }

  test("stays inside whole-stage codegen") {
    val plan = spark.range(10)
      .select(expr("graft_canon(concat('A b ', id))").as("c"))
      .queryExecution.executedPlan
    val fused = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(fused.nonEmpty, s"expected a WholeStageCodegen stage in:\n$plan")
    assert(fused.exists(_.toString.contains("graft_canon")),
      s"expression must sit INSIDE the fused stage:\n$plan")
  }
}
