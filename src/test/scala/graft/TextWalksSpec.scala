package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.SharedHash

/** The three r13 byte-walk expressions must equal — value-for-value —
  * the declarative chains they replaced, because the DuckDB oracle keeps
  * computing the original formulations (t04/t08/t11 oracle SQL is
  * unchanged). Each test compares the walk against the exact r12 Spark
  * chain on the same rows: targeted edge cases, seeded random soup, and
  * the real fixture corpus.
  */
class TextWalksSpec extends SparkSpec {
  import spark.implicits._

  private def df(texts: Seq[String]): DataFrame =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")

  private val rnd = new scala.util.Random(0xc13)

  // ---------------------------------------------------------------- t04

  /** The r12 t04 chain, spelled as columns over `text` for window n. */
  private def fpChainCols(n: Int) = {
    val wins = expr(
      s"CASE WHEN size(split(text, '\\\\s+')) >= $n THEN " +
        s"transform(sequence(1, size(split(text, '\\\\s+'))-${n - 1}), " +
        s"i -> cast(conv(substring(md5(concat_ws(' ', slice(split(text, '\\\\s+'), i, $n))), 1, 15), 16, 10) AS BIGINT) % ${SharedHash.P31}) " +
        "ELSE array() END")
    Seq(
      coalesce(array_min(wins), lit(0L)).as("slow_fp"),
      size(wins).cast("long").as("slow_nw"),
      size(array_distinct(wins)).cast("long").as("slow_nd"))
  }

  private def checkFp(texts: Seq[String], n: Int): Unit = {
    val rows = df(texts)
      .select(col("text"), expr(s"graft_ngram_fp(text, $n)").as("fp"),
        struct(fpChainCols(n): _*).as("slow"))
      .select(col("text"),
        col("fp.fingerprint"), col("fp.n_windows"), col("fp.n_distinct_windows"),
        col("slow.slow_fp"), col("slow.slow_nw"), col("slow.slow_nd"))
      .collect()
    for (r <- rows) {
      assert(r.getLong(2) === r.getLong(5), s"n_windows for '${r.getString(0)}'")
      assert(r.getLong(3) === r.getLong(6), s"n_distinct for '${r.getString(0)}'")
      if (r.getLong(2) > 0) // fingerprint only defined when windows exist
        assert(r.getLong(1) === r.getLong(4), s"fingerprint for '${r.getString(0)}'")
    }
  }

  private def wordSoup(maxWords: Int): String = {
    val vocab = Seq("scan", "agg", "row", "k", "merge", "x1", "a", "b", "c", "", "émü", "中文")
    Seq.fill(rnd.nextInt(maxWords))(vocab(rnd.nextInt(vocab.length)))
      .mkString(Seq(" ", "  ", "\t", " \n")(rnd.nextInt(4)))
  }

  test("graft_ngram_fp(4 and 3) equals the t04 declarative chain") {
    val edge = Seq("", " ", "a", "a b c", "a b c d", "a b c d e",
      "a a a a a a", "x  y\tz  w", " lead a b c d", "trail a b c d ",
      "a b c d a b c d a b c d")
    checkFp(edge ++ Seq.fill(300)(wordSoup(30)), 4)
    checkFp(edge ++ Seq.fill(300)(wordSoup(30)), 3)
  }

  test("graft_ngram_fp matches on the fixture corpus (sf0.001 documents)") {
    checkFp(spark.read.parquet(s"$sf/documents.parquet")
      .select(col("text")).as[String].collect().toSeq, 4)
  }

  test("graft_ngram_h60 equals the declarative h60-of-window chain (n=4 and 2)") {
    for (n <- Seq(4, 2)) {
      val slow = expr(
        s"CASE WHEN size(split(text, '\\\\s+')) >= $n THEN " +
          s"transform(sequence(1, size(split(text, '\\\\s+'))-${n - 1}), " +
          s"i -> cast(conv(substring(md5(concat_ws(' ', slice(split(text, '\\\\s+'), i, $n))), 1, 15), 16, 10) AS BIGINT)) " +
          "ELSE array() END")
      val texts = Seq("", " ", "a", "a b c d", " x y z w q ", "a a a a a") ++
        Seq.fill(200)(wordSoup(25))
      val rows = df(texts)
        .select(col("text"), expr(s"graft_ngram_h60(text, $n)").as("fast"), slow.as("slow"))
        .collect()
      for (r <- rows)
        assert(r.getSeq[Long](1) === r.getSeq[Long](2), s"n=$n text='${r.getString(0)}'")
    }
  }

  // ---------------------------------------------------------------- t03

  private def checkTokenCounts(texts: Seq[String]): Unit = {
    val tokenRegex = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
    val rows = df(texts)
      .select(col("text"), expr("graft_token_counts(text)").as("tc"),
        size(split(col("text"), "\\s+")).cast("long").as("s_ws"),
        size(regexp_extract_all(col("text"), lit(tokenRegex), lit(0))).cast("long").as("s_rx"),
        length(col("text")).cast("long").as("s_nc"),
        (length(col("text")) - length(regexp_replace(col("text"), "\\s+", "")))
          .cast("long").as("s_nws"))
      .select(col("text"), col("tc.ws_tokens"), col("tc.regex_tokens"),
        col("tc.n_chars"), col("tc.n_ws_chars"),
        col("s_ws"), col("s_rx"), col("s_nc"), col("s_nws"))
      .collect()
    for (r <- rows; (i, j, what) <- Seq((1, 5, "ws_tokens"), (2, 6, "regex_tokens"),
        (3, 7, "n_chars"), (4, 8, "n_ws_chars")))
      assert(r.getLong(i) === r.getLong(j), s"$what for '${r.getString(0)}'")
  }

  test("graft_token_counts equals the split/regex chain") {
    checkTokenCounts(Seq(
      "", " ", "  ", "a", "ab12cd", "a_b-c", "...", "a.b.c",
      " lead", "trail ", "\t\n mixed \r", "12345", "a1b2c3",
      "中文 mixed 中", "émü café", "🎼 note", "𝄞x9", "ÀÉ12ab",
      "word, and; punct! (x)") ++ Seq.fill(300)(wordSoup(30)))
  }

  test("graft_token_counts matches on the fixture corpus") {
    checkTokenCounts(spark.read.parquet(s"$sf/documents.parquet")
      .select(col("text")).as[String].collect().toSeq)
  }

  // ---------------------------------------------------------------- t08

  /** The r12 t08 computation (explode → two groupBy chains) via SQL. */
  private def repSlow(texts: Seq[String]): Map[Long, (Long, Long, Long, Long)] = {
    df(texts).createOrReplaceTempView("rep_in")
    val rows = spark.sql(
      """WITH w AS (SELECT id, explode(split(text, '\\s+')) AS word FROM rep_in),
        |wc AS (SELECT id, word, count(*) AS c FROM w GROUP BY 1, 2),
        |ws AS (SELECT id, max(c) AS max_word_freq, sum(c) AS n_words FROM wc GROUP BY 1),
        |tg AS (SELECT id, explode(CASE WHEN size(split(text, '\\s+')) >= 3
        |         THEN transform(sequence(1, size(split(text, '\\s+'))-2),
        |              i -> concat_ws(' ', slice(split(text, '\\s+'), i, 3)))
        |         ELSE array() END) AS tg FROM rep_in),
        |ts AS (SELECT id, count(*) AS n_trigrams,
        |              count(DISTINCT tg) AS n_distinct_trigrams FROM tg GROUP BY 1)
        |SELECT ws.id, n_words, max_word_freq,
        |       coalesce(n_trigrams, 0) AS n_trigrams,
        |       coalesce(n_distinct_trigrams, 0) AS n_distinct
        |FROM ws LEFT JOIN ts ON ws.id = ts.id""".stripMargin).collect()
    rows.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
  }

  private def checkRep(texts: Seq[String]): Unit = {
    val slow = repSlow(texts)
    val fast = df(texts)
      .select(col("id"), expr("graft_rep_stats(text)").as("r"))
      .select(col("id"), col("r.n_words"), col("r.max_word_freq"),
        col("r.n_trigrams"), col("r.n_distinct_trigrams"))
      .collect()
    assert(fast.length === texts.length)
    for (r <- fast) {
      val (nw, mf, nt, nd) = slow(r.getLong(0))
      val t = texts(r.getLong(0).toInt)
      assert(r.getLong(1) === nw, s"n_words for '$t'")
      assert(r.getLong(2) === mf, s"max_word_freq for '$t'")
      assert(r.getLong(3) === nt, s"n_trigrams for '$t'")
      assert(r.getLong(4) === nd, s"n_distinct_trigrams for '$t'")
    }
  }

  test("graft_rep_stats equals the exploded two-aggregate form") {
    val edge = Seq("", " ", "  ", "a", "a a", "a a a", "a b a b a b",
      "a a a a a a a a", " lead pad a b", "trail a b ", "x\t\ty z",
      "a b a b c a b a b c", "same same same")
    checkRep(edge ++ Seq.fill(300)(wordSoup(40)))
  }

  test("graft_rep_stats matches on the fixture corpus (sf0.001 documents)") {
    checkRep(spark.read.parquet(s"$sf/documents.parquet")
      .select(col("text")).as[String].collect().toSeq)
  }

  // ---------------------------------------------------------------- t11

  /** The r12 t11 chain (Java regex via Spark functions). */
  private def piiSlowCols = {
    import graft.operators.TextAnalysis.{AcctRe, EmailRe, PhoneRe}
    val redacted = regexp_replace(regexp_replace(regexp_replace(
      col("text"), lit(EmailRe), lit("<EMAIL>")),
      lit(PhoneRe), lit("<PHONE>")),
      lit(AcctRe), lit("<ACCT>"))
    Seq(
      size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))).cast("long").as("s_em"),
      size(regexp_extract_all(col("text"), lit(PhoneRe), lit(0))).cast("long").as("s_ph"),
      size(regexp_extract_all(col("text"), lit(AcctRe), lit(0))).cast("long").as("s_ac"),
      md5(redacted).as("s_hash"))
  }

  private def checkPii(texts: Seq[String]): Unit = {
    val rows = df(texts)
      .select(col("text"), expr("graft_pii_stats(text)").as("p"),
        struct(piiSlowCols: _*).as("s"))
      .select(col("text"),
        col("p.n_emails"), col("p.n_phones"), col("p.n_accts"), col("p.redacted_hash"),
        col("s.s_em"), col("s.s_ph"), col("s.s_ac"), col("s.s_hash"))
      .collect()
    for (r <- rows) {
      val t = r.getString(0)
      assert(r.getLong(1) === r.getLong(5), s"n_emails for '$t'")
      assert(r.getLong(2) === r.getLong(6), s"n_phones for '$t'")
      assert(r.getLong(3) === r.getLong(7), s"n_accts for '$t'")
      assert(r.getString(4) === r.getString(8), s"redacted_hash for '$t'")
    }
  }

  private def piiSoup(): String = {
    val parts = Seq("@", ".", "-", "_", "%", "+", " ", "a", "Z", "q", "0", "1",
      "9", "5", "com", "org", "123", "555-", "@ex", ".co", "café", "中",
      "a@b.cc", "123-456-7890", "123456789", "x@y", "@@", "..", "--", "  ")
    Seq.fill(rnd.nextInt(25))(parts(rnd.nextInt(parts.length))).mkString
  }

  test("graft_pii_stats equals the regex chain on adversarial edges") {
    checkPii(Seq(
      "", " ", "plain text only",
      // email backtracking: greedy domain must retreat to the LAST dot
      // with >=2 letters; TLD run is greedy
      "a@b.cc", "a@b.c", "a@b.cd.e", "a@b.cd.ef", "a@b..cc", "a@.cc", "a@b.",
      "x a@b.c.de y", "a@b.cc.d", "pre..a@@b.cc", "@b.cc", "a@", "@", "a@b",
      "local%+-._X@do-m.ain.org tail", "UPPER@CASE.COM", "a@9.cc", "a@-.cc",
      "a@b.cc9@dd.ee", "a@bb.ccx@dd.ee", "first a@b.cc then c@d.ee",
      // email eats phone-shaped local parts; counts stay on the original
      "123-456-7890@x.com", "acct 123456789@y.org",
      // phone / acct overlaps and runs
      "123-456-7890", "123-456-78901", "1123-456-7890", "123-45-6789",
      "123456789", "1234567890", "12345678", "123456789012345678",
      "12345678901234567", "999-999-9999999-999-9999",
      "call 202-555-0123 or 303-555-9876 now",
      "nine 987654321 then 123456789123456789 done",
      // redaction-order effects: an email redaction can abut digit runs
      "55a@b.cc5-123-4567", "1234a@b.cc56789",
      // unicode around matches (multi-byte bytes must not confuse offsets)
      "中文 a@b.cc 中文 123-456-7890 émü 123456789 end",
      "héllo@wörld.com",  // non-ascii inside would-be email: ö not in domain class
      "ünïcode123456789ünïcode"))
  }

  test("graft_pii_stats equals the regex chain on 2000 random PII soups") {
    checkPii(Seq.fill(2000)(piiSoup()))
  }

  test("graft_pii_stats matches on the augmented fixture corpus") {
    val aug = graft.operators.TextAnalysis.t11PiiScan(spark, sf) // smoke: runs
    assert(aug.count() > 0)
    checkPii(spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("text", expr(
        """CASE WHEN doc_id % 3 = 0
          |THEN concat(text, ' contact user', cast(doc_id AS STRING),
          |            '@example.org call 202-555-0',
          |            lpad(cast(doc_id % 1000 AS STRING), 3, '0'),
          |            ' acct ',
          |            lpad(cast(doc_id * 271 % 1000000000 AS STRING), 9, '0'))
          |ELSE text END""".stripMargin))
      .select(col("text")).as[String].collect().toSeq)
  }

  // ---------------------------------------------------------------- d20

  test("graft_strip_spans equals the split/mark/join reference on random kill sets") {
    val cases: Seq[(String, Seq[Int])] = Seq(
      ("", Seq.empty), (" ", Seq.empty), ("a b c d e", Seq.empty),
      ("a b c d e", Seq(1)), ("a b c d e", Seq(2)), ("a b c d e", Seq(1, 2)),
      ("a b c d", Seq(1)), // whole doc is one span -> ''
      (" lead a b c d e", Seq(1)), ("t u v w x y z", Seq(1, 4))) ++
      Seq.fill(300) {
        val t = wordSoup(30)
        val nw = t.split("\\s+", -1).length
        val nWin = math.max(0, nw - 3)
        val starts = (1 to nWin).filter(_ => rnd.nextBoolean() && rnd.nextBoolean())
        (t, starts)
      }
    val in = cases.zipWithIndex.map { case ((t, st), i) => (i.toLong, t, st) }
      .toDF("id", "text", "starts")
    val got = in.select(col("id"),
        expr("graft_strip_spans(text, starts, 4)").as("r"))
      .select(col("id"), col("r.n_words"), col("r.n_dropped"), col("r.text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    for (((t, starts), i) <- cases.zipWithIndex) {
      val toks = t.split("\\s+", -1)
      val kill = Array.fill(toks.length)(false)
      for (s <- starts; j <- (s - 1) until math.min(s - 1 + 4, toks.length)) kill(j) = true
      val kept = toks.indices.filterNot(kill)
      val expText = if (kept.length == toks.length) t else kept.map(toks).mkString(" ")
      val (nw, nd, txt) = got(i.toLong)
      assert(nw === toks.length.toLong, s"n_words case $i '$t'")
      assert(nd === (toks.length - kept.length).toLong, s"n_dropped case $i '$t'")
      assert(txt === expText, s"text case $i '$t' starts=$starts")
    }
  }

  test("graft_strip_spans survives hostile starts: zero, negative, past-end, null elements") {
    // the function is registered for arbitrary user SQL — a start <= 0
    // (or a NULL array element, which reads as 0) must clamp to token 0,
    // not index kill() negatively and kill the task (r13 advisory)
    val rows = spark.sql(
      """SELECT graft_strip_spans('a b c d e f g h', array(0, -3, 7, 99), 4) AS r,
        |       graft_strip_spans('a b c d e f g h', array(cast(null as int), 2), 4) AS r2
        |""".stripMargin).collect()
    val r = rows(0).getStruct(0)
    // start 0 / -3 clamp to token 1; -3 kills tokens 1..(−3−1+4)=0 → none
    // past 0; 0 kills 1..3; 7 kills 7..8 capped; 99 kills nothing
    assert(r.getLong(0) === 8L) // n_words
    assert(r.getString(2) === "d e f") // 0→kill a,b,c; 7→kill g,h; 99→none
    assert(r.getLong(1) === 5L)
    val r2 = rows(0).getStruct(1)
    // null element reads as 0 → clamp (kill a,b,c); 2 kills b..e → 5 dropped
    assert(r2.getString(2) === "f g h")
    assert(r2.getLong(1) === 5L)
  }

  test("d20 stripReport is identical on the fixture corpus (oracle formulation)") {
    // end-to-end: the operator's output at sf0.001 equals the old
    // explode/anti-join/collect_list formulation computed via SQL
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val got = graft.operators.Dedup.boilerplateStrip(docs.select(col("doc_id"), col("text")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.nonEmpty)
    // reference: per-doc recomputation in Scala
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val spanOf = (toks: Array[String], i: Int) => toks.slice(i, i + 4).mkString(" ")
    val dfCount = scala.collection.mutable.Map.empty[String, scala.collection.mutable.Set[Long]]
    for ((id, t) <- texts) {
      val toks = t.split("\\s+", -1)
      for (i <- 0 to toks.length - 4)
        dfCount.getOrElseUpdate(spanOf(toks, i), scala.collection.mutable.Set.empty) += id
    }
    val hot = dfCount.filter(_._2.size >= graft.operators.Dedup.BoilerMinDocs).keySet
    val exp = texts.toSeq.sortBy(_._1).flatMap { case (id, t) =>
      val toks = t.split("\\s+", -1)
      val kill = Array.fill(toks.length)(false)
      for (i <- 0 to toks.length - 4; if hot(spanOf(toks, i)); j <- i until i + 4)
        kill(j) = true
      val kept = toks.indices.filterNot(kill)
      val dropped = toks.length - kept.length
      if (dropped > 0)
        Some((id, toks.length.toLong, dropped.toLong,
          if (dropped == 0) t else kept.map(toks).mkString(" ")))
      else None
    }
    assert(got.toSeq === exp)
  }

  // ------------------------------------------------------------ plumbing

  test("null text yields null for all three walks") {
    val rows = Seq((1L, Option("a b c d e")), (2L, Option.empty[String]))
      .toDF("id", "text")
      .select(col("id"), expr("graft_ngram_fp(text, 4)").as("f"),
        expr("graft_rep_stats(text)").as("r"), expr("graft_pii_stats(text)").as("p"))
      .orderBy(col("id")).collect()
    assert(!rows(0).isNullAt(1) && !rows(0).isNullAt(2) && !rows(0).isNullAt(3))
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2) && rows(1).isNullAt(3))
  }

  test("all three walks stay inside whole-stage codegen") {
    val plan = spark.range(10)
      .select(expr("concat('a b c d ', id)").as("text"))
      .select(expr("graft_ngram_fp(text, 4)").as("f"),
        expr("graft_rep_stats(text)").as("r"),
        expr("graft_pii_stats(text)").as("p"))
      .queryExecution.executedPlan
    val fused = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(fused.nonEmpty, s"expected a WholeStageCodegen stage in:\n$plan")
    for (fn <- Seq("graft_ngram_fp", "graft_rep_stats", "graft_pii_stats"))
      assert(fused.exists(_.toString.contains(fn)),
        s"$fn must sit INSIDE the fused stage:\n$plan")
  }
}
