package graft

import scala.util.Random
import org.apache.spark.sql.functions._
import graft.operators.TextQuality

/** Randomized differential tests for the quality/mixing operators:
  * each is checked against a brute-force single-node reference over
  * seeded random corpora, and against itself under a different input
  * partitioning (partitioning invariance is what lets the DuckDB
  * oracle value-check the distributed runs). Seeded, so failures
  * reproduce.
  */
class TextQualityPropSpec extends SparkSpec {

  private val rnd = new Random(42)
  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa")

  private def randomDocs(n: Int, maxLen: Int): Seq[(Long, String)] =
    (0 until n).map { i =>
      val len = 1 + rnd.nextInt(maxLen)
      (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }

  test("compressionRatio matches a direct java.util.zip replay") {
    import spark.implicits._
    val docs = Seq(
      (0L, ("lorem ipsum dolor sit amet " * 20).trim),         // repetitive
      (1L, (0 until 150).map(i => f"tok${(i * 2654435761L) % 100000}%x")
        .mkString(" ")),                                       // varied prose-ish
      (2L, (0 until 400).map(i => s"w${i * 2654435761L % 997}")
        .mkString(" ")),                                       // high entropy
      (3L, "short"),                                           // < minBytes
      (4L, "")).toDF("doc_id", "text")                         // empty → null
    val out = TextQuality.compressionRatio(docs, "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (Option(r.getAs[java.lang.Double]("compression_ratio")),
         r.getAs[Boolean]("is_repetitive"))).toMap

    def zipLen(s: String): Long = {
      val d = new java.util.zip.Deflater(6)
      d.setInput(s.getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](8192)
      var t = 0L
      while (!d.finished()) t += d.deflate(buf)
      d.end(); t
    }
    docs.collect().foreach { r =>
      val (id, t) = (r.getLong(0), r.getString(1))
      val want =
        if (t.isEmpty) None
        else Some(zipLen(t).toDouble / t.getBytes("UTF-8").length)
      assert(out(id)._1 == want, s"doc $id")
    }
    // the 20x-repeated phrase is flagged; prose/high-entropy/short are not
    assert(out(0L)._2 && !out(1L)._2 && !out(2L)._2 && !out(3L)._2 && !out(4L)._2,
      out.toSeq.sortBy(_._1).toString)
    // ordering sanity: repetitive << high-entropy
    assert(out(0L)._1.get < out(2L)._1.get)
    // facade delegates to the operator exactly
    val viaFacade = graft.api.Frame(docs).compressionRatio("text").toDF
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (Option(r.getAs[java.lang.Double]("compression_ratio")),
         r.getAs[Boolean]("is_repetitive"))).toMap
    assert(viaFacade == out)
  }

  test("deflate_len kernel: null propagates, SQL surface registered") {
    import spark.implicits._
    val df = Seq((0L, Option("abc abc abc abc")), (1L, None: Option[String]))
      .toDF("id", "text")
    val out = df.select(col("id"),
        graft.functions.DeflateLen(col("text"), 6).as("n"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(0L).exists(_ > 0) && out(1L).isEmpty)
    // via spark.sql after registration
    df.createOrReplaceTempView("dl_t")
    val viaSql = spark.sql(
      "SELECT deflate_len(text, 6) FROM dl_t WHERE id = 0").collect()
    assert(viaSql.head.getLong(0) == out(0L).get)
  }

  test("tokenBudgetMix matches the brute-force budget walk") {
    import spark.implicits._
    for (_ <- 0 until 5) {
      val rows = (0 until 50).map { i =>
        (s"src${rnd.nextInt(4)}", i.toLong, (1 + rnd.nextInt(30)).toLong)
      }
      val budget = 20 + rnd.nextInt(80)
      // reference: per source, rows in (md5(id), id) order; PREFIX-CUT
      // policy — the running total includes every row, keep while the
      // prefix sum fits (see tokenBudgetMix scaladoc; skip-and-continue
      // is the STREAMING gate's policy, deliberately different)
      def md5hex(s: String): String = java.security.MessageDigest
        .getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val want = rows.groupBy(_._1).flatMap { case (_, rs) =>
        var cum = 0L
        rs.sortBy { case (_, id, _) => (md5hex(id.toString), id) }.map {
          case (_, id, tok) =>
            cum += tok
            (id, cum <= budget)
        }
      }
      val got = TextQuality.tokenBudgetMix(
          rows.toDF("source", "doc_id", "tok"), "source", "doc_id", "tok", budget)
        .select("doc_id", "keep")
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(got == want, s"budget=$budget")
      // partitioning invariance
      val got7 = TextQuality.tokenBudgetMix(
          rows.toDF("source", "doc_id", "tok").repartition(7),
          "source", "doc_id", "tok", budget)
        .select("doc_id", "keep")
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(got7 == want)
    }
  }

  test("chunkDocuments with stride == size partitions the token stream exactly") {
    import spark.implicits._
    for (_ <- 0 until 3) {
      val docs = randomDocs(30, 40)
      val size = 1 + rnd.nextInt(8)
      val chunks = TextQuality.chunkDocuments(
          docs.toDF("doc_id", "text"), "doc_id", "text", size, size)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      // reassembling each doc's chunks in index order reproduces it
      val rebuilt = chunks.groupBy(_._1).map { case (id, cs) =>
        id -> cs.sortBy(_._2).map(_._3).mkString(" ")
      }
      docs.foreach { case (id, text) =>
        assert(rebuilt(id) == text, s"doc $id size=$size")
      }
      // every chunk except a doc's last has exactly `size` tokens
      chunks.groupBy(_._1).foreach { case (id, cs) =>
        cs.sortBy(_._2).dropRight(1).foreach { c =>
          assert(c._3.split(" ").length == size, s"doc $id chunk ${c._2}")
        }
      }
    }
  }

  test("curriculumOrder: positions are a permutation, stages ramp, batches cut") {
    import graft.operators.TextQuality
    val df = spark.createDataFrame(
      (0L until 40L).map(i => (i, (i % 10) * 100L))).toDF("doc_id", "diff")
    val out = TextQuality.curriculumOrder(df, "doc_id", "diff",
        stages = 4, batchRows = 7L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // positions are exactly 0..39 once each
    assert(out.map(_._3).sorted.toSeq == (0L until 40L), s"${out.toSeq}")
    // stage is non-decreasing along the global order
    val byPos = out.sortBy(_._3)
    assert(byPos.map(_._2).toSeq == byPos.map(_._2).sorted.toSeq)
    // batch = position / 7 everywhere
    assert(byPos.forall { case (_, _, p, b) => b == p / 7 })
    // equi-width over diff 0..900 with 4 stages: 0-100→0 ... 900→3,
    // 10 docs per diff decile → stage sizes 12/8/8/12
    assert(out.groupBy(_._2).view.mapValues(_.length).toMap ==
      Map(0 -> 12, 1 -> 8, 2 -> 8, 3 -> 12))
  }

  test("curriculumOrder: constant difficulty puts everything in stage 0") {
    import graft.operators.TextQuality
    val df = spark.createDataFrame((0L until 9L).map(i => (i, 5L)))
      .toDF("doc_id", "diff")
    val out = TextQuality.curriculumOrder(df, "doc_id", "diff",
        stages = 4, batchRows = 4L)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(out.forall(_._1 == 0), s"${out.toSeq}")
    assert(out.map(_._2).sorted.toSeq == (0L until 9L))
  }

  test("curriculumOrder is invariant to input partitioning") {
    import graft.operators.TextQuality
    val rows = (0L until 30L).map(i => (i, i * 3L % 7L))
    val a = TextQuality.curriculumOrder(
      spark.createDataFrame(rows).toDF("doc_id", "diff").repartition(1),
      "doc_id", "diff", stages = 3, batchRows = 4L).collect()
      .map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq
    val b = TextQuality.curriculumOrder(
      spark.createDataFrame(rows).toDF("doc_id", "diff").repartition(13),
      "doc_id", "diff", stages = 3, batchRows = 4L).collect()
      .map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq
    assert(a == b)
  }

  test("bigramLmScore is a proper probability model over observed bigrams") {
    import spark.implicits._
    val docs = randomDocs(40, 30).filter(_._2.contains(" "))  // ≥2 tokens
    val out = TextQuality.bigramLmScore(
        docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    docs.foreach { case (id, text) =>
      val nb = text.split(" ").length - 1
      val (gotN, logp) = out(id)
      assert(gotN == nb, s"doc $id bigram count")
      // smoothed probabilities are strictly inside (0, 1) → ln < 0
      assert(logp < 0.0, s"doc $id logp=$logp")
    }
  }

  test("temperatureMix: single source and alpha=1 degenerate to plain sampling") {
    import spark.implicits._
    val docs = (0L until 50L).map(i => (i, "only", s"text $i")).toDF("doc_id", "source", "text")
    // one source: quota = floor(T * w / w) = T regardless of alpha
    val out = TextQuality.temperatureMix(docs, "source", "doc_id", "text",
      alpha = 0.5, targetFrac = 0.3)
    assert(out.filter(col("keep")).count() === 15)
    // alpha = 1 (the pow path): quotas proportional to counts
    val two = ((0L until 40L).map(i => (i, "a", s"t $i")) ++
      (40L until 60L).map(i => (i, "b", s"t $i"))).toDF("doc_id", "source", "text")
    val kept = TextQuality.temperatureMix(two, "source", "doc_id", "text",
        alpha = 1.0, targetFrac = 0.5)
      .filter(col("keep")).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("a") === 20L && kept("b") === 10L)
  }

  test("fixMojibake round-trips corrupted text back to the original") {
    import spark.implicits._
    val rnd = new Random(17)
    val targets = TextQuality.mojibakeTargets
    // clean originals: ASCII words sprinkled with real accented chars
    val docs = (0L until 30L).map { i =>
      val words = (0 until 20).map { _ =>
        if (rnd.nextInt(3) == 0) "caf" + targets(rnd.nextInt(targets.length))
        else "word" + rnd.nextInt(100)
      }
      (i, words.mkString(" "))
    }
    val corrupted = docs.map { case (id, t) => (id, TextQuality.mojibakeOf(t), t) }
      .toDF("doc_id", "text", "orig")
    val out = TextQuality.fixMojibake(corrupted, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2))).toMap
    val origs = docs.toMap
    docs.foreach { case (id, orig) =>
      val (fixed, flagged) = out(id)
      assert(fixed === orig, s"doc $id")
      assert(flagged === (TextQuality.mojibakeOf(orig) != orig))
    }
    assert(origs.nonEmpty)
  }

  test("fixMojibake leaves clean ASCII untouched and unflagged") {
    import spark.implicits._
    val docs = Seq((1L, "plain ascii text with no artifacts at all"))
      .toDF("doc_id", "text")
    val out = TextQuality.fixMojibake(docs, "doc_id", "text").head()
    assert(out.getString(1) === "plain ascii text with no artifacts at all")
    assert(!out.getBoolean(2))
  }

  test("temperatureMix: alpha<1 up-weights small sources; quotas honored exactly") {
    import spark.implicits._
    val rnd = new Random(5)
    // big source 400 docs, small source 25 docs
    val docs = ((0 until 400).map(i => (i.toLong, "big", s"doc big $i ${rnd.nextInt()}")) ++
      (0 until 25).map(i => ((400 + i).toLong, "small", s"doc small $i ${rnd.nextInt()}")))
      .toDF("doc_id", "source", "text")
    val out = TextQuality.temperatureMix(docs, "source", "doc_id", "text",
      alpha = 0.5, targetFrac = 0.5)
    val kept = out.filter(col("keep")).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // replay the quota rule exactly
    val t = math.floor(425 * 0.5)
    val sw = math.sqrt(400.0) + math.sqrt(25.0)
    assert(kept("big") === math.floor(t * math.sqrt(400.0) / sw).toLong)
    // a quota above the source size keeps the whole source (alpha<1
    // can over-allocate small sources; selection is capped by reality)
    assert(kept("small") === math.min(25L, math.floor(t * math.sqrt(25.0) / sw).toLong))
    // alpha=0.5 keeps a larger FRACTION of the small source
    assert(kept("small").toDouble / 25 > kept("big").toDouble / 400)
    // every input row comes back exactly once
    assert(out.count() === 425)
    // deterministic under physical layout changes
    val again = TextQuality.temperatureMix(docs.repartition(13), "source",
      "doc_id", "text", alpha = 0.5, targetFrac = 0.5)
      .filter(col("keep")).select("doc_id").collect().map(_.getLong(0)).toSet
    val first = out.filter(col("keep")).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === first)
  }

  test("flagBlockedWords normalizes case and punctuation, counts occurrences") {
    import spark.implicits._
    val docs = Seq(
      (1L, "clean text here"),
      (2L, "some SPAM! and more spam."),   // case + punctuation both match
      (3L, "spamming is not spam-adjacent"), // normalized 'spamadjacent' ≠ 'spam'
      (4L, "")
    ).toDF("doc_id", "text")
    val got = TextQuality.flagBlockedWords(docs, "doc_id", "text", Seq("Spam"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got(1L) == ((0L, false)))
    assert(got(2L) == ((2L, true)))
    assert(got(3L) == ((0L, false)), s"got ${got(3L)}")
    assert(got(4L) == ((0L, false)))
  }

  test("flagBlockedWords: list entries normalize like tokens; any whitespace splits") {
    import spark.implicits._
    val docs = Seq(
      (1L, "get the in-app offer"),   // token normalizes to 'inapp'
      (2L, "buy\nspam now"),          // newline-adjacent blocked word
      (3L, "tab\tspam here"),
      (4L, "no match")
    ).toDF("doc_id", "text")
    val got = TextQuality.flagBlockedWords(docs, "doc_id", "text",
        Seq("In-App", "spam", "", "!!"))   // punctuated + degenerate entries
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got == Map(1L -> true, 2L -> true, 3L -> true, 4L -> false),
      s"got $got")
  }

  test("gopherLineRules hand arithmetic on a constructed document") {
    import spark.implicits._
    // 2 lines, 8 words total: one bulleted line, one ellipsis line,
    // one '#' token, words otherwise alphabetic
    val text = "- alpha beta gamma delta.\nepsilon # zeta..."
    val got = TextQuality.gopherLineRules(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text").collect()(0)
    // words: -,alpha,beta,gamma,delta.,epsilon,#,zeta... → 8
    // symbols: one '#' char + one '...' occurrence → 2/8
    assert(math.abs(got.getDouble(1) - 2.0 / 8) < 1e-12)
    assert(math.abs(got.getDouble(2) - 0.5) < 1e-12)   // 1 of 2 lines bulleted
    assert(math.abs(got.getDouble(3) - 0.5) < 1e-12)   // 1 of 2 ends '...'
    assert(math.abs(got.getDouble(4) - 6.0 / 8) < 1e-12) // '-' and '#' lack alpha
    assert(!got.getBoolean(5) && !got.getBoolean(6))   // symbol+bullet fail
    assert(!got.getBoolean(9))                          // composed keep fails
    // a plain clean doc passes everything
    val clean = TextQuality.gopherLineRules(
      Seq((2L, "all plain words here.\nand more plain words."))
        .toDF("doc_id", "text"), "doc_id", "text").collect()(0)
    assert(clean.getBoolean(9), s"clean doc should keep: $clean")
  }

  test("withinDocDupLines hand arithmetic; all-unique doc scores 0") {
    import spark.implicits._
    // doc 1: 4 lines, 'aa' twice → dup lines 2/4; chars: aa,aa,bbb,c →
    // dup chars 4/(2+2+3+1)
    val docs = Seq(
      (1L, "aa\naa\nbbb\nc"),
      (2L, "x\ny\nz")
    ).toDF("doc_id", "text")
    val got = TextQuality.withinDocDupLines(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4),
          r.getBoolean(5)))).toMap
    assert(got(1L)._1 == 4L)
    assert(math.abs(got(1L)._2 - 0.5) < 1e-12)
    assert(math.abs(got(1L)._3 - 4.0 / 8) < 1e-12)
    assert(!got(1L)._4 && !got(1L)._5) // 0.5 > 0.3 and 0.5 > 0.2
    assert(got(2L) == ((3L, 0.0, 0.0, true, true)))
  }

  test("scriptProfile counts BMP script blocks and picks the dominant") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abc 12 привет"),  // 3 latin, 2 digit, 6 cyr, 2 other(spaces)
      (2L, "漢字文本"),
      (3L, "")
    ).toDF("doc_id", "text")
    val got = TextQuality.scriptProfile(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getString(7)))).toMap
    assert(got(1L) == ((3L, 2L, 6L, 0L, 0L, 2L, "cyrillic")), s"${got(1L)}")
    assert(got(2L) == ((0L, 0L, 0L, 4L, 0L, 0L, "cjk")))
    assert(got(3L) == ((0L, 0L, 0L, 0L, 0L, 0L, "empty")))
    // tie goes to the fixed priority order: 1 latin vs 1 digit → latin
    val tie = TextQuality.scriptProfile(Seq((9L, "a1")).toDF("doc_id", "text"),
      "doc_id", "text").collect()(0).getString(7)
    assert(tie == "latin")
  }
}
