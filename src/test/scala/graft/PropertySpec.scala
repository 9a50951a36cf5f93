package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core._

/** Exhaustive-range property tests over reshape/slice algebra (SURVEY.md §5
  * strategy item 2): take/drop partition, sort idempotence + permutation
  * invariance, melt height/mass conservation, append additivity. Ranges are
  * enumerated deterministically (the whole input space that matters for a
  * 12-row fixture) rather than sampled.
  */
class PropertySpec extends AnyFunSuite with Matchers {

  lazy val spark = TestSpark.spark

  lazy val df: KFrame = KFrame.fromCsvFile(spark, "src/test/resources/retail.csv")
  lazy val h: Long = df.height
  val totalSale = 36000.0

  test("take(n) + drop(n) partition the frame for every n in -3..16") {
    for (n <- -3 to 16)
      withClue(s"n=$n: ") {
        (df.take(n).height + df.drop(n).height) shouldBe h
      }
  }

  test("take(n) of sorted frame = n smallest values, for every n") {
    val sortedCosts = df.toOrderedDF.select("cost").collect()
      .map(_.getDouble(0)).sorted.toSeq
    for (n <- 1 to 12) {
      df.sort("cost").take(n).toOrderedDF
        .select("cost").collect().map(_.getDouble(0)).toSeq shouldBe
        sortedCosts.take(n)
    }
  }

  val fields = Seq("gender", "city", "product", "year", "sale", "cost")

  test("ascending sort is idempotent and a permutation, for every field") {
    val all = df.toOrderedDF.collect().toSet
    for (f <- fields) withClue(s"$f: ") {
      val once = df.sort(f).toOrderedDF.collect().toSeq
      val twice = df.sort(f).sort(f).toOrderedDF.collect().toSeq
      once shouldBe twice
      once.toSet shouldBe all
    }
  }

  test("descending sort is deliberately NOT idempotent (reference reverse quirk)") {
    // desc = reverse(stable asc of current order) (`Combinator.hs:229-230`):
    // applying desc twice restores each key group's ORIGINAL row order,
    // while a single desc shows it reversed. Pin the exact quirk.
    val once = df.sort("gender", ascending = false).toOrderedDF
      .select("sale").collect().map(_.getDouble(0)).toSeq
    val twice = df.sort("gender", ascending = false)
      .sort("gender", ascending = false).toOrderedDF
      .select("sale").collect().map(_.getDouble(0)).toSeq
    once shouldBe Seq(5200.0, 3100.0, 5000.0, 6100.0, 2800.0, 4500.0,
      2600.0, 1400.0, 1700.0, 1500.0, 900.0, 1200.0)
    twice shouldBe Seq(4500.0, 2800.0, 6100.0, 5000.0, 3100.0, 5200.0,
      1200.0, 900.0, 1500.0, 1700.0, 1400.0, 2600.0)
  }

  test("sort desc reverses sort asc exactly, for every field") {
    for (f <- fields) withClue(s"$f: ") {
      df.sort(f, ascending = false).toOrderedDF.collect().toSeq shouldBe
        df.sort(f).toOrderedDF.collect().toSeq.reverse
    }
  }

  test("melt conserves height x nVars and value mass") {
    val varSets = Seq(Seq("sale"), Seq("cost"), Seq("sale", "cost"),
      Seq("sale", "cost", "discount"))
    for (vars <- varSets) withClue(s"vars=$vars: ") {
      val m = df.melt(Seq("city"), vars)
      m.height shouldBe h * vars.length
      val mass = m.toOrderedDF.agg(org.apache.spark.sql.functions.sum("value"))
        .head().getDouble(0)
      val want = vars.map(v =>
        df.toOrderedDF.agg(org.apache.spark.sql.functions.sum(v)).head().getDouble(0)).sum
      mass shouldBe want +- 1e-9
    }
  }

  test("sliceViaPositions (huge-n plan) matches take/drop, plain and sorted") {
    for (n <- Seq(1, 4, 6, 12); base <- Seq(df, df.sort("cost")))
      withClue(s"n=$n sorted=${base ne df}: ") {
        base.sliceViaPositions(n, keepFirst = true).toOrderedDF
          .collect().toSeq shouldBe base.take(n).toOrderedDF.collect().toSeq
        base.sliceViaPositions(n, keepFirst = false).toOrderedDF
          .collect().toSeq shouldBe base.drop(n).toOrderedDF.collect().toSeq
      }
  }

  test("take/drop on a positions frame are pure filters: no limit, no join") {
    // CSV ingest assigns exact 1..n position ids, so the slice should be a
    // distributed filter on the id — no GlobalLimit funnel, no anti-join.
    for (f <- Seq(df.take(5), df.drop(5))) {
      val plan = f.toOrderedDF.queryExecution.executedPlan.toString
      (plan should not).include("GlobalLimit")
      (plan should not).include("Join")
    }
  }

  test("nearDupClusters equals driver-side union-find on random graphs") {
    import org.apache.spark.sql.SparkSession
    val s: SparkSession = spark
    import s.implicits._
    // deterministic pseudo-random edge sets over ids 1..30
    val rnd = new scala.util.Random(7L)
    for (trial <- 1 to 3) {
      val edges = Seq.fill(25) {
        val a = rnd.nextInt(30) + 1L; val b = rnd.nextInt(30) + 1L
        if (a < b) (a, b) else (b, a + 1)
      }.filter(e => e._1 != e._2).distinct
      // reference union-find
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(id => id -> find(id)).toMap
      val got = graft.operators.Dedup
        .nearDupClusters(edges.toDF("a_id", "b_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      withClue(s"trial $trial edges=$edges: ") { got shouldBe want }
    }
  }

  test("append(take(n), drop(n)) reassembles the frame for every n") {
    val want = df.toOrderedDF.collect().toSeq
    for (n <- Seq(1, 4, 6, 11)) withClue(s"n=$n: ") {
      df.take(n).append(df.drop(n)).toOrderedDF.collect().toSeq shouldBe want
    }
  }

  test("append height additivity over slice pairs") {
    for (a <- Seq(1, 3, 12); b <- Seq(1, 5, 12)) withClue(s"a=$a b=$b: ") {
      df.take(a).append(df.take(b)).height shouldBe (a + b).toLong
    }
  }

  test("groupby+aggregate sum equals global sum for every key set") {
    val keySets = Seq(Seq("gender"), Seq("city"), Seq("gender", "city"),
      Seq("product", "year"))
    for (keys <- keySets) withClue(s"keys=$keys: ") {
      val grouped = df.groupby(keys: _*).aggregate(Agg.sum, "sale")
      grouped.toOrderedDF
        .agg(org.apache.spark.sql.functions.sum("sale")).head().getDouble(0) shouldBe
        totalSale +- 1e-9
    }
  }

  test("cast cell totals equal the frame total for every row/col split") {
    val splits = Seq(
      (Seq("gender"), Seq("city")), (Seq("city"), Seq("product")),
      (Seq("product"), Seq("year")))
    for ((rows, cols) <- splits) withClue(s"$rows x $cols: ") {
      val wide = df.cast(rows, cols, Agg.sum, "sale").pivotedWide
      val valueCols = wide.columns.filterNot(rows.contains)
      val total = wide.collect().flatMap(r =>
        valueCols.map(c => Option(r.getAs[Any](c)).map {
          case d: Double => d
        }.getOrElse(0.0))).sum
      total shouldBe totalSale +- 1e-9
    }
  }

  test("topKPerKey matches the driver model on random keyed data with ties") {
    import spark.implicits._
    import org.apache.spark.sql.{functions => F}
    val rnd = new scala.util.Random(7)
    // scores drawn from a tiny range to force plenty of ties per key
    val rows = (1L to 300L).map(i =>
      (i, s"k${rnd.nextInt(6)}", rnd.nextInt(5).toDouble))
    val data = rows.toDF("id", "key", "score")
    for (k <- Seq(1, 3, 10)) withClue(s"k=$k: ") {
      val got = graft.extras.Relational
        .topKPerKey(data.repartition(5), Seq("key"), "score", "id", k)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .toSet
      val model = rows.groupBy(_._2).values.flatMap { g =>
        g.sortBy { case (id, _, s) => (-s, id) }.take(k)
      }.toSet
      got shouldBe model
    }
  }

  test("GopherStats kernel == java-regex reference on 2000 adversarial fuzz strings") {
    import graft.functions.GopherStatsKernel
    // reference: the exact regex/split formulations the DuckDB oracle and
    // the round-5 battery used, evaluated with java.util.regex directly
    val bulletP = java.util.regex.Pattern.compile("^\\s*[-*•]")
    val ellipsisP = java.util.regex.Pattern.compile("(\\.\\.\\.|…)\\s*$")
    val letterP = java.util.regex.Pattern.compile("\\p{L}")
    def ref(s: String): Array[Long] = {
      val ws = s.split("\\s+").filter(_.nonEmpty)
      val ls = s.split("\n", -1) // Spark split keeps trailing empties
      def cpLen(x: String) = x.codePointCount(0, x.length).toLong
      val toks = s.toLowerCase(java.util.Locale.ROOT)
        .split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty).toSet
      Array[Long](
        ws.length.toLong,
        ws.map(cpLen).sum,
        ls.length.toLong,
        ls.count(l => bulletP.matcher(l).find()).toLong,
        ls.count(l => ellipsisP.matcher(l).find()).toLong,
        ws.count(w => letterP.matcher(w).find()).toLong,
        s.count(_ == '#').toLong,
        (s.length - s.replace("...", "").length).toLong / 3,
        s.count(_ == '…').toLong,
        graft.operators.Selection.GopherStopwords.count(toks.contains).toLong)
    }
    // alphabet stresses every rule: the six \s chars, dots/ellipses,
    // bullets at and away from line starts, stop words and near-misses,
    // non-letter digits/symbols, multi-byte letters, a surrogate pair
    val atoms = Array(" ", "\t", "\n", "\r", "\f", "\u000B", ".", "...",
      "…", "-", "*", "•", "#", "a", "Z", "9", ",", "é", "ß", "中", "😀",
      "the", "THE", "thee", "be", "to", "of", "and", "that", "have",
      "with", "withx")
    val rnd = new scala.util.Random(1234)
    for (trial <- 0 until 2000) {
      val n = rnd.nextInt(30)
      val s = Seq.fill(n)(atoms(rnd.nextInt(atoms.length))).mkString
      withClue(s"trial $trial input ${s.replace("\n", "\\n")}: ") {
        GopherStatsKernel.statsArray(s).toSeq shouldBe ref(s).toSeq
      }
    }
    // null contract: all-zero counters
    GopherStatsKernel.statsArray(null).toSeq shouldBe Seq.fill(10)(0L)
  }

  test("NormalizeText kernel == regex-chain reference on 2000 fuzz strings") {
    import graft.functions.NormalizeTextKernel
    // independent formulation: the exact regex pipeline the DuckDB oracle
    // runs (NFC -> CR(LF)->LF -> TAB->space -> control strip -> space-run
    // collapse -> edge trim), via java.util.regex replaceAll chains
    def ref(s: String): String = {
      val nfc = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      val step = nfc
        .replaceAll("\r\n?", "\n")
        .replaceAll("\t", " ")
        .replaceAll("[\u0001-\u0008\u000B\u000C\u000E-\u001F\u007F]", "")
        .replaceAll("  +", " ")
      var lo = 0; var hi = step.length
      while (lo < hi && (step.charAt(lo) == ' ' || step.charAt(lo) == '\n')) lo += 1
      while (hi > lo && (step.charAt(hi - 1) == ' ' || step.charAt(hi - 1) == '\n')) hi -= 1
      step.substring(lo, hi)
    }
    // alphabet stresses every rule: CR/LF/CRLF mixes, tabs, C0 controls,
    // DEL, combining accents (NFC composition), precomposed chars, space
    // runs, multi-byte letters, a surrogate pair
    val atoms = Array(" ", "  ", "\t", "\r", "\n", "\r\n", "\u0007",
      "\u000B", "\u001B[0m", "\u007F", "e\u0301", "\u00E9", "o\u0308",
      "a", "Z.", "9", "中", "😀", "word", " x ")
    val rnd = new scala.util.Random(7777)
    for (trial <- 0 until 2000) {
      val s = Seq.fill(rnd.nextInt(25))(atoms(rnd.nextInt(atoms.length))).mkString
      withClue(s"trial $trial input ${s.replace("\n", "\\n").replace("\r", "\\r")}: ") {
        NormalizeTextKernel.normalizeString(s) shouldBe ref(s)
      }
    }
    // hand-pinned edges: idempotence, empty, null
    val messy = "  \tTitre: re\u0301sume\u0301\r\n\rbody  text\u0007\n "
    val clean = NormalizeTextKernel.normalizeString(messy)
    clean shouldBe "Titre: r\u00E9sum\u00E9\n\nbody text"
    NormalizeTextKernel.normalizeString(clean) shouldBe clean
    NormalizeTextKernel.normalizeString("") shouldBe ""
    NormalizeTextKernel.normalize(null) shouldBe null
  }

  test("BloomKernel or-merge == single filter built from the union of keys") {
    import graft.functions.BloomKernel
    val rnd = new scala.util.Random(2026)
    val keysA = Array.fill(4000)(rnd.nextLong())
    val keysB = Array.fill(4000)(rnd.nextLong())
    val expected = (keysA.length + keysB.length).toLong
    // distributed-build shape: one pre-sized empty per "partition", keys
    // folded in, OR-merged — must be BIT-IDENTICAL to one filter built
    // from all keys under the same sizing (add is deterministic, and OR
    // of the per-partition bitmaps is exactly the union of set bits)
    val a = BloomKernel.emptySized(expected, 1e-4)
    keysA.foreach(BloomKernel.add(a, _))
    val b = BloomKernel.emptySized(expected, 1e-4)
    keysB.foreach(BloomKernel.add(b, _))
    val merged = BloomKernel.or(a, b)
    val single = BloomKernel.build((keysA ++ keysB).iterator, expected, 1e-4)
    merged.k shouldBe single.k
    merged.nBits shouldBe single.nBits
    merged.words.toSeq shouldBe single.words.toSeq
    // incompatible sizings refuse to merge
    an[IllegalArgumentException] should be thrownBy
      BloomKernel.or(a, BloomKernel.emptySized(64, 1e-4))
  }

  test("RepStats kernel == collections reference on 1500 adversarial fuzz strings") {
    import graft.functions.RepStatsKernel
    def cp(x: String) = x.codePointCount(0, x.length).toLong
    def dup(segs: Array[String]): (Double, Double) = {
      val n = segs.length
      if (n == 0) return (0.0, 0.0)
      val classes = segs.groupBy(identity).values.toSeq
      val dupN = classes.filter(_.length > 1).map(_.length.toLong).sum
      val tot = segs.map(cp).sum
      val dupC = classes.filter(_.length > 1)
        .map(g => g.length.toLong * cp(g.head)).sum
      (dupN.toDouble / n, if (tot == 0) 0.0 else dupC.toDouble / tot)
    }
    def ref(s: String): Array[Double] = {
      val out = new Array[Double](13)
      val (l0, l1) = dup(s.split("\n", -1)); out(0) = l0; out(1) = l1
      val (p0, p1) = dup(s.split("\n\n", -1)); out(2) = p0; out(3) = p1
      val toks = s.toLowerCase(java.util.Locale.ROOT)
        .split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty)
      if (toks.isEmpty) return out
      val tot = cp(toks.mkString(" ")).toDouble
      for (n <- 2 to 10 if toks.length >= n) {
        val grams = toks.sliding(n).map(_.mkString(" ")).toSeq
        // .toSeq BEFORE .map: mapping a Map to (count, len) tuples would
        // rebuild a Map keyed by count, collapsing same-count classes
        val classes = grams.groupBy(identity).toSeq.map { case (g, occ) =>
          (occ.size.toLong, cp(g))
        }
        val v =
          if (n <= 4) {
            val mc = classes.map(_._1).max
            classes.collect { case (c, l) if c == mc => c * l }.max.toDouble
          } else
            classes.collect { case (c, l) if c > 1 => c * l }.sum.toDouble
        out(2 + n) = math.min(1.0, v / tot)
      }
      out
    }
    val atoms = Array("\n", "\n\n", " ", ".", "a", "b", "ab", "aa",
      "the cat", "词 语", "line one", "#", "-", "x", "yy", "\t")
    val rnd = new scala.util.Random(4321)
    for (trial <- 0 until 1500) {
      val s = Seq.fill(rnd.nextInt(25))(atoms(rnd.nextInt(atoms.length)))
        .mkString
      val got = RepStatsKernel.statsArray(s)
      val want = ref(s)
      withClue(s"trial $trial input ${s.replace("\n", "\\n")}: ") {
        got.length shouldBe 13
        got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
          withClue(s"signal $i: ") { g shouldBe w +- 1e-12 }
        }
      }
    }
    RepStatsKernel.statsArray(null).toSeq shouldBe Seq.fill(13)(0.0)
  }

  test("unigramLogLoss matches the driver model on a random corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg")
    val docs = (1L to 40L).map(i =>
      (i, Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")))
    val got = graft.operators.TextAnalysis
      .unigramLogLoss(docs.toDF("id", "text"), "id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // driver model: MLE unigram over the same tokenization
    val toks = docs.map { case (i, t) => i -> t.split(" ").toSeq }.toMap
    val ctf = toks.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val total = ctf.values.sum.toDouble
    docs.foreach { case (i, _) =>
      val ts = toks(i)
      got(i)._1 shouldBe ts.length.toLong
      val expected =
        math.log(total) - ts.map(t => math.log(ctf(t).toDouble)).sum / ts.length
      got(i)._2 shouldBe expected +- 1e-9
    }
  }
}
