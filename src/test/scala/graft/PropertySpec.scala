package graft

import graft.functions.Dedup
import graft.operators.TemporalOps
import org.apache.spark.sql.functions._
import scala.util.Random

/** Randomized differential tests (fixed seeds): each operator vs a
 * driver-side brute-force model on generated data. Complements the
 * example-based specs with coverage of tie/null/boundary interactions the
 * examples don't enumerate. */
class PropertySpec extends SparkTestBase {

  private def randEvents(seed: Long, n: Int, nUsers: Int, tsRange: Int)
      : Seq[(Long, Long, Long, Double)] = {
    val rnd = new Random(seed)
    (1 to n).map(i => (i.toLong, rnd.nextInt(nUsers).toLong,
      rnd.nextInt(tsRange).toLong, rnd.nextInt(100).toDouble))
  }

  test("asofJoin matches brute force on random data (3 seeds)") {
    for (seed <- Seq(1L, 7L, 42L)) {
      val clicks = randEvents(seed, 80, 5, 50)
      val purchases = randEvents(seed + 100, 40, 5, 50)
      val cdf = df(clicks.map(c => Seq(c._1, c._2, c._3)), "event_id:long,user_id:long,ts:long")
      val pdf = df(purchases.map(p => Seq(p._2, p._3, p._1, p._4)),
        "user_id:long,ts:long,prior_id:long,prior_value:double")
      val got = TemporalOps.asofJoin(cdf, pdf, keys = Seq("user_id"),
        tsCol = "ts", tieBreak = Seq("prior_id"))
        .select("event_id", "prior_id")
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      // brute force: latest purchase with p.ts <= c.ts, ties -> max prior_id
      val want = clicks.map { c =>
        val cand = purchases.filter(p => p._2 == c._2 && p._3 <= c._3)
        c._1 -> (if (cand.isEmpty) -1L
          else {
            val maxTs = cand.map(_._3).max
            cand.filter(_._3 == maxTs).map(_._1).max
          })
      }.toMap
      assert(got === want, s"seed $seed")
    }
  }

  test("sessionize matches brute force session boundaries (3 seeds)") {
    for (seed <- Seq(2L, 13L, 99L)) {
      val ev = randEvents(seed, 60, 4, 10000).map(e =>
        (e._1, e._2, e._3 * 1000000L)) // µs timestamps, gaps up to ~10^10 µs
      val edf2 = df(ev.map(e => Seq(e._1, e._2, e._3)),
        "event_id:long,user_id:long,us:long")
        .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      val got = TemporalOps.sessionize(edf2, Seq("user_id"), "ts",
        "30 minutes", tieBreak = Seq("event_id"))
        .select("event_id", "session_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // brute force per user: sort by (ts, event_id), new session when
      // gap > 30min (1.8e9 µs)
      val gap = 30L * 60 * 1000000
      val want = ev.groupBy(_._2).flatMap { case (_, rows) =>
        val sorted = rows.sortBy(e => (e._3, e._1))
        var sid = -1L
        var lastTs = Long.MinValue
        sorted.map { e =>
          if (lastTs == Long.MinValue || e._3 > lastTs + gap) sid += 1
          lastTs = e._3
          e._1 -> sid
        }
      }.toMap
      assert(got === want, s"seed $seed")
    }
  }

  test("Dedup.exact matches brute-force min-tiebreak dedup (3 seeds)") {
    for (seed <- Seq(3L, 17L, 71L)) {
      val rnd = new Random(seed)
      val rows = (1 to 100).map(i => (i.toLong, s"k${rnd.nextInt(20)}"))
      val d = df(rows.map(r => Seq(r._2, r._1)), "k:str,id:long")
      val got = Dedup.exact(d, Seq("k"), "id")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val want = rows.groupBy(_._2).map { case (k, g) => (k, g.map(_._1).min) }.toSet
      assert(got === want, s"seed $seed")
    }
  }

  test("take per-key matches brute-force window (3 seeds)") {
    for (seed <- Seq(5L, 23L, 91L)) {
      val ev = randEvents(seed, 100, 6, 30)
      val d = df(ev.map(e => Seq(e._1, e._2, e._3)), "event_id:long,user_id:long,ts:long")
      val got = engine.take(d, 2, PartitionSpec(by = Seq("user_id"),
        presort = Seq("ts" -> false, "event_id" -> true)))
        .collect().map(_.getLong(0)).toSet
      val want = ev.groupBy(_._2).flatMap { case (_, g) =>
        g.sortBy(e => (-e._3, e._1)).take(2).map(_._1)
      }.toSet
      assert(got === want, s"seed $seed")
    }
  }

  test("native shingle hashes match the declarative formulation on random whitespace-heavy text (3 seeds)") {
    val wsChars = Array(' ', '\t', '\n', '\u000B', '\f', '\r')
    val words = Array("alpha", "beta", "Gamma", "DELTA", "e", "f1", "42", "x-y", "ü")
    for (seed <- Seq(3L, 11L, 29L)) {
      val rnd = new Random(seed)
      val texts = (1 to 60).map { i =>
        val n = rnd.nextInt(12)
        val sb = new StringBuilder
        if (rnd.nextBoolean()) sb ++= wsChars(rnd.nextInt(wsChars.length)).toString
        (1 to n).foreach { _ =>
          sb ++= words(rnd.nextInt(words.length))
          (0 to rnd.nextInt(2)).foreach(_ =>
            sb ++= wsChars(rnd.nextInt(wsChars.length)).toString)
        }
        Seq(i.toLong, sb.toString)
      }
      val d = df(texts, "id:long,t:str")
      for (k <- Seq(1, 2, 3)) {
        val native = d.select(col("id"), Dedup.shingleHashes(col("t"), k).as("sh"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
        val decl = d.select(col("id"), Dedup.shingleHashesDeclarative(col("t"), k).as("sh"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
        assert(native === decl, s"seed=$seed k=$k")
      }
    }
  }

  test("native span hashes match the declarative formulation on random whitespace-heavy text (3 seeds)") {
    // SpanHashes replaced the interpreted HOF chain on the exact-substring
    // hot path; this pins positional byte-for-byte hash equality, blanks
    // and boundary-whitespace artifacts included
    val wsChars = Array(' ', '\t', '\n', '\u000B', '\f', '\r')
    val words = Array("alpha", "beta", "Gamma", "e", "42", "x-y", "ü", "beta")
    for (seed <- Seq(5L, 13L, 31L)) {
      val rnd = new Random(seed)
      val texts = (1 to 60).map { i =>
        val n = rnd.nextInt(12)
        val sb = new StringBuilder
        if (rnd.nextBoolean()) sb ++= wsChars(rnd.nextInt(wsChars.length)).toString
        (1 to n).foreach { _ =>
          sb ++= words(rnd.nextInt(words.length))
          (0 to rnd.nextInt(2)).foreach(_ =>
            sb ++= wsChars(rnd.nextInt(wsChars.length)).toString)
        }
        Seq(i.toLong, sb.toString)
      }
      val d = df(texts, "id:long,t:str")
      for (k <- Seq(1, 2, 3)) {
        val toks = graft.functions.TextFunctions.tokensOrEmpty(col("t"))
        val decl = when(size(toks) >= k,
          transform(sequence(lit(1), size(toks) - k + 1),
            i => xxhash64(concat_ws(" ", slice(toks, i, lit(k))))))
          .otherwise(array().cast("array<long>"))
        val native = d.select(col("id"),
          graft.functions.expressions.VectorExpressions.spanHashes(col("t"), k)
            .as("sp")).collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
        val declared = d.select(col("id"), decl.as("sp"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
        assert(native === declared, s"seed=$seed k=$k")
      }
    }
  }

  test("chunkByTokens covers every token with correct overlap (3 seeds)") {
    import graft.functions.TextFunctions
    for (seed <- Seq(5L, 13L, 31L)) {
      val rnd = new Random(seed)
      val texts = (1 to 40).map { i =>
        Seq(i.toLong, (1 to (1 + rnd.nextInt(30))).map(j => s"w$j").mkString(" "))
      }
      val d = df(texts, "id:long,t:str")
      val chunk = 2 + rnd.nextInt(6)
      val overlap = rnd.nextInt(chunk)
      val stride = chunk - overlap
      val got = TextFunctions.chunkByTokens(d, "id", "t", chunk, overlap)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
        .groupBy(_._1).map { case (id, rows) =>
          id -> rows.sortBy(_._2).map(_._3).toSeq }
      texts.foreach { case Seq(id: Long, t: String) =>
        val toks = t.split(" ").toSeq
        val chunks = got(id)
        // reconstruction: chunk j must be exactly tokens [j*stride, j*stride+chunk)
        chunks.zipWithIndex.foreach { case (c, j) =>
          assert(c === toks.slice(j * stride, j * stride + chunk).mkString(" "),
            s"seed=$seed id=$id chunk=$j (chunk=$chunk overlap=$overlap)")
        }
        // coverage: the last chunk must reach the final token
        assert((chunks.length - 1) * stride + chunk >= toks.length,
          s"seed=$seed id=$id: tokens uncovered")
        // no superfluous trailing chunk (previous chunks didn't already cover)
        if (chunks.length > 1)
          assert((chunks.length - 2) * stride + chunk < toks.length,
            s"seed=$seed id=$id: redundant trailing chunk")
      }
    }
  }

  test("contaminationScores matches driver-side brute force (3 seeds)") {
    for (seed <- Seq(7L, 19L, 43L)) {
      val rnd = new Random(seed)
      val vocab = (1 to 15).map(i => s"w$i")
      def text() = (1 to (5 + rnd.nextInt(15)))
        .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
      val corpus = (1 to 50).map(i => (i.toLong, text()))
      val evalSet = corpus.take(8)
      val d = df(corpus.map(c => Seq(c._1, c._2)), "doc_id:long,text:str")
      val e = df(evalSet.map(c => Seq(c._1, c._2)), "doc_id:long,text:str")
      Dedup.clearSignatureCache()
      val got = Dedup.contaminationScores(d, "doc_id", "text", e, "text", 3)
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
      // brute force with the same tokenization/windows (hash-free: string
      // shingles — identical sets modulo xxhash collisions)
      def shingles(t: String): Set[String] =
        t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      val evalSh = evalSet.flatMap(c => shingles(c._2)).toSet
      corpus.foreach { case (id, t) =>
        val sh = shingles(t)
        if (sh.isEmpty) assert(!got.contains(id))
        else {
          val (n, m) = got(id)
          assert(n === sh.size, s"seed=$seed id=$id n_shingles")
          assert(m === sh.count(evalSh.contains).toLong, s"seed=$seed id=$id n_matched")
        }
      }
    }
  }

  test("prefix-filtered jaccard == brute force on random corpora (3 seeds x 3 thresholds)") {
    for (seed <- Seq(9L, 23L, 41L)) {
      val rnd = new Random(seed)
      val vocab = (1 to 12).map(i => s"w$i")
      def text() = (1 to (4 + rnd.nextInt(12)))
        .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
      val corpus = (1 to 40).map(i => (i.toLong, text()))
      val d = df(corpus.map(c => Seq(c._1, c._2)), "doc_id:long,text:str")
      def shingles(t: String): Set[String] =
        t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      Dedup.clearSignatureCache()
      val sigs = Dedup.shingleStage(d, "doc_id", "text", 3)
      for (t <- Seq(0.34, 0.5, 0.8)) {
        val want = (for {
          i <- corpus.indices; j <- (i + 1) until corpus.length
          a = shingles(corpus(i)._2); b = shingles(corpus(j)._2)
          if a.nonEmpty && b.nonEmpty
          inter = (a & b).size
          if inter > 0 && inter.toDouble / (a.size + b.size - inter) >= t
        } yield (corpus(i)._1, corpus(j)._1)).toSet
        val got = Dedup.ngramJaccardPrefixFiltered(sigs, t)
          .select("id_a", "id_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got === want, s"seed=$seed threshold=$t")
      }
    }
  }

  test("dropNearDuplicatesBy matches brute-force components on random graphs (3 seeds)") {
    for (seed <- Seq(17L, 37L, 53L)) {
      val rnd = new Random(seed)
      val n = 30
      val rows = (1 to n).map(i => Seq(i.toLong, rnd.nextInt(100)))
      val d = df(rows, "doc_id:long,q:int")
      val edges = (1 to 25).map(_ =>
        (1 + rnd.nextInt(n).toLong, 1 + rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val pairs = df(edges.map(e => Seq(e._1, e._2)), "id_a:long,id_b:long")
      // brute-force components
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val byComp = (1 to n).map(i => i.toLong).groupBy(find)
      val quality = rows.map(r => r.head.asInstanceOf[Long] -> r(1).asInstanceOf[Int]).toMap
      val wantBest = byComp.values.map(ids =>
        ids.minBy(id => (-quality(id), id))).toSet
      for (dme <- Seq(1 << 18, 0)) {
        val got = Dedup.dropNearDuplicatesBy(d, "doc_id", pairs, "q",
          driverMaxEdges = dme)
          .select("doc_id").collect().map(_.getLong(0)).toSet
        assert(got === wantBest, s"seed=$seed driverMaxEdges=$dme")
        val comps = Dedup.nearDupComponents(d, "doc_id", pairs, driverMaxEdges = dme)
          .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
        (1 to n).foreach(i =>
          assert(comps(i.toLong) === find(i.toLong), s"seed=$seed id=$i dme=$dme"))
      }
    }
  }

  test("rangeJoin == naive cross filter on random data (3 seeds, with longs)") {
    for (seed <- Seq(3L, 17L, 51L)) {
      val rnd = new Random(seed)
      val pts = (1 to 150).map(i => (i.toLong, rnd.nextInt(500).toDouble))
      val ivs = (1 to 60).map { j =>
        val s = rnd.nextInt(480).toDouble
        // ~1 in 6 intervals is LONG (exceeds maxBinsPerInterval at width 10)
        val len = if (rnd.nextInt(6) == 0) 200 + rnd.nextInt(200) else rnd.nextInt(30)
        (j.toLong, s, s + len)
      }
      val l = df(pts.map(p => Seq(p._1, p._2)), "pid:long,p:double")
      val r = df(ivs.map(v => Seq(v._1, v._2, v._3)), "iid:long,s:double,e:double")
      val got = TemporalOps.rangeJoin(l, r, "p", "s", "e", binWidth = 10.0,
        maxBinsPerInterval = 16)
        .select("pid", "iid").collect().map(x => (x.getLong(0), x.getLong(1)))
      val want = (for {
        p <- pts; v <- ivs if p._2 >= v._2 && p._2 <= v._3
      } yield (p._1, v._1)).toSet
      assert(got.length === got.toSet.size, s"seed $seed: duplicate pairs")
      assert(got.toSet === want, s"seed $seed")
    }
  }

  test("intervalJoin == naive overlap filter on random data (3 seeds, with longs)") {
    for (seed <- Seq(5L, 23L, 77L)) {
      val rnd = new Random(seed)
      def ivs(n: Int, off: Int) = (1 to n).map { j =>
        val s = rnd.nextInt(400).toDouble
        val len = if (rnd.nextInt(8) == 0) 150 + rnd.nextInt(150) else rnd.nextInt(25)
        ((j + off).toLong, s, s + len)
      }
      val ls = ivs(70, 0); val rs = ivs(50, 1000)
      val l = df(ls.map(v => Seq(v._1, v._2, v._3)), "lid:long,ls:double,le:double")
      val r = df(rs.map(v => Seq(v._1, v._2, v._3)), "rid:long,rs:double,re:double")
      val got = TemporalOps.intervalJoin(l, r, "ls", "le", "rs", "re",
        binWidth = 12.0, maxBinsPerInterval = 8)
        .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
      val want = (for {
        a <- ls; b <- rs if a._2 <= b._3 && b._2 <= a._3
      } yield (a._1, b._1)).toSet
      assert(got.length === got.toSet.size, s"seed $seed: duplicate pairs")
      assert(got.toSet === want, s"seed $seed")
    }
  }

  test("segmentDedup matches brute-force first-occurrence model (3 seeds)") {
    for (seed <- Seq(11L, 29L, 63L)) {
      val rnd = new Random(seed)
      val vocab = Seq("a", "b", "c")
      // tiny vocab + short segments → plenty of cross-doc collisions
      val docsS = (1 to 40).map(i =>
        (i.toLong, (1 to (rnd.nextInt(12) + 1)).map(_ =>
          vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      val d = df(docsS.map(x => Seq(x._1, x._2)), "doc_id:long,text:str")
      val segLen = 2
      val got = Dedup.segmentDedup(d, "doc_id", "text", segLen)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // driver model
      val segsOf = docsS.map { case (id, t) =>
        id -> t.split("\\s+").filter(_.nonEmpty).grouped(segLen)
          .map(_.mkString(" ")).toList
      }.toMap
      val owner = scala.collection.mutable.HashMap.empty[String, (Long, Int)]
      for ((id, segs) <- segsOf.toSeq.sortBy(_._1); (s, pos) <- segs.zipWithIndex)
        if (!owner.contains(s) || Ordering[(Long, Int)].lt((id, pos), owner(s)))
          owner(s) = (id, pos)
      val want = segsOf.map { case (id, segs) =>
        id -> segs.zipWithIndex
          .filter { case (s, pos) => owner(s) == ((id, pos)) }
          .map(_._1).mkString(" ")
      }
      assert(got === want, s"seed $seed")
    }
  }

  test("packSequences is partitioning-invariant and stream-faithful (2 seeds)") {
    for (seed <- Seq(19L, 41L)) {
      val rnd = new Random(seed)
      val enc = (1 to 60).map(i =>
        (i.toLong, (0 until rnd.nextInt(9)).map(_ => rnd.nextInt(50).toLong)))
      val flat = enc.sortBy(_._1).flatMap(_._2)
      val d = df(enc.map(x => Seq(x._1, x._2)), "doc_id:long,ids:[long]")
      for (parts <- Seq(1, 7)) {
        val out = graft.functions.TextFunctions
          .packSequences(d.repartition(parts), "doc_id", "ids", seqLen = 16)
          .orderBy("example_id").collect()
          .map(r => (r.getLong(0), r.getSeq[Long](1).toList))
        val wantIds = flat.grouped(16).toList
        assert(out.map(_._2) === wantIds, s"seed $seed parts $parts")
        assert(out.map(_._1) === wantIds.indices.map(_.toLong), s"seed $seed")
      }
    }
  }

  test("unigramCrossEntropy is partitioning-invariant (decimal-exact sums)") {
    import graft.functions.TextFunctions
    val rnd = new Random(71L)
    val vocab = (1 to 20).map(i => s"w$i")
    val corpus = (1 to 60).map(i =>
      Seq(i.toLong, (1 to (3 + rnd.nextInt(20)))
        .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")))
    val d1 = df(corpus, "doc_id:long,text:str")
    val a = TextFunctions.unigramCrossEntropy(d1, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val b = TextFunctions.unigramCrossEntropy(d1.repartition(7), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(a === b) // bit-identical, not approximately equal
  }

  test("ngramJaccardPairs threshold boundary on crafted near-boundary pairs") {
    // jaccard exactly 0.5: |A∩B|=2, |A|=|B|=3 → 2/(3+3-2)=0.5 (inclusive)
    val a = "w1 w2 w3 w4 w5" // shingles: (w1 w2 w3)(w2 w3 w4)(w3 w4 w5)
    val b = "w1 w2 w3 w4 zz" // shingles: (w1 w2 w3)(w2 w3 w4)(w3 w4 zz) → inter=2
    val d = df(Seq(Seq(1L, a), Seq(2L, b)), "doc_id:long,text:str")
    val got = Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length === 1)
    assert(got.head._3 === 0.5)
    // threshold just above excludes
    assert(Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.51).count() === 0)
  }

  test("canonicalizeUrl is idempotent and law-abiding on random URLs (3 seeds)") {
    import graft.functions.TextFunctions
    def gen(seed: Long, n: Int): Seq[String] = {
      val rnd = new Random(seed)
      def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))
      (1 to n).map { _ =>
        val scheme = pick(Seq("http", "HTTP", "https", "HTTPS", "ftp", ""))
        val host = pick(Seq("Example.COM", "sub.example.org", "A.b.C.net"))
        val port = pick(Seq("", ":80", ":443", ":8080"))
        val path = pick(Seq("", "/", "/a", "/a/B"))
        val params = (0 until rnd.nextInt(4)).map(_ =>
          pick(Seq("q=1", "utm_source=x", "fbclid=Y", "a=b", "utm_campaign=z",
            "gclid=", "id=9")))
        val query = if (params.isEmpty) "" else "?" + params.mkString("&")
        val frag = pick(Seq("", "#f", "#sec-2"))
        if (scheme.isEmpty) pick(Seq("plain text", "  spaced  ", "no/scheme?here=1"))
        else s"$scheme://$host$port$path$query$frag"
      }
    }
    for (seed <- Seq(3L, 19L, 55L)) {
      val urls = gen(seed, 120)
      val d = df(urls.zipWithIndex.map { case (u, i) => Seq(i.toLong, u) },
        "id:long,u:str")
      val once = d.select(col("id"), col("u"),
        TextFunctions.canonicalizeUrl(col("u")).as("c1"))
      val twice = once.select(col("id"), col("u"), col("c1"),
        TextFunctions.canonicalizeUrl(col("c1")).as("c2")).collect()
      twice.foreach { r =>
        val (u, c1, c2) = (r.getString(1), r.getString(2), r.getString(3))
        assert(c1 == c2, s"not idempotent: '$u' -> '$c1' -> '$c2'")
        // canonical URLs never carry tracking params or fragments
        assert(!c1.contains("utm_") && !c1.contains("fbclid") &&
          !c1.contains("gclid") && !c1.contains("#"), s"'$u' -> '$c1'")
        if (u.trim.matches("(?i)^[a-z][a-z0-9+.-]*://.*")) {
          // scheme and host are lowercased; non-tracking params survive
          val scheme = c1.takeWhile(_ != ':')
          assert(scheme == scheme.toLowerCase)
          if (u.contains("q=1")) assert(c1.contains("q=1"), s"'$u' -> '$c1'")
        } else assert(c1 == u.trim, s"non-URL must pass through trimmed: '$u' -> '$c1'")
      }
    }
  }

  test("snapshotDiff/upsert inverse law on random versions (3 seeds)") {
    import graft.operators.{Diff, Upsert}
    for (seed <- Seq(11L, 22L, 33L)) {
      val rnd = new Random(seed)
      def snap(): Seq[(Long, String, Double)] =
        (0L until 60L).filter(_ => rnd.nextDouble() > 0.2).map(k =>
          (k, if (rnd.nextDouble() < 0.1) null else s"v${rnd.nextInt(5)}",
            rnd.nextInt(10).toDouble))
      val before = df(snap().map(t => Seq(t._1, t._2, t._3)), "id:long,tag:str,v:double")
      val after = df(snap().map(t => Seq(t._1, t._2, t._3)), "id:long,tag:str,v:double")
      // self-diff is empty; hashOnly classification == semantic classification
      assert(Diff.snapshotDiff(before, before, Seq("id")).count() === 0)
      val sem = Diff.snapshotDiff(before, after, Seq("id")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val hsh = Diff.snapshotDiff(before, after, Seq("id"), hashOnly = true)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(sem === hsh)
      // replaying the diff as a CDC batch onto `before` reproduces `after`
      val rows = Diff.snapshotDiffRows(before, after, Seq("id"))
      val changes = rows.select(col("id"),
        when(col("change") === "removed", lit("D")).otherwise(lit("U")).as("op"),
        col("after.tag").as("tag"), col("after.v").as("v"))
      val rebuilt = Upsert.upsert(before, changes, Seq("id"))
        .select("id", "tag", "v")
      assert(graft.api.DfUtils.dfEq(rebuilt, after),
        s"seed $seed: upsert(before, diff) != after")
    }
  }

  test("histogram conserves mass and places every value in its bucket (3 seeds)") {
    import graft.functions.Stats
    for (seed <- Seq(7L, 8L, 9L)) {
      val rnd = new Random(seed)
      val vals = (1 to 300).map(_ =>
        if (rnd.nextDouble() < 0.1) null
        else java.lang.Double.valueOf(rnd.nextDouble() * 100 - 50))
      val d = df(vals.zipWithIndex.map { case (v, i) => Seq(i.toLong, v) },
        "id:long,v:double")
      val bins = 1 + rnd.nextInt(30)
      val h = Stats.histogram(d, "v", bins).collect()
        .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
      val nonNull = vals.flatMap(Option(_)).map(_.doubleValue)
      assert(h.map(_._4).sum === nonNull.size, "mass conserved")
      assert(h.length === bins)
      // recompute each value's bucket with the operator's formula
      val (mn, mx) = (nonNull.min, nonNull.max)
      val w = (mx - mn) / bins
      val expect = nonNull.groupBy(v =>
        math.min(math.floor((v - mn) / w).toInt, bins - 1))
        .view.mapValues(_.size.toLong).toMap
      h.foreach { case (b, lo, hi, n) =>
        assert(n === expect.getOrElse(b, 0L), s"seed $seed bucket $b")
        assert(math.abs(lo - (mn + b * w)) < 1e-9)
        assert(math.abs(hi - (mn + (b + 1) * w)) < 1e-9)
      }
    }
  }

  test("correlationMatrix laws: bounds, exact linear, list-order invariance (3 seeds)") {
    import graft.functions.Stats
    for (seed <- Seq(4L, 5L, 6L)) {
      val rnd = new Random(seed)
      val rows = (1 to 200).map { i =>
        val x = rnd.nextDouble() * 10
        Seq(i.toLong, x, 2.0 * x + 3.0, rnd.nextDouble() * 10)
      }
      val d = df(rows, "id:long,x:double,lin:double,z:double")
      val m = Stats.correlationMatrix(d, Seq("x", "lin", "z")).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
      assert(math.abs(m(("x", "lin")) - 1.0) < 1e-6, "exact linear pair")
      m.values.foreach(c => assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9))
      // list order changes pair labels, not values
      val m2 = Stats.correlationMatrix(d, Seq("z", "x", "lin")).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
      assert(m2(("z", "x")) === m(("x", "z")))
      assert(m2(("x", "lin")) === m(("x", "lin")))
    }
  }

  test("Checks.enforce throws iff validate reports a failed row (3 seeds)") {
    import graft.functions.Checks
    for (seed <- Seq(1L, 2L, 3L)) {
      val rnd = new Random(seed)
      val rows = (1 to 100).map(i => Seq(i.toLong, rnd.nextInt(50).toDouble))
      val d = df(rows, "id:long,v:double")
      val loose = Seq(Checks.rowCountBetween(1, 1000),
        Checks.minValue("v", -1), Checks.unique("id"))
      assert(Checks.validate(d, loose).filter(!col("passed")).count() === 0)
      Checks.enforce(d, loose) // must not throw
      val tight = loose :+ Checks.maxValue("v", 10.0)
      val failed = Checks.validate(d, tight).filter(!col("passed")).count()
      if (failed > 0) intercept[IllegalStateException] { Checks.enforce(d, tight) }
      else Checks.enforce(d, tight)
    }
  }

  test("selectByBudget == brute-force prefix; monotone in budget; layout-invariant (3 seeds)") {
    import graft.functions.Sampling
    for (seed <- Seq(3L, 19L, 77L)) {
      val rnd = new Random(seed)
      val rows = (1 to 120).map(i =>
        (i.toLong, 1L + rnd.nextInt(40).toLong, rnd.nextInt(10).toLong))
      val d = df(rows.map(r => Seq(r._1, r._2, r._3)),
        "id:long,toks:long,score:long")
      def run(frame: org.apache.spark.sql.DataFrame, budget: Long): Set[Long] =
        Sampling.selectByBudget(frame, col("toks"), "score", Seq("id"), budget)
          .select("id").collect().map(_.getLong(0)).toSet
      // brute force: sort (score desc, id asc), inclusive prefix <= budget
      def brute(budget: Long): Set[Long] = {
        var cum = 0L
        rows.sortBy(r => (-r._3, r._1)).iterator.map { r =>
          cum += r._2; (r._1, cum)
        }.takeWhile(_._2 <= budget).map(_._1).toSet
      }
      for (budget <- Seq(0L, 50L, 500L, 5000L)) {
        assert(run(d, budget) === brute(budget), s"seed $seed budget $budget")
        // repartitioning must not change the selection (ties broken by id)
        assert(run(d.repartition(7), budget) === brute(budget),
          s"seed $seed budget $budget repartitioned")
      }
      // monotone: a bigger budget only ever ADDS documents
      assert(brute(50L).subsetOf(brute(500L)) && brute(500L).subsetOf(brute(5000L)))
    }
  }

  test("quantizeInt8 laws: error bound, code range, stable re-quantization (3 seeds)") {
    import graft.functions.Similarity
    for (seed <- Seq(6L, 37L, 88L)) {
      val rnd = new Random(seed)
      val rows = (1 to 150).map { i =>
        // mixed magnitudes and signs, incl. constant and near-constant
        val scale = math.pow(10, rnd.nextInt(7) - 3)
        (i.toLong, Array.fill(1 + rnd.nextInt(16))(
          (rnd.nextGaussian() * scale)))
      }
      val d = df(rows.map(r => Seq(r._1, r._2.toSeq)), "id:long,v:[double]")
      val out = d.select(col("id"),
        col("v"),
        Similarity.quantizeInt8(col("v")).as("q"),
        Similarity.dequantizeInt8(Similarity.quantizeInt8(col("v"))).as("deq"))
        .withColumn("q2", Similarity.quantizeInt8(col("deq")))
        .collect()
      out.foreach { r =>
        val v = r.getSeq[Double](1)
        val q = r.getStruct(2)
        val deq = r.getSeq[Double](3)
        val q2 = r.getStruct(4)
        val s = q.getDouble(1)
        // per-coordinate reconstruction error <= scale/2 (+ FP slack)
        v.zip(deq).foreach { case (a, b) =>
          assert(math.abs(a - b) <= s / 2 * (1 + 1e-9) + 1e-300,
            s"seed $seed id ${r.getLong(0)}")
        }
        // codes span the declared byte range and hit both endpoints
        val codes = q.getSeq[Byte](2)
        assert(codes.min === -128.toByte)
        if (s > 0) assert(codes.max === 127.toByte)
        // re-quantizing the reconstruction is stable: codes differ by <= 1
        // (the affine map reproduces its own grid up to FP rounding)
        codes.zip(q2.getSeq[Byte](2)).foreach { case (a, b) =>
          assert(math.abs(a - b) <= 1, s"seed $seed code $a vs $b")
        }
      }
    }
  }

  test("PCA captures a planted low-rank subspace; overlapEstimate tracks exact jaccard (3 seeds)") {
    import graft.functions.{Pca, Sketches}
    for (seed <- Seq(5L, 23L, 91L)) {
      val rnd = new Random(seed)
      // rank-2 data in 8 dims: every vector a combination of two fixed axes
      val b1 = Array.fill(8)(rnd.nextGaussian())
      val b2 = Array.fill(8)(rnd.nextGaussian())
      val rows = (1 to 300).map { i =>
        val (x, y) = (rnd.nextGaussian() * 5, rnd.nextGaussian() * 2)
        (i.toLong, (0 until 8).map(j => (x * b1(j) + y * b2(j)).toFloat))
      }
      val d = df(rows.map(r => Seq(r._1, r._2)), "id:long,vec:[float]")
      val model = Pca.fit(d, "vec", 2)
      // the two components must capture (essentially) ALL the variance
      assert(model.explainedVariance.sum >= 0.999 * model.totalVariance,
        s"seed $seed: rank-2 data needs 2 components")

      val corpusA = (1 to 200).map(i => s"s$seed-${rnd.nextInt(300)}")
      val corpusB = (1 to 200).map(i => s"s$seed-${rnd.nextInt(300)}")
      val got = Sketches.overlapEstimate(
        df(corpusA.map(Seq(_)), "v:str"), df(corpusB.map(Seq(_)), "v:str"),
        "v").collect()(0)
      val (sa, sb) = (corpusA.toSet, corpusB.toSet)
      val exactU = (sa ++ sb).size.toLong
      val exactI = (sa & sb).size.toLong
      assert(math.abs(got.getLong(2) - exactU) <= math.max(3L, exactU / 20),
        s"seed $seed union")
      assert(math.abs(got.getLong(3) - exactI) <= math.max(3L, exactU / 20),
        s"seed $seed intersection")
    }
  }

  test("mergeIntervals matches driver brute force; idempotent (3 seeds)") {
    for (seed <- Seq(4L, 23L, 88L)) {
      val rnd = new Random(seed)
      val iv = (1 to 120).map { _ =>
        val k = s"k${rnd.nextInt(4)}"
        val s = rnd.nextInt(200).toLong
        (k, s, s + 1 + rnd.nextInt(20))
      }
      def brute(xs: Seq[(String, Long, Long)]): Set[(String, Long, Long, Long)] =
        xs.groupBy(_._1).flatMap { case (k, g) =>
          val sorted = g.map(t => (t._2, t._3)).sortBy(identity)
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
          sorted.foreach { case (s, e) =>
            if (out.nonEmpty && s <= out.last._2) {
              val (cs, ce, cn) = out.last
              out(out.length - 1) = (cs, math.max(ce, e), cn + 1)
            } else out += ((s, e, 1L))
          }
          out.map(t => (k, t._1, t._2, t._3))
        }.toSet
      val got = TemporalOps.mergeIntervals(
        df(iv.map(t => Seq(t._1, t._2, t._3)), "k:str,s:long,e:long"),
        Seq("k"), "s", "e")
      val gotSet = got.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(gotSet === brute(iv), s"seed $seed")
      // idempotence: merging the merged output changes nothing
      val again = TemporalOps.mergeIntervals(got, Seq("k"), "s", "e")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(again === gotSet.map(t => (t._1, t._2, t._3)), s"seed $seed idem")
    }
  }

  test("gapFill matches driver brute-force interpolation exactly (3 seeds)") {
    for (seed <- Seq(6L, 31L, 77L)) {
      val rnd = new Random(seed)
      // sparse observations on a minute grid inside one day
      val obs = (1 to 50).map { _ =>
        (s"g${rnd.nextInt(3)}", rnd.nextInt(1440), rnd.nextInt(1000) / 10.0)
      }
      val rows = obs.map { case (g, m, v) =>
        Seq(g, f"2024-01-01 ${m / 60}%02d:${m % 60}%02d:00", v)
      }
      val step = 900L
      val got = TemporalOps.gapFill(
        df(rows, "g:str,ts:datetime,v:double"), "ts", "v", step, Seq("g"))
        .collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime / 1000,
          r.getDouble(2), r.getBoolean(3))).toSet
      // driver model replicating the exact arithmetic (epoch from the
      // minute offset + the session-UTC day start; decimal-bridged mean)
      val day = java.time.LocalDate.of(2024, 1, 1)
        .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
      val want = obs.groupBy(_._1).flatMap { case (g, rowsG) =>
        val byBucket = rowsG
          .groupBy(t => (day + t._2 * 60L) / step * step)
          .map { case (b, vs) =>
            b -> (vs.map(t => BigDecimal(t._3).setScale(6,
              BigDecimal.RoundingMode.HALF_UP)).sum.toDouble /
              vs.size.toDouble)
          }
        val (lo, hi) = (byBucket.keys.min, byBucket.keys.max)
        (lo to hi by step).map { b =>
          byBucket.get(b) match {
            case Some(v) => (g, b, v, false)
            case None =>
              val pe = byBucket.keys.filter(_ < b).max
              val ne = byBucket.keys.filter(_ > b).min
              val (pv, nv) = (byBucket(pe), byBucket(ne))
              (g, b, pv + (nv - pv) * ((b - pe).toDouble / (ne - pe).toDouble),
                true)
          }
        }
      }.toSet
      assert(got === want, s"seed $seed")
    }
  }

  test("rankNormalize matches driver Hazen quantiles under heavy ties (3 seeds)") {
    for (seed <- Seq(9L, 41L, 73L)) {
      val rnd = new Random(seed)
      val data = (1 to 200).map(i => (i.toLong, rnd.nextInt(10).toDouble))
      val got = graft.functions.Sampling.rankNormalize(
        df(data.map(t => Seq(t._1, t._2)), "id:long,v:double"),
        "v", Seq("id"))
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      val want = data.sortBy(t => (t._2, t._1)).zipWithIndex
        .map { case ((id, _), i) => id -> (i + 0.5) / 200.0 }.toMap
      assert(got === want, s"seed $seed")
    }
  }

  test("triangleCount: direction/duplication invariant, equals brute force (3 seeds)") {
    for (seed <- Seq(11L, 37L, 91L)) {
      val rnd = new Random(seed)
      val base = (1 to 100).map(_ =>
        (rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
      val noisy = base.flatMap { case (a, b) =>
        val flipped = if (rnd.nextBoolean()) (b, a) else (a, b)
        if (rnd.nextInt(3) == 0) Seq(flipped, (a, b)) else Seq(flipped)
      }
      import graft.operators.Graph
      def run(es: Seq[(Long, Long)]) =
        Graph.triangleCount(df(es.map(t => Seq(t._1, t._2)),
          "src:long,dst:long"), "src", "dst")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = run(base)
      assert(got === run(noisy), s"seed $seed invariance")
      // driver brute force over the simple graph
      val simple = base.filter(t => t._1 != t._2)
        .map(t => (math.min(t._1, t._2), math.max(t._1, t._2))).distinct
      val adj = (simple ++ simple.map(t => (t._2, t._1)))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      val nodes = (simple.map(_._1) ++ simple.map(_._2)).distinct
      val want = nodes.map { v =>
        val ns = adj.getOrElse(v, Set.empty).toSeq
        v -> (for {
          i <- ns.indices; j <- (i + 1) until ns.size
          if adj(ns(i)).contains(ns(j))
        } yield 1).size.toLong
      }.toMap
      assert(got === want, s"seed $seed brute")
    }
  }

  test("funnel matches driver brute force on random event streams (3 seeds)") {
    for (seed <- Seq(14L, 52L, 97L)) {
      val rnd = new Random(seed)
      val evs = Seq("a", "b", "c")
      val stream = (1 to 300).map { _ =>
        (s"u${rnd.nextInt(12)}", rnd.nextInt(5000).toLong,
          evs(rnd.nextInt(3)))
      }
      val rows = stream.map { case (u, t, e) =>
        Seq(u, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(t))
          .toInstant.atZone(java.time.ZoneOffset.UTC)
          .format(java.time.format.DateTimeFormatter
            .ofPattern("yyyy-MM-dd HH:mm:ss")), e)
      }
      val window = 1000L
      val got = TemporalOps.funnel(
        df(rows, "u:str,ts:datetime,ev:str"), "u", "ts", "ev", evs, window)
        .collect().map(r => r.getString(0) ->
          (1 to 3).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i))))
        .toMap
      val want = stream.groupBy(_._1).flatMap { case (u, g) =>
        val s1 = g.filter(_._3 == "a").map(_._2).minOption
        s1.map { t1 =>
          val s2 = g.filter(e => e._3 == "b" && e._2 >= t1 &&
            e._2 <= t1 + window).map(_._2).minOption
          val s3 = s2.flatMap(t2 => g.filter(e => e._3 == "c" &&
            e._2 >= t2 && e._2 <= t1 + window).map(_._2).minOption)
          u -> Seq(Some(t1), s2, s3)
        }
      }
      assert(got === want, s"seed $seed")
    }
  }
}
