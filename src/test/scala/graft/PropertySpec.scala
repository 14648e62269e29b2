package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5.3) on driver-generated data
  * plus scalacheck-generated frames (sampled with fixed seeds — the
  * scalatestplus bridge artifact is not in the offline cache). */
class PropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("top-k per group ranks are exactly 1..k with no gaps") {
    import spark.implicits._
    val topk = ops.Relational.qTopkPergroup(spark, sfDir)
    val bad = topk.groupBy($"o_custkey")
      .agg(max($"rn").as("mx"), count(lit(1)).as("n"))
      .filter($"mx" =!= $"n").count()
    assert(bad == 0)
  }

  test("greedy packing window formula matches a sequential packer") {
    import spark.implicits._
    // random token counts -> the distributed cumsum/div formula must
    // agree with the obvious single-threaded fold over the same order
    val toks = samples(Gen.chooseNum(1L, 3000L), 400)
    val cap = 2048L
    val expected = toks.scanLeft(0L)(_ + _).zip(toks).map {
      case (before, _) => before / cap
    }
    val df = toks.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "n_tokens")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val got = df.withColumn("cum", sum($"n_tokens").over(w))
      .select($"doc_id", (($"cum" - $"n_tokens") / cap).cast("long").as("bin"))
      .orderBy($"doc_id").collect().map(_.getLong(1)).toSeq
    assert(got == expected)
  }

  test("sharded packing core matches a sequential per-lang packer") {
    import spark.implicits._
    // random token counts over 3 langs; the sharded distributed plan
    // (shard-local cumsums + broadcast offsets) must agree with the
    // obvious single-threaded per-lang fold for ANY shard size
    val toks = samples(Gen.chooseNum(1L, 3000L), 300)
    val rows = toks.zipWithIndex.map { case (t, i) =>
      (i.toLong, s"L${i % 3}", t)
    }
    val cap = 2048L
    val expected = rows.groupBy(_._2).flatMap { case (_, rs) =>
      val sorted = rs.sortBy(_._1)
      sorted.map(_._3).scanLeft(0L)(_ + _).zip(sorted).map {
        case (before, (id, _, _)) => id -> before / cap
      }
    }.toMap
    val df = rows.toDF("doc_id", "lang", "n_tokens")
    for (sz <- Seq(1L, 13L, 100L, 1L << 40)) {
      val got = ops.TrainPrep.packBins(spark, df, cap, sz)
        .select($"doc_id", $"bin").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"shardSize=$sz diverged")
    }
  }

  test("unionByName cardinality = sum of parts") {
    import spark.implicits._
    val o = graft.util.Tables.orders(spark, sfDir)
    val a = o.filter($"o_orderstatus" === "O")
    val b = o.filter($"o_orderstatus" =!= "O")
    assert(a.unionByName(b).count() == a.count() + b.count())
  }

  test("window rank is a permutation of 1..n within each partition") {
    import spark.implicits._
    val r = ops.Windows.qWinRank(spark, sfDir)
    val bad = r.groupBy($"o_custkey")
      .agg(count(lit(1)).as("n"), max($"rn").as("mx"),
        countDistinct($"rn").as("nd"))
      .filter($"mx" =!= $"n" || $"nd" =!= $"n").count()
    assert(bad == 0)
  }

  test("dedup idempotence on generated data") {
    import spark.implicits._
    samples(Gen.listOfN(50, Gen.chooseNum(0, 10)), 5).foreach { xs =>
      val df = xs.toDF("x")
      val once = df.distinct()
      assert(once.distinct().count() == once.count())
    }
  }

  test("jaccard within [0,1], pairs canonical and unique") {
    import spark.implicits._
    val j = ops.LlmOps.qDedupNgramJaccard(spark, sfDir).collect()
    assert(j.forall { r =>
      val v = r.getAs[Double]("jaccard"); v >= 0.0 && v <= 1.0
    })
    val pairs = j.map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
    assert(pairs.forall { case (a, b) => a < b })
    assert(pairs.distinct.length == pairs.length)
  }

  test("moment-form pairwise stats equals brute force on random vectors") {
    import spark.implicits._
    // 60 random 8-dim vectors, 3 labels, normalized to unit length —
    // the algebraic identity Σ_{i<j}cos = (‖Σv‖²−n)/2 must reproduce
    // the brute-force pair means to well under the r6 rounding step
    val gen = Gen.listOfN(60 * 8, Gen.chooseNum(-1000, 1000))
    samples(gen, 3).zipWithIndex.foreach { case (flat, trial) =>
      val vecs = flat.map(_ / 997.0).grouped(8).toSeq.map { v =>
        val n = math.sqrt(v.map(x => x * x).sum)
        if (n == 0) v.map(_ => 1.0 / math.sqrt(8.0)) else v.map(_ / n)
      }
      val rows = vecs.zipWithIndex.map { case (v, i) =>
        (i.toLong, (i % 3).toLong, v.toArray)
      }
      val df = rows.toDF("vec_id", "label", "emb")
      val got = ops.LlmOps.pairwiseStatsCore(spark, df)
        .collect()
        .map(r => r.getBoolean(0) -> (r.getDouble(1), r.getLong(2))).toMap
      // brute force locally
      var sSame = 0.0; var nSame = 0L; var sDiff = 0.0; var nDiff = 0L
      for (i <- vecs.indices; j <- vecs.indices if i < j) {
        val c = vecs(i).zip(vecs(j)).map { case (a, b) => a * b }.sum
        if (i % 3 == j % 3) { sSame += c; nSame += 1 }
        else { sDiff += c; nDiff += 1 }
      }
      assert(got(true)._2 == nSame && got(false)._2 == nDiff,
        s"trial $trial: pair counts diverged")
      assert(math.abs(got(true)._1 - sSame / nSame) < 1e-6 &&
        math.abs(got(false)._1 - sDiff / nDiff) < 1e-6,
        s"trial $trial: means diverged: $got vs ${sSame / nSame}, ${sDiff / nDiff}")
    }
  }

  test("bucketed theta join equals naive count on boundary-adversarial data") {
    import spark.implicits._
    // exact multiples of the 50.0 bucket width, ties, negatives, and
    // suppliers in customer-free buckets — every edge of the
    // suffix-sum + same-bucket-residual logic
    val custVals = Seq(-100.0, -50.0, -0.01, 0.0, 49.99, 50.0, 50.0,
      100.0, 149.99, 150.0, 151.0, 250.0, 250.0, 1000.0)
    val supVals = Seq(1L -> -50.0, 2L -> 0.0, 3L -> 50.0, 4L -> 99.0,
      5L -> 150.0, 6L -> 250.0, 7L -> 500.0, 8L -> 1000.0, 9L -> -200.0)
    val cust = custVals.toDF("c_acctbal")
    val sup = supVals.toDF("s_suppkey", "s_acctbal")
    val got = ops.Joins.thetaCore(spark, cust, sup)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = supVals.map { case (k, sv) =>
      k -> custVals.count(_ > sv).toLong
    }.filter(_._2 > 0).toMap
    assert(got == want, s"got $got, want $want")
  }

  test("srp fingerprint is invariant to zero-padding and positive scaling") {
    import spark.implicits._
    // bit b is the sign of a weighted sum: appending zero dims adds
    // zero terms, and scaling by c > 0 scales the sum without moving
    // its sign — both must leave the fingerprint bit-identical. (These
    // are the properties that make SRP banding stable when a corpus
    // mixes embedding widths or unnormalized magnitudes.)
    val vecGen = Gen.nonEmptyListOf(Gen.chooseNum(-5.0, 5.0))
      .map(_.take(80))
    val vecs = samples(vecGen, 60).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    def fps(rows: Seq[(Long, Seq[Double])]): Map[Long, Long] =
      rows.toDF("id", "v")
        .selectExpr("id", "srp_fingerprint(v, 64) AS fp")
        .as[(Long, Long)].collect().toMap
    graft.functions.VectorExprs.register(spark)
    val base = fps(vecs.map { case (i, v) => (i, v: Seq[Double]) })
    val padded = fps(vecs.map { case (i, v) => (i, v ++ Seq.fill(17)(0.0)) })
    val scaled = fps(vecs.map { case (i, v) => (i, v.map(_ * 1e-3)) })
    assert(padded == base, "zero-padding changed a fingerprint")
    assert(scaled == base, "positive scaling changed a fingerprint")
  }

  test("cluster resolution matches a driver-side union-find on random graphs") {
    import spark.implicits._
    // random edge sets over a small id space (dense enough to force
    // multi-edge components, merges, and singleton-free output);
    // the distributed min-label plan must agree with the obvious
    // sequential union-find on component membership AND labels
    val edgeGen = Gen.listOfN(40,
      Gen.zip(Gen.chooseNum(0L, 24L), Gen.chooseNum(0L, 24L)))
      .map(_.filter { case (a, b) => a != b })
    samples(edgeGen, 5).filter(_.nonEmpty).foreach { edges =>
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val expected = nodes.map(v => v -> find(v)).toMap
      val sizes = expected.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val got = ops.LlmOps.clustersFromPairs(
          edges.toDF("a_id", "b_id"), rounds = 25)
        .as[(Long, Long, Long)].collect()
      assert(got.map(_._1).toSet == nodes.toSet)
      got.foreach { case (v, label, size) =>
        assert(label == expected(v),
          s"node $v: got label $label, union-find says ${expected(v)}")
        assert(size == sizes(expected(v)),
          s"node $v: got size $size, union-find says ${sizes(expected(v))}")
      }
    }
  }

  test("xlsx escape convention roundtrips arbitrary strings (incl. control chars)") {
    import graft.sources.Xlsx
    // inverse of the XML layer the StAX reader applies, so
    // decode(unescapeXml(esc(s))) must equal s for ANY string —
    // control chars, literal _xHHHH_ lookalikes, entities, unicode.
    // Models the parser faithfully: XML 1.0 §2.11 line-ending
    // normalization (CR/CRLF → LF, applied to the raw input before
    // entity expansion) FIRST, then the entity layer — so an esc that
    // let a literal '\r' through would fail this roundtrip, exactly as
    // it would corrupt a real read-back.
    def unescapeXml(s: String): String = s
      .replace("\r\n", "\n").replace("\r", "\n")
      .replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&amp;", "&")
    val charGen = Gen.frequency(
      (4, Gen.alphaNumChar),
      (2, Gen.oneOf(' ', '<', '>', '&', '"', '_', 'x', '０', 'é')),
      (2, Gen.chooseNum(0, 31).map(_.toChar)),
      (1, Gen.oneOf("_x0041_", "_x005F_", "_xZZZZ_", "_x00", "x_")
        .flatMap(str => Gen.const(str.charAt(0)))))
    val strGen = for {
      parts <- Gen.listOfN(24, Gen.oneOf(
        Gen.listOfN(3, charGen).map(_.mkString),
        Gen.oneOf("_x0041_", "_x005F_x0041_", "_x000B_", "", "_x", "x_")))
      s <- parts
    } yield s
    samples(Gen.listOfN(12, strGen).map(_.mkString), 40).foreach { s =>
      val enc = Xlsx.esc(s)
      // XML 1.0 validity + normalization-stability: nothing below 0x20
      // except tab/LF survives — a literal CR would be LEGAL but reads
      // back as LF after §2.11 normalization, so esc must encode it
      assert(enc.forall(c => c >= ' ' || c == '\t' || c == '\n'),
        s"esc left an illegal/normalization-unstable control char in: ${enc.toList}")
      val back = Xlsx.decodeXEscapes(unescapeXml(enc))
      assert(back == s,
        s"roundtrip mismatch for ${s.toList}: got ${back.toList}")
    }
  }

  test("prefix successor bounds exactly the startsWith set (generated)") {
    // soundness core of the StartsWith skip/always proofs: for any
    // well-formed p and s, s.startsWith(p) ⟺ p ≤ s < succ(p) in the
    // CODE-POINT order the skip comparator uses — generated over a
    // surrogate-adversarial alphabet (BMP, PUA, supplementary plane)
    import graft.sources.FleetFilters
    val cpGen = Gen.oneOf(
      Gen.chooseNum('a'.toInt, 'z'.toInt),
      Gen.oneOf(0x20.toInt, 0xE000, 0xFFFD, 0x1F600, 0x10FFFF))
    val strGen = for {
      n <- Gen.chooseNum(0, 6)
      cps <- Gen.listOfN(n, cpGen)
    } yield cps.map(cp => new String(Character.toChars(cp))).mkString
    val strs = samples(strGen, 300)
    val prefixes = samples(strGen, 60).filter(_.nonEmpty)
    for (p <- prefixes; s <- strs) {
      FleetFilters.prefixSuccessor(p) match {
        case Some(nxt) =>
          val inRange = FleetFilters.compareByCodePoint(s, p) >= 0 &&
            FleetFilters.compareByCodePoint(s, nxt) < 0
          assert(inRange == s.startsWith(p),
            s"p=${p.codePoints().toArray.toSeq} s=${s.codePoints().toArray.toSeq}")
        case None => // U+10FFFF-terminated prefix: no proof, no claim
          assert(p.codePointBefore(p.length) == Character.MAX_CODE_POINT)
      }
    }
  }

  test("temporal carrier normalization is order-isomorphic (generated)") {
    // cmp over any spelling mix (Timestamp/Instant/µs-long) must agree
    // with the µs values themselves — incl. negative (pre-1970) micros
    import graft.sources.FleetFilters
    val microsGen = Gen.chooseNum(-4102444800000000L, 4102444800000000L)
    val ms = samples(microsGen, 200)
    def spellings(us: Long): Seq[Any] = {
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      Seq(t, java.time.Instant.ofEpochSecond(
        Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L),
        java.lang.Long.valueOf(us))
    }
    for (a <- ms; b <- ms.take(20)) {
      val expect = java.lang.Long.compare(a, b)
      for (sa <- spellings(a); sb <- spellings(b))
        assert(Integer.signum(FleetFilters.cmp(sa, sb)) ==
          Integer.signum(expect), s"$a vs $b via ${sa.getClass}/${sb.getClass}")
    }
  }

  test("rounding helper is idempotent on generated doubles") {
    import spark.implicits._
    samples(Gen.listOfN(20, Gen.chooseNum(-1e6, 1e6)), 5).foreach { xs =>
      val df = xs.toDF("x")
      val once = df.select(graft.util.Determinism.r4($"x").as("r")).collect()
      val twice = df.select(
        graft.util.Determinism.r4(graft.util.Determinism.r4($"x")).as("r")).collect()
      assert(once.map(_.getDouble(0)).toSeq == twice.map(_.getDouble(0)).toSeq)
    }
  }
}
