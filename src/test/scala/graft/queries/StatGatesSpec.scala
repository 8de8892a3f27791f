package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.ops.TextOps

/** Independent re-derivations of the round-12 statistical gates: each
  * test collects the SMALL sf0.001 inputs and recomputes the statistic
  * in plain Scala (BigInt / loops — a code path sharing nothing with the
  * DataFrame plan), then compares against the gate's output. The DuckDB
  * oracle already cross-checks engine-vs-engine; these pin the MATH —
  * a formula error mirrored into both the Spark and SQL forms would
  * slide past the oracle but not past these.
  */
class StatGatesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q195: Gini matches a BigInt re-derivation from sorted source masses") {
    val masses = Tables.documents(spark, sf)
      .groupBy(col("source")).agg(sum(col("n_chars")).as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val sorted = masses.sortBy { case (s, x) => (x, s) }.map(_._2)
    val n = BigInt(sorted.length)
    val tot = sorted.map(BigInt(_)).sum
    val six = sorted.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    val expected = math.round(1e6 *
      (2.0 * six.toDouble - (n + 1).toDouble * tot.toDouble) /
      (n.toDouble * tot.toDouble))
    val got = AuditQueries.q195GiniSources(spark, sf).collect().head
    assert(got.getAs[Long]("gini_fp6") === expected)
    assert(got.getAs[Long]("n_sources") === sorted.length.toLong)
  }

  test("q198: kappa matches a plain-Scala 2x2 re-derivation") {
    val en = TextOps.langProfiles.head._2.toSet
    val texts = Tables.documents(spark, sf)
      .select(col("text")).collect().map(_.getString(0))
    def a1(text: String): Boolean = {
      val toks = text.split(" ", -1)
      val lenOk = toks.length >= 10 && toks.length <= 100000
      val stopR = toks.count(en.contains).toDouble / toks.length
      val stopOk = stopR >= 0.01 && stopR <= 0.8
      val ttrOk = toks.distinct.length.toDouble / toks.length > 0.05
      val cpt = text.length.toDouble / toks.length
      val cptOk = cpt >= 2.0 && cpt <= 12.0
      Seq(lenOk, stopOk, ttrOk, cptOk).count(identity) >= 3
    }
    def a2(text: String): Boolean = {
      val toks = text.split(" ", -1)
      toks.length >= 20 && toks.length <= 1000 &&
        toks.distinct.length.toLong * 10 >= toks.length.toLong * 3
    }
    val cells = texts.map(t => (a1(t), a2(t)))
    val n11 = cells.count(c => c._1 && c._2).toLong
    val n10 = cells.count(c => c._1 && !c._2).toLong
    val n01 = cells.count(c => !c._1 && c._2).toLong
    val n00 = cells.count(c => !c._1 && !c._2).toLong
    val nt = n11 + n10 + n01 + n00
    val pa = n11 + n10; val pb = n11 + n01
    val peNum = pa * pb + (nt - pa) * (nt - pb)
    val expected = math.round(1e6 *
      (nt * (n11 + n00) - peNum).toDouble / (nt * nt - peNum).toDouble)
    val got = AuditQueries.q198CohenKappa(spark, sf).collect().head
    assert((got.getAs[Long]("n11"), got.getAs[Long]("n10"),
      got.getAs[Long]("n01"), got.getAs[Long]("n00")) === ((n11, n10, n01, n00)))
    assert(got.getAs[Long]("kappa_fp6") === expected)
  }

  test("q194: doubled-U and AUC match a sort-based rank re-derivation") {
    val rows = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val expected = rows.groupBy(_._1).map { case (et, g) =>
      val vals = g.map { case (_, u, v) => (u % 2, v) }
      val sorted = vals.map(_._2).sorted
      // average rank (doubled) per value: min rank + max rank
      val firstIdx = sorted.zipWithIndex.groupBy(_._1).map {
        case (v, xs) => v -> (xs.map(_._2).min + 1, xs.map(_._2).max + 1)
      }
      val r2a = vals.filter(_._1 == 0L)
        .map { case (_, v) => val (lo, hi) = firstIdx(v); lo.toLong + hi.toLong }
        .sum
      val na = vals.count(_._1 == 0L).toLong
      val nb = vals.count(_._1 == 1L).toLong
      val u2 = r2a - na * (na + 1)
      et -> (na, nb, u2,
        math.round(1e6 * u2.toDouble / (2.0 * na * nb)))
    }
    val got = MonitorQueries.q194RankSumAb(spark, sf).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (na, nb, u2, auc) = expected(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_a") === na)
      assert(r.getAs[Long]("n_b") === nb)
      assert(r.getAs[Long]("u2_a") === u2)
      assert(r.getAs[Long]("auc_fp6") === auc)
    }
  }

  test("q204: changepoint argmax matches a brute-force scan of every split") {
    val rows = Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate))
    val d0 = rows.map(_._2).min
    val expected = rows.groupBy(_._1).map { case (et, g) =>
      val daily = g.groupBy { case (_, day) =>
        java.time.temporal.ChronoUnit.DAYS.between(d0, day)
      }.map { case (d, xs) => (d, xs.size.toLong) }.toSeq.sortBy(_._1)
      val n = daily.length
      val xs = daily.map(_._2)
      val best = (7 to (n - 7)).map { i =>
        val cum = xs.take(i).sum
        val ml = math.round(1e6 * cum.toDouble / i)
        val mr = math.round(1e6 * (xs.sum - cum).toDouble / (n - i))
        (math.abs(ml - mr), daily(i - 1)._1, ml, mr)
      }.sortBy { case (score, d, _, _) => (-score, d) }.head
      et -> best
    }
    val got = MonitorQueries.q204Changepoint(spark, sf).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (score, d, ml, mr) = expected(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("split_day") === d)
      assert(r.getAs[Long]("score_fp6") === score)
      assert(r.getAs[Long]("ml_fp6") === ml)
      assert(r.getAs[Long]("mr_fp6") === mr)
    }
  }

  test("q193: every CMS probe satisfies both sketch contracts") {
    val rows = Stats.q193CmsFreq(spark, sf).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("overcount_ok"),
        s"CMS under-counted ${r.getAs[String]("tok")}")
      assert(r.getAs[Boolean]("bound_ok"),
        s"CMS blew the e/w additive bound on ${r.getAs[String]("tok")}")
    }
  }

  test("q212: chi-square matches a plain-Scala 2x2 re-derivation") {
    val rows = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val pc = rows.groupBy(_._1).map { case (u, g) =>
      u -> g.count(_._2 == "purchase").toLong
    }
    val p = pc.values.sum; val uN = pc.size.toLong
    val cells = pc.toSeq.map { case (u, c) => (u % 2, if (c * uN > p) 1 else 0) }
    val a = cells.count(x => x._1 == 0 && x._2 == 1).toDouble
    val b = cells.count(x => x._1 == 0 && x._2 == 0).toDouble
    val c = cells.count(x => x._1 == 1 && x._2 == 1).toDouble
    val d = cells.count(x => x._1 == 1 && x._2 == 0).toDouble
    val det = a * d - b * c
    val chi2 = (a + b + c + d) * det * det /
      ((a + b) * (c + d) * (a + c) * (b + d))
    val lift = a / (a + b) - c / (c + d)
    val got = MonitorQueries.q212ChiSquare(spark, sf).collect().head
    assert((got.getAs[Long]("a"), got.getAs[Long]("b"),
      got.getAs[Long]("c"), got.getAs[Long]("d")) ===
      ((a.toLong, b.toLong, c.toLong, d.toLong)))
    assert(got.getAs[Long]("chi2_fp6") === math.round(1e6 * chi2))
    assert(got.getAs[Long]("lift_fp6") === math.round(1e6 * lift))
  }

  test("q208: DiD matches a plain-Scala four-cell re-derivation") {
    val rows = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getDouble(2)))
    val d0 = rows.map(_._2).min
    // global over all types: re-derive per type via a second pass below
    val byType = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"), to_date(col("ts")).as("day"),
        col("value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDate(2).toLocalDate,
        r.getDouble(3)))
      .groupBy(_._1)
    val got = MonitorQueries.q208DiffInDiff(spark, sf).collect()
    got.foreach { r =>
      val g = byType(r.getAs[String]("event_type"))
      def cell(t: Boolean, p: Boolean): Seq[Long] = g.toSeq.collect {
        case (_, u, day, v)
            if (u % 2 == 1) == t &&
              (java.time.temporal.ChronoUnit.DAYS.between(d0, day) >= 14) == p =>
          math.round(v * 1e6)
      }
      val (tp, tr, cp, cr) =
        (cell(t = true, p = true), cell(t = true, p = false),
          cell(t = false, p = true), cell(t = false, p = false))
      def m(xs: Seq[Long]) = xs.sum.toDouble / xs.size
      assert(r.getAs[Long]("n_tp") === tp.size.toLong)
      assert(r.getAs[Long]("did_fp6") ===
        math.round((m(tp) - m(tr)) - (m(cp) - m(cr))))
    }
  }

  test("q213: HT estimate stays inside the sample-size-scaled error band per stratum") {
    val rows = MixQueries.q213HtEstimate(spark, sf).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_sampled")
      assert(n > 0, s"stratum ${r.getAs[String]("lang")} sampled nothing")
      // ~3.5σ band for a mean of n draws with char-mass CV ≲ 1: a BIASED
      // uniform fails this at any n; plain sampling variance does not
      // (the 10%-rate strata sample ~10 docs at sf0.001 — a fixed 35%
      // bound there would flag ordinary noise)
      val tolFp6 = math.round(3.5e6 / math.sqrt(n.toDouble))
      assert(math.abs(r.getAs[Long]("rel_err_fp6")) <= tolFp6,
        s"HT estimate outside the ${tolFp6 / 1e4}% band for " +
          s"${r.getAs[String]("lang")} (n=$n) — the sampling uniform " +
          "would be unusable for estimation")
    }
  }

  test("q183: CUSUM matches the literal max(0, S + y) recursion") {
    // the textbook sequential recursion — S₀ = 0, S_d = max(0, S_{d−1} + y_d)
    // — shares NOTHING with the prefix-identity window form in the gate;
    // this is the re-derivation the ADVICE asked for: a mirrored-formula
    // error (e.g. dropping the implicit cum₀ = 0 prefix) passes the
    // engine-vs-engine oracle but not this
    val rows = Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate))
    val d0 = rows.map(_._2).min
    val expected = rows.groupBy(_._1).map { case (et, g) =>
      val daily = g.groupBy { case (_, day) =>
        java.time.temporal.ChronoUnit.DAYS.between(d0, day)
      }.map { case (d, xs) => (d, xs.size.toLong) }.toSeq.sortBy(_._1)
      val base = daily.filter(_._1 < 14)
      val baseSum = base.map(_._2).sum
      val baseDays = base.length.toLong
      var s = 0L
      val cusums = daily.filter(_._1 >= 14).map { case (d, x) =>
        s = math.max(0L, s + (baseDays * x - baseSum))
        (d, s, s > baseSum * 3)
      }
      et -> cusums.map { case (d, c, al) => d -> ((c, al)) }.toMap
    }
    val got = MonitorQueries.q183Cusum(spark, sf).collect()
    assert(got.length === expected.values.map(_.size).sum)
    got.foreach { r =>
      val (c, alarm) =
        expected(r.getAs[String]("event_type"))(r.getAs[Long]("day_idx"))
      assert(r.getAs[Long]("cusum_scaled") === c,
        s"CUSUM diverges from the recursion at ${r.getAs[String]("event_type")} " +
          s"day ${r.getAs[Long]("day_idx")}")
      assert(r.getAs[Boolean]("alarm") === alarm)
    }
  }

  test("q201: bootstrap intervals bracket sanely (lo <= hi, 20 replicates)") {
    val rows = Stats.q201PoissonBootstrap(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_replicates") === 20L)
      assert(r.getAs[Long]("boot_lo_fp6") <= r.getAs[Long]("boot_hi_fp6"))
    }
  }

  test("q216: distinct-n matches plain-Scala gram sets per source") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = docs.groupBy(_._1).map { case (src, g) =>
      val tokss = g.map(_._2.split(" ", -1).toSeq)
      def grams(n: Int) = tokss.flatMap(_.sliding(n).filter(_.length == n)
        .map(_.mkString(" ")))
      val per = (1 to 3).map { n =>
        val gs = grams(n)
        (gs.length.toLong, gs.distinct.length.toLong)
      }
      src -> ((g.length.toLong, per))
    }
    val got = TextQueries.q216DistinctN(spark, sf).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (nDocs, per) = expected(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_docs") === nDocs)
      for (n <- 1 to 3) {
        val (tot, uniq) = per(n - 1)
        assert(r.getAs[Long](s"tot$n") === tot, s"tot$n")
        assert(r.getAs[Long](s"uniq$n") === uniq, s"uniq$n")
        if (tot > 0)
          assert(r.getAs[Long](s"d${n}_fp6") ===
            math.round(1e6 * uniq / tot), s"d${n}_fp6")
      }
    }
  }

  test("q217: KM curve matches a plain-Scala product-limit replica") {
    // re-derive sessions with the 30-min-gap rule, then the estimator
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val maxUs = ev.map(_._2).max
    val lives = ev.groupBy(_._1).values.flatMap { g =>
      val ts = g.map(_._2).sorted
      val sess = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer(ts.head))
      ts.tail.foreach { t =>
        if (t - sess.last.last > 1800000000L)
          sess += scala.collection.mutable.ArrayBuffer(t)
        else sess.last += t
      }
      sess.map(s => ((s.last - s.head) / 60000000L,
        s.last >= maxUs - 1800000000L))
    }.toSeq
    val grid = lives.groupBy(_._1).toSeq.sortBy(_._1).map { case (d, g) =>
      (d, g.count(!_._2).toLong, g.count(_._2).toLong)
    }
    var atRisk = lives.length.toLong
    var lnSum = 0L
    val expected = grid.map { case (d, death, cens) =>
      val term =
        if (death < atRisk)
          BigDecimal(1e9 * math.log(1.0 - death.toDouble / atRisk))
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        else -1000000000000000L
      lnSum += term
      val surv = math.round(1e6 * math.exp(lnSum.toDouble / 1e9))
      val row = (atRisk, death, cens, surv)
      atRisk -= death + cens
      d -> row
    }.toMap
    val got = Events.q217KaplanMeier(spark, sf).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (risk, death, cens, surv) = expected(r.getAs[Long]("dur_min"))
      assert(r.getAs[Long]("n_risk") === risk)
      assert(r.getAs[Long]("n_death") === death)
      assert(r.getAs[Long]("n_censor") === cens)
      assert(r.getAs[Long]("surv_fp6") === surv,
        s"survival diverges at minute ${r.getAs[Long]("dur_min")}")
    }
  }

  test("q218: Good-Turing spectrum matches plain-Scala trigram counts") {
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = docs.groupBy(_._1).map { case (lang, g) =>
      val counts = g.flatMap(_._2.split(" ", -1).toSeq.sliding(3)
          .filter(_.length == 3).map(_.mkString(" ")))
        .groupBy(identity).map(_._2.length.toLong)
      val n = counts.sum
      val nr = (1 to 5).map(r => counts.count(_ == r).toLong)
      lang -> ((n, counts.size.toLong, nr,
        math.round(1e9 * nr.head.toDouble / n)))
    }
    val got = TextQueries.q218GoodTuring(spark, sf).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (n, v, nr, p0) = expected(r.getAs[String]("lang"))
      assert(r.getAs[Long]("n_tokens") === n)
      assert(r.getAs[Long]("vocab") === v)
      for (i <- 1 to 5) assert(r.getAs[Long](s"n$i") === nr(i - 1), s"n$i")
      assert(r.getAs[Long]("p0_fp9") === p0)
    }
  }
}
