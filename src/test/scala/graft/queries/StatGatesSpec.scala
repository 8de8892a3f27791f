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

  test("q217: an EXACT 30:00.000000 gap stays in the same session " +
      "(the boundary convention the generator never exercises)") {
    // ADVICE r13: session_window closes at exactly the gap (half-open
    // [last, last+30min)) while the oracle's `ts - lag(ts) > INTERVAL 30
    // MINUTE` keeps an exact-gap pair together — a divergence only this
    // synthetic input exposes. The gate now uses the lag/gap-sum form;
    // this pins the convention against a future session_window revert.
    import spark.implicits._
    val t0 = 1600000000000000L // µs
    val far = t0 + 100L * 86400000000L
    val rows = Seq(
      (1L, t0), (1L, t0 + 1800000000L),      // EXACT 30-min gap: 1 session
      (2L, t0), (2L, t0 + 1800000001L),      // 1 µs past: 2 sessions
      (3L, far))                             // censored; sets max ts
    val dir = tmpDir("q217-exact-gap")
    rows.toDF("user_id", "us")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Events.q217KaplanMeier(spark, dir).collect()
      .map(r => r.getAs[Long]("dur_min") ->
        (r.getAs[Long]("n_risk"), r.getAs[Long]("n_death"),
          r.getAs[Long]("n_censor"), r.getAs[Long]("surv_fp6"))).toMap
    // lag rule: u1 = one 30-min session, u2 = two 0-min, u3 censored 0-min
    assert(got.keySet === Set(0L, 30L))
    assert(got(0L) === ((4L, 2L, 1L, 500000L)))
    assert(got(30L) === ((1L, 1L, 0L, 0L))) // d = n sentinel tail
  }

  test("q244: the curation funnel is internally consistent " +
      "(monotone survivors, split partition, pack = train)") {
    val rows = MixQueries.q244CurationPipeline(spark, sf).collect()
      .map(r => r.getAs[String]("stage") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_groups"),
          r.getAs[Long]("n_tokens"), r.getAs[Long]("id_sum"),
          r.getAs[Long]("aux"))).toMap
    def docs(s: String) = rows.get(s).map(_._1).getOrElse(0L)
    // survivors can only shrink stage to stage
    val chain = Seq("input", "quality", "exact_dedup", "strip_spans",
      "near_dedup", "decontam", "mix")
    chain.sliding(2).foreach { case Seq(a, b) =>
      assert(docs(a) >= docs(b), s"$a (${docs(a)}) < $b (${docs(b)})")
    }
    // decontam drops are exactly the exact tier (aux) + fuzzy-only tier
    val (nDec, fOnly, _, _, ex) = rows("decontam")
    assert(nDec === docs("near_dedup") - ex - fOnly)
    // the three split rows partition the mix survivors
    val splits = rows.filter(_._1.startsWith("split_")).values
    assert(splits.map(_._1).sum === docs("mix"))
    assert(splits.map(_._3).sum === rows("mix")._3)
    assert(splits.map(_._4).sum === rows("mix")._4)
    // the packed set IS the train split, token for token
    val tr = rows.getOrElse("split_train", (0L, 0L, 0L, 0L, 0L))
    val pk = rows.getOrElse("pack", (0L, 0L, 0L, 0L, 0L))
    assert(pk._1 === tr._1 && pk._3 === tr._3 && pk._4 === tr._4)
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

  test("q219: OLS coefficients match a plain-Scala normal-equations solve") {
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity"), col("l_discount"),
        col("l_extendedprice"))
      .collect().map(r => (r.getString(0),
        math.round(r.getDouble(1) * 100), math.round(r.getDouble(2) * 100),
        math.round(r.getDouble(3) * 100)))
    val got = Stats.q219OlsRegression(spark, sf).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r).toMap
    val byFlag = rows.groupBy(_._1)
    assert(got.keySet === byFlag.keySet)
    byFlag.foreach { case (flag, g) =>
      val n = BigInt(g.length)
      def s(f: ((String, Long, Long, Long)) => BigInt) = g.map(f).sum
      val (sq, sd, sp) =
        (s(r => BigInt(r._2)), s(r => BigInt(r._3)), s(r => BigInt(r._4)))
      val sqq = s(r => BigInt(r._2) * r._2)
      val sqd = s(r => BigInt(r._2) * r._3)
      val sdd = s(r => BigInt(r._3) * r._3)
      val sqp = s(r => BigInt(r._2) * r._4)
      val sdp = s(r => BigInt(r._3) * r._4)
      val spp = s(r => BigInt(r._4) * r._4)
      def m(sab: BigInt, sa: BigInt, sb: BigInt) = (n * sab - sa * sb).toDouble
      val (mqq, mqd, mdd) = (m(sqq, sq, sq), m(sqd, sq, sd), m(sdd, sd, sd))
      val (mqp, mdp, mpp) = (m(sqp, sq, sp), m(sdp, sd, sp), m(spp, sp, sp))
      val det = mqq * mdd - mqd * mqd
      val b1 = (mdd * mqp - mqd * mdp) / det
      val b2 = (mqq * mdp - mqd * mqp) / det
      val b0 = (sp.toDouble - b1 * sq.toDouble - b2 * sd.toDouble) / n.toDouble
      val r2 = (b1 * mqp + b2 * mdp) / mpp
      val r = got(flag)
      assert(r.getAs[Long]("n_rows") === g.length.toLong)
      assert(r.getAs[Long]("b_qty_fp6") === math.round(b1 * 1e6), "b_qty")
      assert(r.getAs[Long]("b_disc_fp6") === math.round(b2 * 1e6), "b_disc")
      assert(r.getAs[Long]("b0_fp6") === math.round(b0 * 1e4), "b0")
      assert(r.getAs[Long]("r2_fp6") === math.round(r2 * 1e6), "r2")
    }
  }

  test("q220: Zipf slope matches a plain-Scala regression over ranked counts") {
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val got = TextQueries.q220ZipfSlope(spark, sf).collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n_ranks"), r.getAs[Long]("slope_fp6"),
          r.getAs[Long]("icept_fp6")))).toMap
    val byLang = docs.groupBy(_._1)
    assert(got.keySet === byLang.keySet)
    byLang.foreach { case (lang, g) =>
      val tf = g.flatMap(_._2.split(" ", -1)).filter(_.nonEmpty)
        .groupBy(identity).map { case (t, xs) => (t, xs.length.toLong) }
      val ranked = tf.toSeq.sortBy { case (t, c) => (-c, t) }.take(300)
      val xy = ranked.zipWithIndex.map { case ((_, c), i) =>
        (math.round(math.log(i + 1.0) * 1e9),
          math.round(math.log(c.toDouble) * 1e9))
      }
      val n = xy.length
      val sx = xy.map(p => BigInt(p._1)).sum
      val sy = xy.map(p => BigInt(p._2)).sum
      val sxx = xy.map(p => BigInt(p._1) * BigInt(p._1)).sum
      val sxy = xy.map(p => BigInt(p._1) * BigInt(p._2)).sum
      val mxy = (BigInt(n) * sxy - sx * sy).toDouble
      val mxx = (BigInt(n) * sxx - sx * sx).toDouble
      val slope = mxy / mxx
      val icept = (sy.toDouble - slope * sx.toDouble) / n.toDouble / 1e3
      val (gn, gs, gi) = got(lang)
      assert(gn === n.toLong)
      assert(gs === math.round(slope * 1e6), s"slope for $lang")
      assert(gi === math.round(icept), s"icept for $lang")
    }
  }

  test("q221: ECE matches a plain-Scala reliability re-derivation") {
    val rows = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getString(2)))
    val d0 = rows.map(_._2).min
    def dayOf(d: java.time.LocalDate) =
      java.time.temporal.ChronoUnit.DAYS.between(d0, d)
    val hist = rows.filter(r => dayOf(r._2) < 14)
    val post = rows.filter(r => dayOf(r._2) >= 14)
    val p9 = hist.groupBy(_._1).map { case (u, g) =>
      val k = g.count(_._3 == "purchase")
      u -> math.round(1e9 * (k + 1).toDouble / (g.length + 5).toDouble)
    }
    val scored = post.flatMap(r => p9.get(r._1).map(p =>
      (math.min(p / 100000000L, 9L), p, if (r._3 == "purchase") 1L else 0L)))
    val bins = scored.groupBy(_._1).map { case (b, g) =>
      val nb = g.length.toLong
      val conf = g.map(_._2).sum.toDouble / nb.toDouble / 1e9
      val acc = g.map(_._3).sum.toDouble / nb.toDouble
      b -> ((nb, math.round(conf * 1e6), math.round(acc * 1e6),
        math.round(math.abs(acc - conf) * 1e6)))
    }
    val totN = bins.values.map(_._1).sum
    val ece = math.round(
      bins.values.map(v => v._1 * v._4).sum.toDouble / totN.toDouble)
    val gotRows = MonitorQueries.q221CalibrationEce(spark, sf).collect()
    assert(gotRows.length === bins.size)
    assert(bins.nonEmpty, "eval split must be non-empty at sf0.001")
    gotRows.foreach { r =>
      val (nb, c6, a6, g6) = bins(r.getAs[Long]("bin"))
      assert(r.getAs[Long]("n_b") === nb)
      assert(r.getAs[Long]("conf_fp6") === c6)
      assert(r.getAs[Long]("acc_fp6") === a6)
      assert(r.getAs[Long]("gap_fp6") === g6)
      assert(r.getAs[Long]("ece_fp6") === ece)
    }
  }

  test("q222: conformal coverage matches a plain-Scala re-derivation") {
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label").cast("long"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2)))
    def q6(f: Float): BigDecimal =
      BigDecimal(f.toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val cal = vecs.filter(_._1 % 2 == 0)
    val cent: Map[(Long, Int), Double] = cal.flatMap { case (_, l, e) =>
      e.zipWithIndex.map { case (v, d) => ((l, d), q6(v)) } }
      .groupBy(_._1).map { case (k, g) =>
        k -> g.map(_._2).sum.toDouble / g.length }
    def score(l: Long, e: Seq[Float]): Long =
      e.zipWithIndex.map { case (v, d) =>
        val dd = q6(v).toDouble - cent((l, d))
        math.round(dd * dd * 1e9)
      }.sum
    val calS = cal.map(v => score(v._2, v._3)).sorted
    val k = (9 * (calS.length + 1) + 9) / 10
    val qhat = calS(k - 1)
    val tst = vecs.filter(_._1 % 2 == 1)
    val covered = tst.count(v => score(v._2, v._3) <= qhat).toLong
    val r = Embeddings.q222Conformal(spark, sf).collect().head
    assert(r.getAs[Long]("n_cal") === calS.length.toLong)
    assert(r.getAs[Long]("n_test") === tst.length.toLong)
    assert(r.getAs[Long]("qhat_s9") === qhat)
    assert(r.getAs[Long]("covered") === covered)
    assert(r.getAs[Long]("coverage_fp6") ===
      math.round(covered.toDouble / tst.length.toDouble * 1e6))
  }

  test("q223: stratified IPW ATE matches a plain-Scala re-derivation") {
    val seg = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderpriority"), col("o_totalprice"))
      .collect().map(r => (seg(r.getLong(0)),
        if (Set("1-URGENT", "2-HIGH")(r.getString(1))) 1 else 0,
        math.round(r.getDouble(2) * 100)))
    val strata = orders.groupBy(_._1).collect { case (st, g)
        if g.exists(_._2 == 1) && g.exists(_._2 == 0) =>
      val nx = g.length.toLong
      val nt = g.count(_._2 == 1).toLong
      val yt = g.filter(_._2 == 1).map(_._3).sum
      val yc = g.filter(_._2 == 0).map(_._3).sum
      val dm = yt.toDouble / nt.toDouble - yc.toDouble / (nx - nt).toDouble
      st -> ((nx, nt, math.round(1e6 * nt.toDouble / nx.toDouble),
        math.round(dm * 1e6)))
    }
    val ate = math.round(
      strata.values.map(v => v._1 * v._4).sum.toDouble /
        strata.values.map(_._1).sum.toDouble)
    val got = Stats.q223IpwAte(spark, sf).collect()
    assert(got.length === strata.size)
    got.foreach { r =>
      val (nx, nt, e6, dm6) = strata(r.getAs[String]("c_mktsegment"))
      assert(r.getAs[Long]("n_x") === nx)
      assert(r.getAs[Long]("n_t") === nt)
      assert(r.getAs[Long]("e_fp6") === e6)
      assert(r.getAs[Long]("dm_fp6") === dm6)
      assert(r.getAs[Long]("ate_fp6") === ate)
    }
  }

  test("q225: SPRT stop points match a plain-Scala sequential walk") {
    val rows = Tables.events(spark, sf)
      .select(col("event_type"), col("ts"), col("event_id"), col("value"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime,
        r.getTimestamp(1).getNanos, r.getLong(2), r.getDouble(3)))
    val got = MonitorQueries.q225Sprt(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val byType = rows.groupBy(_._1)
    assert(got.keySet === byType.keySet)
    byType.foreach { case (et, g) =>
      val ordered = g.sortBy(r => (r._2, r._3, r._4))
      var cum = 0L
      var stop: Option[(Long, Long)] = None // (rn, llr)
      ordered.zipWithIndex.foreach { case (r, i) =>
        if (stop.isEmpty) {
          cum += (if (r._5 > 50.0) MonitorQueries.sprtL1
                  else MonitorQueries.sprtL0)
          if (cum >= MonitorQueries.sprtA9 || cum <= -MonitorQueries.sprtA9)
            stop = Some((i + 1L, cum))
        }
      }
      val row = got(et)
      assert(row.getAs[Long]("n_events") === g.length.toLong)
      stop match {
        case Some((rn, llr)) =>
          assert(row.getAs[Long]("stop_rn") === rn, s"stop_rn for $et")
          assert(row.getAs[Long]("llr9_at_stop") === llr)
          assert(row.getAs[String]("decision") ===
            (if (llr >= MonitorQueries.sprtA9) "h1" else "h0"))
        case None =>
          assert(row.isNullAt(row.fieldIndex("stop_rn")))
          assert(row.getAs[String]("decision") === "continue")
      }
    }
  }

  test("q226: SAX words and motifs match a plain-Scala symbolization") {
    val rows = Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getDouble(2)))
    val got = MonitorQueries.q226Sax(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    rows.groupBy(_._1).foreach { case (et, g) =>
      val daily = g.groupBy(_._2).toSeq.sortBy(_._1.toEpochDay).map {
        case (_, xs) =>
          val sv6 = xs.map(x => math.round(x._3 * 1e6)).sum
          math.round(sv6.toDouble / xs.length.toDouble)
      }
      val n = daily.length
      val s1 = daily.map(BigInt(_)).sum
      val s2 = daily.map(m => BigInt(m) * m).sum
      val mu = s1.toDouble / n.toDouble
      val sigma = math.sqrt((BigInt(n) * s2 - s1 * s1).toDouble) / n.toDouble
      val sax = daily.map { m =>
        val z = (m.toDouble - mu) / sigma
        if (z < MonitorQueries.saxBp) "a"
        else if (z < 0.0) "b"
        else if (z < -MonitorQueries.saxBp) "c"
        else "d"
      }.mkString
      val motifs = sax.sliding(3).filter(_.length == 3).toSeq
        .groupBy(identity).map { case (m, xs) => (m, xs.length.toLong) }
      val (topM, topN) = motifs.toSeq.minBy { case (m, c) => (-c, m) }
      val row = got(et)
      assert(row.getAs[Long]("n_days") === n.toLong)
      assert(row.getAs[String]("sax") === sax, s"sax word for $et")
      assert(row.getAs[String]("motif") === topM)
      assert(row.getAs[Long]("motif_n") === topN)
    }
  }

  test("q227: negative-sampling table matches plain-Scala pow-3/4 weights") {
    val toks = Tables.documents(spark, sf)
      .select(col("text")).collect()
      .flatMap(_.getString(0).split(" ", -1)).filter(_.nonEmpty)
    val tf = toks.groupBy(identity).map { case (t, xs) =>
      (t, xs.length.toLong,
        math.round(math.pow(xs.length.toDouble, 0.75) * 1e6))
    }
    val tot = tf.map(t => BigInt(t._3)).sum
    val expected = tf.toSeq.sortBy { case (t, c, _) => (-c, t) }.take(50)
      .zipWithIndex.map { case ((t, c, w6), i) =>
        (i + 1L, t, c, w6,
          math.round(1e9 * w6.toDouble / tot.toDouble))
      }
    val withCum = expected.scanLeft(0L)(_ + _._5).tail
      .zip(expected).map { case (cum, e) => (e._1, e._2, e._3, e._4, e._5, cum) }
    val got = TextQueries.q227NegSampling(spark, sf).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("tok"),
        r.getAs[Long]("c"), r.getAs[Long]("w6"), r.getAs[Long]("p9"),
        r.getAs[Long]("cum_p9"))).sortBy(_._1).toSeq
    assert(got === withCum)
  }

  test("q228: Theil decomposition matches a plain-Scala re-derivation") {
    val rows = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1))).filter(_._2 > 0)
    val nn = rows.length.toLong
    val ss = rows.map(_._2).sum
    def t9sum(xs: Seq[Long], n: Long, s: Long): BigInt =
      xs.map { x =>
        val r = x.toDouble * n.toDouble / s.toDouble
        BigInt(math.round(r * math.log(r) * 1e9))
      }.sum
    val bySrc = rows.groupBy(_._1)
    val tot9 = bySrc.values.map(g => t9sum(g.map(_._2).toSeq, nn, ss)).sum
    val parts = bySrc.map { case (_, g) =>
      val ns = g.length.toLong
      val sS = g.map(_._2).sum
      val rs = sS.toDouble * nn.toDouble / (ns.toDouble * ss.toDouble)
      val b9 = math.round(
        ns.toDouble / nn.toDouble * rs * math.log(rs) * 1e9)
      val w9sum = t9sum(g.map(_._2).toSeq, ns, sS)
      val w9 = math.round(sS.toDouble / ss.toDouble *
        (w9sum.toDouble / ns.toDouble))
      (b9, w9)
    }
    val r = AuditQueries.q228Theil(spark, sf).collect().head
    assert(r.getAs[Long]("n_docs") === nn)
    assert(r.getAs[Long]("n_sources") === bySrc.size.toLong)
    assert(r.getAs[Long]("t_fp9") ===
      math.round(tot9.toDouble / nn.toDouble))
    assert(r.getAs[Long]("between_fp9") === parts.map(_._1).sum)
    assert(r.getAs[Long]("within_fp9") === parts.map(_._2).sum)
  }

  test("q229: minimax isotonic fit equals an exact-rational PAVA") {
    val bins = MonitorQueries.q221CalibrationEce(spark, sf).collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n_b"),
        r.getAs[Long]("acc_fp6"))).sortBy(_._1)
    // pool-adjacent-violators with exact rational pooling: pooled blocks
    // of (Σ acc·n, Σ n); violation compared by BigInt cross-multiplication
    var blocks = List.empty[(BigInt, BigInt, Int)] // (num, den, size)
    bins.foreach { case (_, n, acc) =>
      var cur = (BigInt(acc) * n, BigInt(n), 1)
      while (blocks.nonEmpty &&
          blocks.head._1 * cur._2 >= cur._1 * blocks.head._2) {
        val h = blocks.head
        blocks = blocks.tail
        cur = (h._1 + cur._1, h._2 + cur._2, h._3 + cur._3)
      }
      blocks = cur :: blocks
    }
    val fitted = blocks.reverse.flatMap { case (num, den, size) =>
      // the block mean as the engines compute it: double(Σ acc·n)/double(Σ n)
      List.fill(size)(num.toDouble / den.toDouble)
    }
    val got = MonitorQueries.q229Isotonic(spark, sf).collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("iso_fp6")))
      .sortBy(_._1)
    assert(got.length === fitted.length)
    got.zip(fitted).foreach { case ((bin, iso), exp) =>
      assert(iso === math.round(exp), s"isotonic value at bin $bin")
    }
    // and the defining property: the fit is non-decreasing
    assert(got.map(_._2).sliding(2).forall(p =>
      p.length < 2 || p(0) <= p(1)))
  }

  test("q230: AUC matches a plain-Scala tie-corrected pair count") {
    val rows = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getString(2)))
    val d0 = rows.map(_._2).min
    def dayOf(d: java.time.LocalDate) =
      java.time.temporal.ChronoUnit.DAYS.between(d0, d)
    val p9 = rows.filter(r => dayOf(r._2) < 14).groupBy(_._1).map {
      case (u, g) =>
        val k = g.count(_._3 == "purchase")
        u -> math.round(1e9 * (k + 1).toDouble / (g.length + 5).toDouble)
    }
    val scored = rows.filter(r => dayOf(r._2) >= 14).flatMap(r =>
      p9.get(r._1).map(p => (p, r._3 == "purchase")))
    val pos = scored.filter(_._2).map(_._1)
    val neg = scored.filterNot(_._2).map(_._1)
    // literal pairwise AUC: wins + half-ties over all pos×neg pairs
    var u2 = BigInt(0)
    pos.foreach { sp =>
      neg.foreach { sn =>
        if (sp > sn) u2 += 2 else if (sp == sn) u2 += 1
      }
    }
    val expected = math.round(1e6 * u2.toDouble /
      (2.0 * pos.length.toDouble * neg.length.toDouble))
    val r = MonitorQueries.q230Auc(spark, sf).collect().head
    assert(r.getAs[Long]("n_pos") === pos.length.toLong)
    assert(r.getAs[Long]("n_neg") === neg.length.toLong)
    assert(r.getAs[Long]("auc_fp6") === expected)
  }

  test("q231: distributed power iteration matches a plain-Scala replica " +
      "and lands on a true eigenpair") {
    val nd = 16
    val vecs = Tables.embeddings(spark, sf)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).take(nd)
        .map(f => math.round(f.toDouble * 1e6)).toArray)
    val n = vecs.length
    val s = Array.tabulate(nd)(i => vecs.map(v => BigInt(v(i))).sum)
    val mM = Array.tabulate(nd, nd) { (i, j) =>
      val sp = vecs.map(v => BigInt(v(i)) * v(j)).sum
      math.round((sp.toDouble - s(i).toDouble * s(j).toDouble / n.toDouble) /
        n.toDouble)
    }
    def matvec(v9: Array[Long]): Array[BigInt] =
      Array.tabulate(nd)(i =>
        (0 until nd).map(j => BigInt(mM(i)(j)) * v9(j)).sum)
    def normalize(w: Array[BigInt]): Array[Long] = {
      val mx = w.map(_.abs).max
      val w9 = w.map(x => math.round(x.toDouble / mx.toDouble * 1e9))
      val n2 = w9.map(x => BigInt(x) * x).sum
      w9.map(x => math.round(x.toDouble / math.sqrt(n2.toDouble) * 1e9))
    }
    var v9 = Array.fill(nd)(250000000L)
    for (_ <- 1 to 5) v9 = normalize(matvec(v9))
    val w4 = matvec(v9)
    val k = (0 until nd).minBy(i => (-math.abs(v9(i)), i))
    val lam = math.round(w4(k).toDouble / v9(k).toDouble)
    val got = Embeddings.q231PowerIteration(spark, sf).collect()
      .map(r => (r.getAs[Long]("dim"), r.getAs[Long]("loading_fp9"),
        r.getAs[Long]("lam_fp12"))).sortBy(_._1)
    assert(got.length === nd)
    got.foreach { case (d, l9, lf) =>
      assert(l9 === v9(d.toInt), s"loading at dim $d")
      assert(lf === lam)
    }
    // eigenpair quality: after 5 rounds the residual ‖Mv − λv‖ must be
    // small relative to ‖Mv‖ (power iteration converges geometrically in
    // the spectral gap — measured per-round contraction ≈0.53 on this
    // corpus, so 5 rounds land ≈0.04; 10% covers a slower gap without
    // accepting garbage)
    val mv = matvec(v9).map(_.toDouble)
    val res = math.sqrt((0 until nd).map { i =>
      val r = mv(i) - lam.toDouble * v9(i); r * r
    }.sum)
    val norm = math.sqrt(mv.map(x => x * x).sum)
    assert(res / norm < 0.1, s"residual ratio ${res / norm}")
  }

  test("q232: grouped jackknife SE matches a plain-Scala re-derivation") {
    val rows = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("value")).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e6)))
    val ss = rows.map(_._2).sum
    val nn = rows.length.toLong
    val groups = rows.groupBy(_._1).values.toSeq
    val g = groups.length
    val t6 = groups.map { grp =>
      val su = grp.map(_._2).sum
      math.round((ss - su).toDouble / (nn - grp.length).toDouble)
    }
    // Independent derivation — the DEVIATION form of the delete-one-group
    // jackknife, V = (G−1)/G · Σ(θᵤ − θ̄)², not the engines' moment form:
    // deviations carry the common denominator G exactly as the integers
    // (G·θᵤ − Σθ), so Σdev² = Σ(G·θᵤ − s1)²/G² in exact BigInt arithmetic
    // and V = (G−1)·Σ(G·θᵤ − s1)² / G³. Mirroring the engines' expression
    // here is what let round 13's extra /G survive the hash gate.
    val s1 = t6.map(BigInt(_)).sum
    val sqDev = t6.map { x => val d = BigInt(g) * x - s1; d * d }.sum
    val se = math.round(math.sqrt(
      (g.toDouble - 1.0) * sqDev.toDouble /
        (g.toDouble * g.toDouble * g.toDouble)))
    val r = Stats.q232Jackknife(spark, sf).collect().head
    assert(r.getAs[Long]("n_groups") === g.toLong)
    assert(r.getAs[Long]("n_events") === nn)
    assert(r.getAs[Long]("theta_fp6") ===
      math.round(ss.toDouble / nn.toDouble))
    assert(r.getAs[Long]("jk_se_fp6") === se)
  }

  test("q233: Hill tail index matches a plain-Scala order-statistic sum") {
    val xs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).filter(_._2 > 0)
    val top = xs.sortBy { case (id, x) => (-x, id) }.take(200)
    val l9 = top.map(t => math.round(math.log(t._2.toDouble) * 1e9))
    val k = l9.length
    val h = (l9.map(BigInt(_)).sum - BigInt(k) * l9.min).toDouble /
      (k - 1).toDouble / 1e9
    val r = AuditQueries.q233Hill(spark, sf).collect().head
    assert(r.getAs[Long]("k_top") === k.toLong)
    assert(r.getAs[Long]("hill_fp6") === math.round(h * 1e6))
    assert(r.getAs[Long]("alpha_fp6") === math.round(1e6 / h))
  }

  test("q234: unrolled SES equals the literal recursion l = ay + (1-a)l") {
    val rows = Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate))
    val d0 = rows.map(_._2).min
    val got = MonitorQueries.q234Ses(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    rows.groupBy(_._1).foreach { case (et, g) =>
      val ys = g.groupBy(r =>
          java.time.temporal.ChronoUnit.DAYS.between(d0, r._2))
        .toSeq.sortBy(_._1).map(_._2.length.toLong)
      // the engine's closed form, replayed EXACTLY (fp12 weights, exact
      // integer sums) — then ALSO sanity-bounded against the literal
      // double recursion below
      def l12(t: Int): BigInt =
        (1 to t).map(j => BigInt(math.round(
          0.3 * math.pow(0.7, (t - j).toDouble) * 1e12)) * ys(j)).sum +
          BigInt(math.round(math.pow(0.7, t.toDouble) * 1e12)) * ys(0)
      val last = ys.length - 1
      val r = got(et)
      assert(r.getAs[Long]("n_days") === ys.length.toLong)
      assert(r.getAs[Long]("forecast_fp6") ===
        math.round(l12(last).toDouble / 1e6))
      val se = (1 to last).map(t =>
        (BigInt(ys(t)) * BigInt(1000000000000L) - l12(t - 1)).abs).sum
      assert(r.getAs[Long]("mae_fp6") ===
        math.round(se.toDouble / last.toDouble / 1e6))
      // literal recursion cross-check: the unrolled fixed-point level
      // tracks the pure-double recursion to within quantization noise
      var lev = ys(0).toDouble
      (1 to last).foreach(t => lev = 0.3 * ys(t) + 0.7 * lev)
      assert(math.abs(r.getAs[Long]("forecast_fp6") / 1e6 - lev) < 1e-4,
        s"unrolled level diverges from the recursion for $et")
    }
  }

  test("q235: retention triangle matches a plain-Scala cohort count") {
    val rows = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val d0 = rows.map(_._2).min
    val uw = rows.map(r => (r._1,
      java.time.temporal.ChronoUnit.DAYS.between(d0, r._2) / 7)).distinct
    val cohort = uw.groupBy(_._1).map { case (u, g) => u -> g.map(_._2).min }
    val sizes = cohort.values.groupBy(identity).map(kv => kv._1 -> kv._2.size)
    val cells = uw.groupBy { case (u, wk) => (cohort(u), wk) }
      .map { case (k, g) => k -> g.size }
    val got = Events.q235Retention(spark, sf).collect()
    assert(got.length === cells.size)
    got.foreach { r =>
      val key = (r.getAs[Long]("cohort_week"), r.getAs[Long]("week"))
      assert(r.getAs[Long]("n_active") === cells(key).toLong)
      assert(r.getAs[Long]("n_cohort") === sizes(key._1).toLong)
      assert(r.getAs[Long]("rate_fp6") === math.round(
        1e6 * cells(key).toDouble / sizes(key._1).toDouble))
    }
  }

  test("q236: entropy rate matches plain-Scala transition counts " +
      "and is bounded by H0") {
    val rows = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getTimestamp(1).getNanos, r.getLong(2), r.getString(3)))
    val trans = rows.groupBy(_._1).values.flatMap { g =>
      val s = g.sortBy(r => (r._2, r._3, r._4)).map(_._5)
      s.zip(s.drop(1))
    }.toSeq
    val n = trans.length.toLong
    val byA = trans.groupBy(_._1)
    val h1 = byA.values.map { g =>
      val na = g.length
      val ha9 = g.groupBy(_._2).values.map { cell =>
        val p = cell.length.toDouble / na.toDouble
        math.round(-p * math.log(p) * 1e9)
      }.sum
      math.round(na.toDouble / n.toDouble * ha9.toDouble)
    }.sum
    val h0 = trans.groupBy(_._2).values.map { g =>
      val p = g.length.toDouble / n.toDouble
      math.round(-p * math.log(p) * 1e9)
    }.sum
    val r = Events.q236MarkovEntropy(spark, sf).collect().head
    assert(r.getAs[Long]("n_transitions") === n)
    assert(r.getAs[Long]("h0_fp9") === h0)
    assert(r.getAs[Long]("h1_fp9") === h1)
    assert(r.getAs[Long]("ratio_fp6") ===
      math.round(1e6 * h1.toDouble / h0.toDouble))
    // conditioning can only reduce entropy (up to quantization noise)
    assert(h1 <= h0 + 1000L)
  }

  test("q237: CUPED delta and variance ratio match a plain-Scala replica") {
    val rows = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate,
        math.round(r.getDouble(2) * 1e6)))
    val d0 = Tables.events(spark, sf)
      .select(to_date(col("ts")).as("day")).collect()
      .map(_.getDate(0).toLocalDate).min
    def post(d: java.time.LocalDate) =
      java.time.temporal.ChronoUnit.DAYS.between(d0, d) >= 14
    val pu = rows.groupBy(_._1).flatMap { case (u, g) =>
      val pre = g.filterNot(r => post(r._2)).map(_._3)
      val pos = g.filter(r => post(r._2)).map(_._3)
      if (pre.isEmpty || pos.isEmpty) None
      else Some((u % 2 == 1,
        math.round(pre.sum.toDouble / pre.length.toDouble),
        math.round(pos.sum.toDouble / pos.length.toDouble)))
    }.toSeq
    val n = pu.length
    val sx = pu.map(p => BigInt(p._2)).sum
    val sy = pu.map(p => BigInt(p._3)).sum
    val sxx = pu.map(p => BigInt(p._2) * p._2).sum
    val sxy = pu.map(p => BigInt(p._2) * p._3).sum
    val th = (BigInt(n) * sxy - sx * sy).toDouble /
      (BigInt(n) * sxx - sx * sx).toDouble
    val mx = sx.toDouble / n.toDouble
    val adj = pu.map(p => (p._1, p._3,
      math.round(p._3.toDouble - th * (p._2.toDouble - mx))))
    def mean(xs: Seq[Long]) = xs.sum.toDouble / xs.length.toDouble
    val dmRaw = math.round(mean(adj.filter(_._1).map(_._2)) -
      mean(adj.filterNot(_._1).map(_._2)))
    val dmCuped = math.round(mean(adj.filter(_._1).map(_._3)) -
      mean(adj.filterNot(_._1).map(_._3)))
    def m2(xs: Seq[Long]): Double = {
      val s1 = xs.map(BigInt(_)).sum
      val s2 = xs.map(x => BigInt(x) * x).sum
      (BigInt(xs.length) * s2 - s1 * s1).toDouble
    }
    val vr = math.round(1e6 * m2(adj.map(_._3)) / m2(adj.map(_._2)))
    val r = Stats.q237Cuped(spark, sf).collect().head
    assert(r.getAs[Long]("n_users") === n.toLong)
    assert(r.getAs[Long]("theta_fp6") === math.round(th * 1e6))
    assert(r.getAs[Long]("dm_raw_fp6") === dmRaw)
    assert(r.getAs[Long]("dm_cuped_fp6") === dmCuped)
    assert(r.getAs[Long]("vr_fp6") === vr)
    // θ is the pooled OLS minimizer, so var(Y′) ≤ var(Y) in exact
    // arithmetic; 100 fp6-units of headroom covers the a6 rounding
    assert(r.getAs[Long]("vr_fp6") <= 1000100L)
  }

  test("q238: CMH pooled odds ratio matches a plain-Scala 2x2 pool") {
    val seg = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderpriority"), col("o_orderstatus"))
      .collect().map(r => (seg(r.getLong(0)),
        Set("1-URGENT", "2-HIGH")(r.getString(1)),
        r.getString(2) == "F"))
    val tables = orders.groupBy(_._1).map { case (s, g) =>
      s -> ((g.count(r => r._2 && r._3).toLong,
        g.count(r => r._2 && !r._3).toLong,
        g.count(r => !r._2 && r._3).toLong,
        g.count(r => !r._2 && !r._3).toLong))
    }.filter { case (_, (a, b, c, d)) => a > 0 && b > 0 && c > 0 && d > 0 }
    def n9(a: Long, d: Long, n: Long) =
      math.round(1e9 * a.toDouble * d.toDouble / n.toDouble)
    val num = tables.values.map { case (a, b, c, d) => n9(a, d, a + b + c + d) }.sum
    val den = tables.values.map { case (a, b, c, d) => n9(b, c, a + b + c + d) }.sum
    val cmh = math.round(1e6 * num.toDouble / den.toDouble)
    val got = Stats.q238CmhOddsRatio(spark, sf).collect()
    assert(got.length === tables.size)
    got.foreach { r =>
      val (a, b, c, d) = tables(r.getAs[String]("c_mktsegment"))
      assert((r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Long]("cc"), r.getAs[Long]("d")) === ((a, b, c, d)))
      assert(r.getAs[Long]("or_fp6") === math.round(
        1e6 * a.toDouble * d.toDouble / (b.toDouble * c.toDouble)))
      assert(r.getAs[Long]("cmh_or_fp6") === cmh)
    }
  }

  test("q239: session funnel matches a plain-Scala strict-order chain") {
    val rows = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect().map { r =>
        val t = r.getTimestamp(1)
        val us = t.getTime / 1000 * 1000000 + t.getNanos / 1000
        (r.getLong(0), us, r.getLong(2), r.getString(3))
      }
    var nS = 0L; var n1 = 0L; var n2 = 0L; var n3 = 0L
    rows.groupBy(_._1).values.foreach { g =>
      val ordered = g.sortBy(r => (r._2, r._3))
      var sessions = List.empty[List[(Long, String)]]
      var prev = Long.MinValue
      ordered.foreach { r =>
        if (prev == Long.MinValue || r._2 - prev > 1800000000L)
          sessions = List.empty[(Long, String)] :: sessions
        sessions = ((r._2, r._4) :: sessions.head) :: sessions.tail
        prev = r._2
      }
      sessions.map(_.reverse).foreach { s =>
        nS += 1
        val t1 = s.collectFirst { case (u, "view") => u }
        t1.foreach { v =>
          n1 += 1
          val t2 = s.collectFirst { case (u, "click") if u > v => u }
          t2.foreach { c =>
            n2 += 1
            if (s.exists { case (u, e) => e == "purchase" && u > c }) n3 += 1
          }
        }
      }
    }
    val r = Events.q239SessionFunnel(spark, sf).collect().head
    assert(r.getAs[Long]("n_sessions") === nS)
    assert(r.getAs[Long]("n_view") === n1)
    assert(r.getAs[Long]("n_view_click") === n2)
    assert(r.getAs[Long]("n_view_click_buy") === n3)
    assert(r.getAs[Long]("r12_fp6") ===
      math.round(1e6 * n2.toDouble / n1.toDouble))
  }

  test("q240: gains deciles match a plain-Scala ranked split") {
    val rows = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getString(2)))
    val d0 = rows.map(_._2).min
    def dayOf(d: java.time.LocalDate) =
      java.time.temporal.ChronoUnit.DAYS.between(d0, d)
    val p9 = rows.filter(r => dayOf(r._2) < 14).groupBy(_._1).map {
      case (u, g) =>
        val k = g.count(_._3 == "purchase")
        u -> math.round(1e9 * (k + 1).toDouble / (g.length + 5).toDouble)
    }
    val nU = p9.size
    val decile = p9.toSeq.sortBy { case (u, p) => (-p, u) }.zipWithIndex
      .map { case ((u, _), i) => u -> i.toLong * 10 / nU }.toMap
    val cellsRaw = rows.filter(r => dayOf(r._2) >= 14)
      .flatMap(r => decile.get(r._1).map(d => (d, r._3 == "purchase")))
    val cells = cellsRaw.groupBy(_._1).map { case (d, g) =>
      d -> ((g.length.toLong, g.count(_._2).toLong))
    }
    val te = cells.values.map(_._1).sum
    val tp = cells.values.map(_._2).sum
    val got = MonitorQueries.q240Gains(spark, sf).collect()
      .map(r => r.getAs[Long]("decile") -> r).toMap
    assert(got.keySet === cells.keySet)
    cells.foreach { case (d, (ne, np)) =>
      val ds = cells.filter(_._1 <= d).values
      val (ce, cp) = (ds.map(_._1).sum, ds.map(_._2).sum)
      val r = got(d)
      assert(r.getAs[Long]("n_events") === ne)
      assert(r.getAs[Long]("n_purch") === np)
      assert(r.getAs[Long]("rate_fp6") ===
        math.round(1e6 * np.toDouble / ne.toDouble))
      assert(r.getAs[Long]("cum_lift_fp6") === math.round(
        1e6 * (cp.toDouble / ce.toDouble) / (tp.toDouble / te.toDouble)))
    }
  }

  test("q241: matched ATT equals a brute-force nearest-control match") {
    val seg = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderpriority"),
        to_date(col("o_orderdate")).as("d"), col("o_totalprice"))
      .collect().map(r => (seg(r.getLong(0)), r.getLong(1),
        Set("1-URGENT", "2-HIGH")(r.getString(2)),
        r.getDate(3).toLocalDate.toEpochDay, // vs 1990 epoch: same offsets
        math.round(r.getDouble(4) * 100)))
    val bySeg = orders.groupBy(_._1)
    var n = 0L; var sd = BigInt(0)
    bySeg.values.foreach { g =>
      val controls = g.filterNot(_._3)
      g.filter(_._3).foreach { t =>
        // brute force: nearest |Δday|; ties backward first, then max key
        if (controls.nonEmpty) {
          val best = controls.minBy { c =>
            val delta = math.abs(c._4 - t._4)
            val back = if (c._4 <= t._4) 0 else 1
            (delta, back, -c._2)
          }
          n += 1
          sd += BigInt(t._5 - best._5)
        }
      }
    }
    val r = AsOfQueries.q241MatchedAtt(spark, sf).collect().head
    assert(r.getAs[Long]("n_matched") === n)
    assert(r.getAs[Long]("att_fp6") ===
      math.round(1e6 * sd.toDouble / n.toDouble))
  }

  test("q242: tercile buckets match a plain-Scala cut of the scored corpus") {
    // the LM scoring itself is gate-certified (q144) and spec'd in
    // LangModelSpec; this pins the NEW mirrored math — the per-language
    // tercile cut and bucket aggregation — against the engine's own
    // scores collected once
    val langOf = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val bits = AuditQueries.bigramBitsAll(spark, sf).collect()
      .map(r => (langOf(r.getAs[Long]("doc_id")), r.getAs[Long]("bits_fp6")))
    val got = AuditQueries.q242CcnetBuckets(spark, sf).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("bucket")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("mean_bits_fp6")))).toMap
    val expected = bits.groupBy(_._1).flatMap { case (lang, g) =>
      val xs = g.map(_._2).sorted
      val n = xs.length
      val t1 = xs((n + 2) / 3 - 1)
      val t2 = xs((2 * n + 2) / 3 - 1)
      g.map(_._2).groupBy(b =>
          if (b <= t1) "head" else if (b <= t2) "middle" else "tail")
        .map { case (bk, ys) =>
          (lang, bk) -> ((ys.length.toLong,
            math.round(ys.sum.toDouble / ys.length.toDouble)))
        }
    }
    assert(got === expected)
  }

  test("q243: DoReMi weights match a plain-Scala excess-loss reweight") {
    val srcOf = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val bits = AuditQueries.bigramBitsAll(spark, sf).collect()
      .map(r => (srcOf(r.getAs[Long]("doc_id")), r.getAs[Long]("bits_fp6")))
    val perSrc = bits.groupBy(_._1).map { case (s, g) =>
      (s, g.length.toLong, g.map(_._2).sum)
    }.toSeq
    val nn = perSrc.map(_._2).sum
    val sbAll = perSrc.map(_._3).sum
    val meanAll = math.round(sbAll.toDouble / nn.toDouble)
    val raw = perSrc.map { case (s, n, sb) =>
      val mean6 = math.round(sb.toDouble / n.toDouble)
      val ex = math.max(0L, mean6 - meanAll)
      (s, n, mean6, ex, math.round(
        1e9 * (n.toDouble / nn.toDouble) * math.exp(1.0 * ex.toDouble / 1e6)))
    }
    val tot = raw.map(_._5).sum
    val got = MixQueries.q243DoremiWeights(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(got.size === raw.length)
    var wSum = 0L
    raw.foreach { case (s, n, mean6, ex, r9) =>
      val r = got(s)
      assert(r.getAs[Long]("n_docs") === n)
      assert(r.getAs[Long]("mean_bits_fp6") === mean6)
      assert(r.getAs[Long]("excess_fp6") === ex)
      val w = math.round(1e9 * r9.toDouble / tot.toDouble)
      assert(r.getAs[Long]("weight_fp9") === w, s"weight for $s")
      wSum += w
    }
    // weights are a (rounded) probability vector
    assert(math.abs(wSum - 1000000000L) <= raw.length.toLong)
  }

  test("q224: weighted-sample keys and top-100 match a plain-Scala A-Res") {
    def hex8(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).filter(_._2 > 0)
    val keyed = docs.map { case (id, w) =>
      val u = (hex8(s"$id#wrs") + 1).toDouble / 4294967296.0
      (id, w, math.round(math.log(u) / w.toDouble * 1e12))
    }
    val expected = keyed.sortBy { case (id, _, k) => (-k, id) }.take(100).toSeq
    val got = MixQueries.q224WeightedSample(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("w"),
        r.getAs[Long]("key_fp12"))).toSeq
    assert(got === expected)
  }

  test("q247: hat values and Cook's distance match an exact-BigInt " +
      "adjugate inversion of the full 3x3 normal matrix") {
    // independent path: the gate never forms the 3x3 — it uses the
    // centered 2x2 closed form. Here the UNcentered normal matrix
    // A = X'X is inverted exactly via BigInt cofactors, h_i and the
    // coefficient vector come out as exact rationals, and only the
    // final comparisons drop to BigDecimal(DECIMAL128). A mirrored
    // centering mistake in engine+oracle cannot survive this.
    val mc = new java.math.MathContext(34)
    def bd(b: BigInt) = BigDecimal(b, mc)
    val rows = Tables.lineitem(spark, sf).select(col("l_returnflag"),
        round(col("l_quantity") * 100).cast("long"),
        round(col("l_discount") * 100).cast("long"),
        round(col("l_extendedprice") * 100).cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val got = Stats.q247Leverage(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    for ((flag, grp) <- rows.groupBy(_._1)) {
      val n = BigInt(grp.length)
      def s(f: ((String, Long, Long, Long)) => BigInt) = grp.map(f).sum
      val sq = s(r => BigInt(r._2)); val sd = s(r => BigInt(r._3))
      val sp = s(r => BigInt(r._4))
      val sqq = s(r => BigInt(r._2) * r._2); val sqd = s(r => BigInt(r._2) * r._3)
      val sdd = s(r => BigInt(r._3) * r._3); val sqp = s(r => BigInt(r._2) * r._4)
      val sdp = s(r => BigInt(r._3) * r._4); val spp = s(r => BigInt(r._4) * r._4)
      // A = [[n,sq,sd],[sq,sqq,sqd],[sd,sqd,sdd]]; adjugate + det, exact
      val det = n * (sqq * sdd - sqd * sqd) - sq * (sq * sdd - sqd * sd) +
        sd * (sq * sqd - sqq * sd)
      val a00 = sqq * sdd - sqd * sqd; val a01 = -(sq * sdd - sqd * sd)
      val a02 = sq * sqd - sqq * sd
      val a11 = n * sdd - sd * sd; val a12 = -(n * sqd - sq * sd)
      val a22 = n * sqq - sq * sq
      // b = A^{-1} X'y via the adjugate (exact numerators)
      val bn0 = a00 * sp + a01 * sqp + a02 * sdp
      val bn1 = a01 * sp + a11 * sqp + a12 * sdp
      val bn2 = a02 * sp + a12 * sqp + a22 * sdp
      val detD = bd(det)
      val b0 = bd(bn0) / detD; val b1 = bd(bn1) / detD; val b2 = bd(bn2) / detD
      def hNum(q: BigInt, d: BigInt): BigInt =
        a00 + a01 * q + a02 * d +
          q * (a01 + a11 * q + a12 * d) +
          d * (a02 + a12 * q + a22 * d)
      val hs = grp.map { case (_, q, d, _) => bd(hNum(q, d)) / detD }
      val es = grp.map { case (_, q, d, p) =>
        bd(BigInt(p)) - b0 - b1 * bd(BigInt(q)) - b2 * bd(BigInt(d)) }
      val s2 = es.map(e => e * e).sum / bd(n - 3)
      val cooks = hs.zip(es).map { case (h, e) =>
        (e * e * h) / (bd(3) * s2 * (bd(1) - h) * (bd(1) - h)) }
      val r = got(flag)
      assert(r.getAs[Long]("n_rows") === grp.length.toLong)
      val sumH6 = hs.map(h => (h * bd(BigInt(1000000)))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).sum
      assert(math.abs(r.getAs[Long]("sum_h_fp6") - sumH6) <= 2L, s"$flag sum_h")
      val maxH9 = hs.map(h => (h * bd(BigInt(1000000000)))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).max
      assert(math.abs(r.getAs[Long]("max_h_fp9") - maxH9) <= 2L, s"$flag max_h")
      // cutoff h > 2p/n  <=>  n·hNum > 6·det: EXACT integer classification
      val nHigh = grp.count { case (_, q, d, _) => n * hNum(q, d) > 6 * det }
      assert(r.getAs[Long]("n_high_leverage") === nHigh.toLong, s"$flag n_high")
      val maxC9 = cooks.map(c => (c * bd(BigInt(1000000000)))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).max
      assert(math.abs(r.getAs[Long]("max_cooks_fp9") - maxC9) <= 2L, s"$flag cooks")
      val nInf = cooks.count(c => c * bd(n) > bd(4))
      assert(r.getAs[Long]("n_influential") === nInf.toLong, s"$flag n_inf")
      // trace(H) = p exactly: the rounded sum sits within per-row jitter
      assert(math.abs(sumH6 - 3000000L) <= grp.length.toLong, s"$flag trace")
    }
  }
}
