package graft.queries

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Independent plain-Scala derivations for the round-16 additions
  * (q250 winnowing, q251 grid-DBSCAN, q252 k-center coreset): the hash
  * gate certifies Spark-vs-DuckDB agreement, but both engines could
  * mirror the same wrong formula (the q232 lesson) — these replicas
  * re-derive each result from the algorithm's definition with no shared
  * code.
  */
class NewOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def hex8(s: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.take(4).foldLeft(0L)((acc, b) => acc * 256 + (b & 0xff))
  }

  test("q250: winnowing fingerprints + overlap report match a plain-Scala " +
      "replica of the algorithm's definition") {
    val k = 4; val w = 4; val maxDf = 50
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // fingerprints: distinct minima of every full w-window of k-gram hashes
    val fps: Map[Long, Set[Long]] = docs.map { case (id, text) =>
      val toks = text.split(" ", -1) // split keeps empties, like both engines
      val grams =
        if (toks.length < k) Array.empty[Long]
        else toks.sliding(k).map(_.mkString(" ")).map(hex8).toArray
      val sel =
        if (grams.length < w) Set.empty[Long]
        else grams.sliding(w).map(_.min).toSet
      id -> sel
    }.toMap
    val df = fps.values.toSeq.flatten.groupBy(identity).view.mapValues(_.size)
    val masked = fps.view.mapValues(_.filter(h => df(h) <= maxDf)).toMap
    val expected = (for {
      (a, ha) <- masked.toSeq; (b, hb) <- masked.toSeq if a < b
      shared = (ha intersect hb).size if shared >= 2
    } yield (a, b, shared.toLong))
      .sortBy { case (a, b, n) => (-n, a, b) }.take(50)
    val got = DedupQueries.q250Winnowing(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
  }

  test("q251: grid-blocked DBSCAN equals a plain-Scala all-pairs DBSCAN " +
      "(same eps/minPts/border rule)") {
    val minPts = 4
    val pts = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).head.toDouble,
        r.getSeq[Float](1)(1).toDouble))
    val eps = Embeddings.dbEps(pts.length.toLong) // same density rule
    def near(a: (Long, Double, Double), b: (Long, Double, Double)) = {
      val dx = a._2 - b._2; val dy = a._3 - b._3
      dx * dx + dy * dy <= eps * eps
    }
    val nbrs = pts.map(p =>
      p._1 -> pts.filter(q => q._1 != p._1 && near(p, q)).map(_._1).toSet).toMap
    val core = pts.map(_._1).filter(id => nbrs(id).size >= minPts - 1).toSet
    // components over core-core edges (min-id labels via fixpoint)
    var rep = core.map(id => id -> id).toMap
    var changed = true
    while (changed) {
      changed = false
      core.foreach { id =>
        val m = (nbrs(id).intersect(core).map(rep) + rep(id)).min
        if (m != rep(id)) { rep += id -> m; changed = true }
      }
    }
    val border = pts.map(_._1).filterNot(core)
      .flatMap(id => nbrs(id).intersect(core) match {
        case s if s.nonEmpty => Some(id -> s.map(rep).min)
        case _ => None
      }).toMap
    val assigned = core.map(id => (id, rep(id), 1L)) ++
      border.map { case (id, r) => (id, r, 0L) }
    val expected = (assigned.groupBy(_._2).map { case (c, ms) =>
      (c, ms.size.toLong, ms.count(_._3 == 1L).toLong, ms.map(_._1).sum)
    }.toSeq :+ {
      val noise = pts.map(_._1).filterNot(assigned.map(_._1).toSet)
      (-1L, noise.size.toLong, 0L, noise.sum)
    }).sortBy(_._1)
    val got = Embeddings.q251DbscanGrid(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got === expected)
  }

  test("q252: k-center picks and radii match a plain-Scala greedy replica " +
      "(same sequential-double cosine, same tie rule)") {
    val k = 8
    val pts = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    var centers = List((1L, pts.head._1, 0.0))
    var mind = pts.map(p => p._1 -> (1.0 - cos(p._2, pts.head._2))).toMap
    (2 to k).foreach { r =>
      val (nid, nd) = mind.toSeq.maxBy { case (id, d) => (d, -id) }
      centers ::= ((r.toLong, nid, nd))
      val nv = pts.find(_._1 == nid).get._2
      mind = pts.map(p =>
        p._1 -> math.min(mind(p._1), 1.0 - cos(p._2, nv))).toMap
    }
    val expected = centers.reverse
    val got = Embeddings.q252KcenterCoreset(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    assert(got.map(x => (x._1, x._2)) === expected.map(x => (x._1, x._2)))
    // radii are the same double arithmetic on both sides (sequential
    // fold); bit-identical is the q20 discipline
    got.zip(expected).foreach { case (g, e) =>
      assert(g._3 === e._3, s"radius drift at round ${g._1}")
    }
  }

  test("q205: the locality-condensed CC path returns the identical " +
      "clusters to plain CC over the same q192 link edges") {
    // q205 condenses on the head-8 block key (r17) — valid because a
    // `link` decision requires all three FS fields to agree, so every
    // link edge's endpoints share head-8 and the whole component
    // carries one bk. This pin re-derives the clusters through the
    // PLAIN loop over the gate's own public link output.
    val links = DedupQueries.q192FellegiSunter(spark, sf)
      .filter(col("decision") === "link")
      .select(col("id_a"), col("id_b"))
    val plain = graft.ops.Dedup.connectedComponents(links, maxIter = 100)
      .groupBy(col("rep")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = DedupQueries.q205ErClusters(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === plain)
  }
}
