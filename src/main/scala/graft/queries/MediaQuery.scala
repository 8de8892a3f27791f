package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Multimodal
import graft.ops.Multimodal.{BmpDecoder, MediaRow}

/** Multimodal gate query: every embedding is rendered as a REAL 24-bit BMP
  * (8×8 grayscale, byte = floor((v+1)·127.5) clamped to [0,255]), the
  * payload is parsed back by the pure-JVM [[Multimodal.BmpDecoder]] inside
  * `mapPartitions`, and 16 features are extracted from the decoded pixels.
  *
  * The oracle replicates the render arithmetic directly — so the BMP
  * encode → byte-parse round trip must be PIXEL-EXACT for the hash to
  * match, certifying the decoder, not just the feature math.
  */
object MediaQuery {

  /** Grayscale byte for an embedding value; floor avoids the round-half
    * tie-break divergence between engines. */
  private def gray(v: Float): Byte = {
    val b = math.floor((v.toDouble + 1.0) * 127.5).toLong
    math.max(0L, math.min(255L, b)).toByte
  }

  def q50MediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])]
      .map { case (id, emb) =>
        val rgb = new Array[Byte](emb.length * 3)
        var i = 0
        while (i < emb.length) {
          val g = gray(emb(i))
          rgb(3 * i) = g; rgb(3 * i + 1) = g; rgb(3 * i + 2) = g
          i += 1
        }
        MediaRow(id, "image", "bmp", Multimodal.Bmp.encode(8, 8, rgb), 8, 8, 0L)
      }
    val frames = Multimodal.decodeFrames(media, new BmpDecoder)(spark)
    val feats = Multimodal.extractFeatures(frames)(spark)
    feats.toDF()
      .select(col("media_id"), posexplode(col("feature")).as(Seq("dim", "val")))
      .select(col("media_id"), col("dim").cast("long").as("dim"),
        col("val").cast("double").as("feature"))
      .orderBy(col("media_id"), col("dim"))
  }

  /** The same pipeline arithmetically: pixel p's gray byte from embedding
    * value p, pixel-byte j = gray(j/3) (RGB triplets), feature d = bytes
    * [4d, 4d+4) summed / 1024. Integer sums ≤ 1020 divided by 2¹⁰ are
    * exact in float and double alike, so no rounding gap. */
  val q50MediaFeaturesSql: String =
    """WITH px AS (
      |  SELECT vec_id,
      |    CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS p,
      |    LEAST(255, GREATEST(0,
      |      CAST(floor((CAST(unnest(embedding) AS DOUBLE) + 1.0) * 127.5) AS BIGINT))) AS g
      |  FROM embeddings),
      |bytes AS (
      |  SELECT vec_id, p * 3 + c.c AS j, g
      |  FROM px CROSS JOIN (SELECT unnest([0, 1, 2]) AS c) c)
      |SELECT vec_id AS media_id, j // 4 AS dim,
      |  CAST(SUM(g) AS DOUBLE) / 1024.0 AS feature
      |FROM bytes WHERE j < 64
      |GROUP BY 1, 2
      |ORDER BY media_id, dim""".stripMargin
}
