package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** r9 batch 26: clustering evaluation and multivariate outliers —
  * simplified (centroid) silhouette over the embeddings table with
  * micro-integer centroid components (the q_embed_anisotropy
  * quantization discipline, so no double-sum-order hazard anywhere),
  * and a diagonal-Mahalanobis outlier census.
  */
object Analytics44 {
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame

  /** Simplified silhouette per label: a = distance to the own-label
    * centroid, b = nearest other centroid, s = (b−a)/max(a,b).
    * Components quantize to micro integers BEFORE any aggregation and
    * centroids floor once per (label, dim), so squared distances are
    * EXACT decimal integers; the only doubles are the per-point sqrt
    * pair and the micro-rounded s. Mean s per label is then an exact
    * integer mean.
    *
    * 100 TB shape: centroids are a (label × dim) partial agg; the
    * point×centroid fan-out is |points|·|labels| AFTER the dim
    * reduction (never |points|²) — the k-bounded silhouette form. */
  val qSilhouette: Q = (s, d) => {
    val pts = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("vec_id"), col("label"), col("dim"),
        expr("CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)").as("xm"))
    val cents = pts.groupBy(col("label").as("clabel"), col("dim"))
      .agg(expr("sum(xm) div count(1)").as("cm"))
    val d2 = pts.join(cents, Seq("dim"))
      .groupBy(col("vec_id"), col("label"), col("clabel"))
      .agg(sum(expr("CAST(xm - cm AS DECIMAL(38,0)) * (xm - cm)")).as("dist2"))
    val ab = d2.groupBy("vec_id", "label")
      .agg(
        min(expr("CASE WHEN clabel = label THEN dist2 END")).as("a2"),
        min(expr("CASE WHEN clabel != label THEN dist2 END")).as("b2"))
      .withColumn("s_micro", expr(
        """CAST(round((sqrt(CAST(b2 AS DOUBLE)) - sqrt(CAST(a2 AS DOUBLE)))
           / greatest(sqrt(CAST(a2 AS DOUBLE)), sqrt(CAST(b2 AS DOUBLE)))
           * 1000000) AS BIGINT)"""))
    ab.groupBy("label")
      .agg(count(lit(1)).as("n_points"),
        expr("sum(s_micro) div count(1)").as("mean_sil_micro"),
        sum((col("s_micro") < 0).cast("long")).as("n_negative"))
      .orderBy("label")
  }

  /** Diagonal-Mahalanobis outlier census per return flag over
    * (quantity, price, discount): D² = Σⱼ((x−μⱼ)/σⱼ)² against the
    * literal χ²₃ 99% critical value 11.344867. Moments are exact
    * decimals; the per-row D² comparison runs on identically-built
    * doubles. The multivariate upgrade of q_outliers' univariate z.
    *
    * 100 TB shape: one moment pass + one comparison pass, both
    * partial-aggregable; the 3-row moment frame broadcasts. */
  val qMahalanobisDiag: Q = (s, d) => {
    val li = Tables.lineitem(s, d).select(
      col("l_returnflag").as("flag"),
      expr("CAST(CAST(round(l_quantity) AS BIGINT) AS DECIMAL(38,0))").as("x1"),
      expr("CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0))").as("x2"),
      expr("CAST(CAST(round(l_discount * 100) AS BIGINT) AS DECIMAL(38,0))").as("x3"))
    val m = li.groupBy("flag").agg(
      count(lit(1)).as("n"),
      sum("x1").as("s1"), sum(col("x1") * col("x1")).as("s11"),
      sum("x2").as("s2"), sum(col("x2") * col("x2")).as("s22"),
      sum("x3").as("s3"), sum(col("x3") * col("x3")).as("s33"))
    def z2(x: String, sx: String, sxx: String) =
      s"""(CAST($x AS DOUBLE) - CAST($sx AS DOUBLE) / n)
         * (CAST($x AS DOUBLE) - CAST($sx AS DOUBLE) / n)
         / ((CAST($sxx AS DOUBLE) - CAST($sx AS DOUBLE) * (CAST($sx AS DOUBLE) / n)) / (n - 1))"""
    li.join(broadcast(m), "flag")
      .withColumn("d2", expr(
        s"${z2("x1", "s1", "s11")} + ${z2("x2", "s2", "s22")} + ${z2("x3", "s3", "s33")}"))
      .groupBy("flag")
      .agg(count(lit(1)).as("n_rows"),
        sum((col("d2") > 11.344867).cast("long")).as("n_outliers"))
      .withColumn("outlier_ppm", expr("(n_outliers * 1000000) div n_rows"))
      .orderBy("flag")
  }

  val all: Map[String, Q] = Map(
    "q_silhouette" -> qSilhouette,
    "q_mahalanobis_diag" -> qMahalanobisDiag,
  )

  val oracles: Map[String, String] = Map(
    "q_silhouette" ->
      """WITH pts AS (
        | SELECT vec_id, label, dim,
        |   CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS xm
        | FROM (
        |  SELECT vec_id, label, generate_subscripts(embedding, 1) AS dim,
        |    unnest(embedding) AS x
        |  FROM embeddings) u),
        |cents AS (
        | SELECT label AS clabel, dim, sum(xm) // count(*) AS cm
        | FROM pts GROUP BY 1, 2),
        |d2 AS (
        | SELECT vec_id, label, clabel,
        |   CAST(sum(CAST(xm - cm AS HUGEINT) * (xm - cm)) AS HUGEINT) AS dist2
        | FROM pts JOIN cents USING (dim)
        | GROUP BY 1, 2, 3),
        |ab AS (
        | SELECT vec_id, label,
        |  min(CASE WHEN clabel = label THEN dist2 END) AS a2,
        |  min(CASE WHEN clabel != label THEN dist2 END) AS b2
        | FROM d2 GROUP BY 1, 2),
        |sm AS (
        | SELECT label,
        |  CAST(round((sqrt(CAST(b2 AS DOUBLE)) - sqrt(CAST(a2 AS DOUBLE)))
        |    / greatest(sqrt(CAST(a2 AS DOUBLE)), sqrt(CAST(b2 AS DOUBLE)))
        |    * 1000000) AS BIGINT) AS s_micro
        | FROM ab)
        |SELECT label, count(*) AS n_points,
        | CAST(sum(s_micro) // count(*) AS BIGINT) AS mean_sil_micro,
        | CAST(sum(CASE WHEN s_micro < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_negative
        |FROM sm GROUP BY label ORDER BY label""".stripMargin,
    "q_mahalanobis_diag" ->
      """WITH li AS (
        | SELECT l_returnflag AS flag,
        |  CAST(round(l_quantity) AS BIGINT) AS x1,
        |  CAST(round(l_extendedprice * 100) AS BIGINT) AS x2,
        |  CAST(round(l_discount * 100) AS BIGINT) AS x3
        | FROM lineitem),
        |m AS (
        | SELECT flag, count(*) AS n,
        |  CAST(sum(x1) AS HUGEINT) AS s1, CAST(sum(CAST(x1 AS HUGEINT) * x1) AS HUGEINT) AS s11,
        |  CAST(sum(x2) AS HUGEINT) AS s2, CAST(sum(CAST(x2 AS HUGEINT) * x2) AS HUGEINT) AS s22,
        |  CAST(sum(x3) AS HUGEINT) AS s3, CAST(sum(CAST(x3 AS HUGEINT) * x3) AS HUGEINT) AS s33
        | FROM li GROUP BY flag)
        |SELECT li.flag, count(*) AS n_rows,
        | CAST(sum(CASE WHEN
        |   (CAST(x1 AS DOUBLE) - CAST(s1 AS DOUBLE) / n) * (CAST(x1 AS DOUBLE) - CAST(s1 AS DOUBLE) / n)
        |     / ((CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) / n)) / (n - 1))
        |   + (CAST(x2 AS DOUBLE) - CAST(s2 AS DOUBLE) / n) * (CAST(x2 AS DOUBLE) - CAST(s2 AS DOUBLE) / n)
        |     / ((CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * (CAST(s2 AS DOUBLE) / n)) / (n - 1))
        |   + (CAST(x3 AS DOUBLE) - CAST(s3 AS DOUBLE) / n) * (CAST(x3 AS DOUBLE) - CAST(s3 AS DOUBLE) / n)
        |     / ((CAST(s33 AS DOUBLE) - CAST(s3 AS DOUBLE) * (CAST(s3 AS DOUBLE) / n)) / (n - 1))
        |   > 11.344867 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        | CAST((sum(CASE WHEN
        |   (CAST(x1 AS DOUBLE) - CAST(s1 AS DOUBLE) / n) * (CAST(x1 AS DOUBLE) - CAST(s1 AS DOUBLE) / n)
        |     / ((CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) / n)) / (n - 1))
        |   + (CAST(x2 AS DOUBLE) - CAST(s2 AS DOUBLE) / n) * (CAST(x2 AS DOUBLE) - CAST(s2 AS DOUBLE) / n)
        |     / ((CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * (CAST(s2 AS DOUBLE) / n)) / (n - 1))
        |   + (CAST(x3 AS DOUBLE) - CAST(s3 AS DOUBLE) / n) * (CAST(x3 AS DOUBLE) - CAST(s3 AS DOUBLE) / n)
        |     / ((CAST(s33 AS DOUBLE) - CAST(s3 AS DOUBLE) * (CAST(s3 AS DOUBLE) / n)) / (n - 1))
        |   > 11.344867 THEN 1 ELSE 0 END) * 1000000) // count(*) AS BIGINT)
        |   AS outlier_ppm
        |FROM li JOIN m ON li.flag = m.flag
        |GROUP BY li.flag ORDER BY li.flag""".stripMargin,
  )
}
