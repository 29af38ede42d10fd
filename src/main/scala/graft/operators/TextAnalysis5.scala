package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Stable, Tables}

/** Text analysis, part 5: corpus-level statistical modeling. */
object TextAnalysis5 {
  type Q = (SparkSession, String) => DataFrame

  // ---- t16: Zipf-law fit over the vocabulary ----
  // OLS of ln(freq) on ln(rank) — the standard corpus sanity check (a
  // natural corpus fits slope ~ -1; this synthetic one is near-uniform,
  // which the fit exposes). Moments are decimal-stable sums over the
  // VOCABULARY table (tiny at any corpus size — the only global window
  // runs there, never on the corpus), and the closed form solves in
  // double, rounded 1e-6 to absorb cross-engine FMA.
  val t16_zipf_fit: Q = (s, d) => {
    val words = Tables.documents(s, d)
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .filter(col("word") =!= "")
    val vocab = words.groupBy("word").agg(count(lit(1)).as("c"))
    val ranked = vocab.withColumn("r",
      row_number().over(Window.orderBy(desc("c"), asc("word"))).cast("long"))
    val pts = ranked.select(
      log(col("r").cast("double")).as("x"), log(col("c").cast("double")).as("y"))
    pts.agg(
        count(lit(1)).as("n"),
        Stable.dsum(col("x")).as("sx"), Stable.dsum(col("y")).as("sy"),
        Stable.dsum(col("x") * col("x")).as("sxx"),
        Stable.dsum(col("x") * col("y")).as("sxy"))
      .select(col("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy"))
          / (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
        round((col("sy") * col("sxx") - col("sx") * col("sxy"))
          / (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("intercept"))
  }
  val t16Sql: String =
    s"""WITH w AS (SELECT unnest(string_split(lower(text), ' ')) AS word
                 FROM documents),
      v AS (SELECT word, COUNT(*) AS c FROM w WHERE word <> '' GROUP BY 1),
      rk AS (SELECT c, row_number() OVER (ORDER BY c DESC, word) AS r FROM v),
      p AS (SELECT ln(CAST(r AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y FROM rk),
      m AS (SELECT COUNT(*) AS n,
              ${Stable.sqlSum("x")} AS sx, ${Stable.sqlSum("y")} AS sy,
              ${Stable.sqlSum("x * x")} AS sxx, ${Stable.sqlSum("x * y")} AS sxy
            FROM p)
      SELECT n, round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
             round((sy * sxx - sx * sxy) / (n * sxx - sx * sx), 6) AS intercept
      FROM m"""

  val queries: Map[String, Q] = Map("t16_zipf_fit" -> t16_zipf_fit)
  val oracles: Map[String, String] = Map("t16_zipf_fit" -> t16Sql)
}
