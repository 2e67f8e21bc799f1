package graft.operators

import graft.{Q, Tables}
import graft.functions.TextUdfs
import org.apache.spark.sql.functions._

/** §2.J — UDF / UDAF / UDTF surface (the UDAF row, udaf_geomean, lives
  * in [[Aggs]]).
  */
object Udfs {
  import TextUdfs.SQL_TOKENIZE

  val queries: Seq[Q] = Seq(
    // The token list is serialized to a space-joined string at the
    // output boundary: the driver's compare sorts in pandas, which
    // cannot hash array cells. The UDF itself still returns the array.
    Q("udf_tokenize",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          concat_ws(" ", TextUdfs.tokenize(col("text"))).as("tokens"),
          size(TextUdfs.tokenize(col("text"))).cast("long").as("n_tokens"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, array_to_string($SQL_TOKENIZE, ' ') AS tokens,
              |CAST(len($SQL_TOKENIZE) AS BIGINT) AS n_tokens
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // Generator/UDTF surface: posexplode (a built-in Catalyst Generator)
    // over the tokenizer output — one row per (doc, position, token).
    Q("udtf_explode_tokens",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(TextUdfs.tokenizeCol(col("text"))).as(Seq("pos", "token")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("token"))
        .orderBy("doc_id", "pos"),
      Some(s"""SELECT doc_id,
              |CAST(generate_subscripts(toks, 1) - 1 AS BIGINT) AS pos,
              |unnest(toks) AS token
              |FROM (SELECT doc_id, $SQL_TOKENIZE AS toks FROM documents) t
              |ORDER BY doc_id, pos""".stripMargin))
  )
}
