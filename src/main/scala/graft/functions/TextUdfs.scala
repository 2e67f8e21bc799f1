package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Text UDFs for the LLM-pipeline operators (SURVEY.md §2.J/K).
  *
  * The tokenizer logic is EXACTLY: lowercase → strip all chars outside
  * [a-z ] → split on single spaces keeping empty tokens. This precise
  * form is mirrored textually by the DuckDB oracle
  * (`string_split(lower(regexp_replace(text,'[^a-z ]','','g')),' ')`),
  * so keep the two in lock-step when changing either.
  *
  * Scale note: a Scala UDF breaks codegen for the column it computes but
  * stays fully distributed (per-row, no state). The hot paths that feed
  * aggregations (minhash, tf-idf) use [[tokenizeCol]] via built-in
  * expressions instead, which stays inside whole-stage codegen.
  */
object TextUdfs {
  val tokenize: UserDefinedFunction =
    udf((s: String) =>
      if (s == null) Seq.empty[String]
      else s.toLowerCase.replaceAll("[^a-z ]", "").split(" ", -1).toSeq)

  /** Same semantics as [[tokenize]] but as built-in expressions
    * (codegen-friendly; used by downstream §2.K operators).
    */
  def tokenizeCol(c: Column): Column = {
    import org.apache.spark.sql.functions._
    split(regexp_replace(lower(c), "[^a-z ]", ""), " ", -1)
  }

  val SQL_TOKENIZE =
    "string_split(lower(regexp_replace(text, '[^a-z ]', '', 'g')), ' ')"
}
