package graft

/** Dev-only: print every declared query ID (one per line) for
  * tools/check_survey_parity.py — the SURVEY §2 declared==implemented
  * gate. Usage: runMain graft.QueryList [outFile]
  */
object QueryList {
  def main(args: Array[String]): Unit = {
    val names = SparkEntry.queries.keys.toSeq.sorted
    args.headOption match {
      case Some(f) =>
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(f), names.mkString("", "\n", "\n"))
        println(s"[querylist] ${names.size} query ids -> $f")
      case None => names.foreach(println)
    }
  }
}
