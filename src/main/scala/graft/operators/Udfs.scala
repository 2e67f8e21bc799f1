package graft.operators

import graft.Q

/** §2.J — UDF / UDAF / UDTF surface. Populated incrementally. */
object Udfs {
  val queries: Seq[Q] = Seq()
}
