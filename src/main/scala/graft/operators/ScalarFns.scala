package graft.operators

import graft.Q

/** §2.H — scalar function suites. Populated incrementally. */
object ScalarFns {
  val queries: Seq[Q] = Seq()
}
