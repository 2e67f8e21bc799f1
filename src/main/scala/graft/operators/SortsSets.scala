package graft.operators

import graft.Q

/** §2.F + §2.G — sorts / limits / top-k and set operations.
  * Populated incrementally; see SURVEY.md §2.
  */
object SortsSets {
  val queries: Seq[Q] = Seq()
}
