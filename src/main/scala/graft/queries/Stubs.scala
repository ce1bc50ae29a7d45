package graft.queries

import graft.{Q, QueryModule}

// Placeholder modules — filled in as operators land (SURVEY.md §2).
object ScalarFnQueries extends QueryModule { def queries: Seq[(String, Q)] = Seq.empty }
object SrfQueries extends QueryModule { def queries: Seq[(String, Q)] = Seq.empty }
object EventQueries extends QueryModule { def queries: Seq[(String, Q)] = Seq.empty }
object TextQueries extends QueryModule { def queries: Seq[(String, Q)] = Seq.empty }
object VectorQueries extends QueryModule { def queries: Seq[(String, Q)] = Seq.empty }
object SourceQueries extends QueryModule { def queries: Seq[(String, Q)] = Seq.empty }
