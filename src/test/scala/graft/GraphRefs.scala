package graft

/** Shared plain-Scala graph reference implementations for differential
  * specs (r12 ADVICE: refLpa was duplicated verbatim between GraphSpec
  * and PropertySpec — two copies of the vote/tie-break contract could
  * drift independently). */
object GraphRefs {

  /** Plain-Scala synchronous LPA over a both-direction weighted edge
    * list (the t28 plain-reference pattern): per round every node takes
    * the label with the largest weighted in-neighbour vote, ties to the
    * smallest label. */
  def refLpa(we: Seq[(Long, Long, Long)], rounds: Int): Map[Long, Long] = {
    var labels = we.map(_._1).distinct.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      labels = we.groupBy(_._2).map { case (dst, es) =>
        val votes = es.groupBy(e => labels(e._1))
          .map { case (l, g) => (l, g.map(_._3).sum) }
        dst -> votes.toSeq.sortBy { case (l, ws) => (-ws, l) }.head._1
      }
    }
    labels
  }
}
