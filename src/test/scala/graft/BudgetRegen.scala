package graft

/** Regenerates the literal budget maps for [[ExchangeBudgetSpec]] and
  * [[ScanBudgetSpec]] after a deliberate plan change:
  *
  * {{{
  * sbt -batch "Test/runMain graft.BudgetRegen"
  * }}}
  *
  * Paste the printed blocks over the corresponding `budgets` literals (and
  * re-argue any loosened entry in the commit message — the nets exist so a
  * new shuffle/scan is a conscious decision, not drift).
  */
object BudgetRegen {
  def main(args: Array[String]): Unit = {
    val shuffle   = "\\bExchange\\b".r
    val broadcast = "\\bBroadcastExchange\\b".r
    val scanToken = "\\bFileScan\\b".r
    val plans = SurfacePlans.plans.toSeq.sortBy(_._1)
    println("// ExchangeBudgetSpec.budgets")
    for ((name, p) <- plans)
      println(s"""    "$name" -> (${shuffle.findAllIn(p).size}, ${broadcast.findAllIn(p).size}),""")
    println("// ScanBudgetSpec.budgets")
    for ((name, p) <- plans)
      println(s"""    "$name" -> (${scanToken.findAllIn(p).size}, ${ScanBudget.readFields(p)}),""")
  }
}
