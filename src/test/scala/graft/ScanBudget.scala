package graft

/** Shared parser for the scan-budget net: counts top-level fields across
  * every `ReadSchema: struct<...>` occurrence in a physical plan string,
  * tracking `<`/`>` depth so nested types (array<float>, struct<...>) count
  * as one field each.
  */
object ScanBudget {

  private val marker = "ReadSchema: struct<"

  /** Total top-level read-schema fields across all scans in the plan. */
  def readFields(plan: String): Int = {
    var total = 0
    var idx = plan.indexOf(marker)
    while (idx >= 0) {
      var i = idx + marker.length
      var depth = 1
      var fields = 0
      var sawAny = false
      while (depth > 0 && i < plan.length) {
        plan.charAt(i) match {
          case '<' => depth += 1
          case '>' => depth -= 1
          case ',' if depth == 1 => fields += 1
          case c if depth == 1 && !c.isWhitespace => sawAny = true
          case _ =>
        }
        i += 1
      }
      total += (if (sawAny) fields + 1 else 0)
      idx = plan.indexOf(marker, i)
    }
    total
  }
}
