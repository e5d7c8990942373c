package graft

/** Single-pass placeholder substitution for generated oracle SQL.
  *
  * Two latent bug classes in template-built SQL (ADVICE r8):
  *  1. interpolating a caller fragment BEFORE `.stripMargin` silently
  *     eats a leading `|` (or the first pipe of a `||` concat) on any
  *     fragment continuation line — the q_hll_sets bug class;
  *  2. SEQUENTIAL `.replace` of several placeholders can corrupt the
  *     output if an earlier-substituted fragment itself contains a
  *     later placeholder token.
  *
  * [[fill]] closes both: call it on the template AFTER stripMargin,
  * and every placeholder is replaced in one left-to-right scan —
  * substituted content is never rescanned, so fragments may contain
  * placeholder-shaped text (or margin pipes) safely.
  */
private[graft] object SqlTemplate {

  /** Replace each `(token → fragment)` in `template` in one pass.
    * Tokens must be non-empty and non-overlapping in the template. */
  def fill(template: String, subs: (String, String)*): String = {
    require(subs.nonEmpty && subs.forall(_._1.nonEmpty), "need tokens")
    val m = subs.toMap
    require(m.size == subs.size, s"duplicate placeholder in $subs")
    val pat = java.util.regex.Pattern.compile(
      m.keys.toSeq.sorted.map(java.util.regex.Pattern.quote).mkString("|"))
    val matcher = pat.matcher(template)
    val sb = new java.lang.StringBuilder
    var last = 0
    while (matcher.find()) {
      sb.append(template, last, matcher.start()).append(m(matcher.group()))
      last = matcher.end()
    }
    sb.append(template, last, template.length).toString
  }
}
