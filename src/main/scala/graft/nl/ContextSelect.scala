package graft.nl

import graft.meta.{AllowedValues, ColumnMeta, DataDictionary}

/** Dictionary-driven prompt-context selection and rendering (SURVEY.md
  * §2.1 P7-P8, the reference's query_llm.py:85-158).
  *
  * Scoring: a column scores its `importance`, plus 100 if its name or any
  * alias appears as a substring of the lowercased question; top-k columns
  * (default 12) are kept and the dictionary's global rules ride along.
  *
  * This is a driver-side operation over ~100 dictionary entries; the same
  * scoring is expressible as a DataFrame (score → orderBy desc → limit k)
  * if a dictionary ever became table-sized.
  */
object ContextSelect {

  case class Context(columns: Seq[ColumnMeta], rules: Seq[String])

  def score(question: String, col: ColumnMeta): Int = {
    val q = question.toLowerCase
    val hit = (col.name +: col.aliases).exists { a =>
      val al = a.toLowerCase
      al.nonEmpty && q.contains(al)
    }
    col.importance + (if (hit) 100 else 0)
  }

  def selectRelevantContext(
      question: String,
      dict: DataDictionary,
      topK: Int = 12): Context = {
    val ranked = dict.columns
      .map(c => (c, score(question, c)))
      // stable sort on score ONLY: equal-score columns keep dictionary
      // order, matching the reference's sorted(key=score) (query_llm.py:95)
      .sortBy { case (_, s) => -s }
      .take(topK)
      .map(_._1)
    Context(ranked, dict.rules)
  }

  /** Render a context block for the system prompt: one markdown bullet per
    * column with type, description, allowed values (all dictionary
    * shapes), aliases, and access tips; rules appended at the end.
    */
  def render(ctx: Context): String = {
    val sb = new StringBuilder
    sb.append("Relevant columns:\n")
    ctx.columns.foreach { c =>
      sb.append(s"- ${c.name} (${c.dataType})")
      if (c.description.nonEmpty) sb.append(s": ${c.description}")
      c.allowedValues.foreach { av =>
        val rendered = av match {
          case AllowedValues.Literals(vs)    => vs.mkString(", ")
          case AllowedValues.Enumeration(vs) => vs.mkString(", ")
          case AllowedValues.Range(lo, hi)   => s"range [$lo, $hi]"
          case AllowedValues.Examples(vs) =>
            s"examples: ${vs.mkString(", ")}"
          case AllowedValues.Pattern(p) => s"pattern: $p"
          case AllowedValues.Raw(j)     => s"example: $j"
        }
        sb.append(s" Allowed: $rendered.")
      }
      if (c.aliases.nonEmpty)
        sb.append(s" Aliases: ${c.aliases.mkString(", ")}.")
      sb.append("\n")
      c.accessHints.foreach(h => sb.append(s"  Access tip: $h\n"))
    }
    if (ctx.rules.nonEmpty) {
      sb.append("Rules:\n")
      ctx.rules.foreach(r => sb.append(s"- $r\n"))
    }
    sb.toString
  }
}
