package graft.nl

/** Prompt templating (SURVEY.md §2.1 P9, query_llm.py:20-35): a system
  * prompt carrying the DDL + dictionary context + a one-shot example, and
  * a user prompt wrapping the NL question.
  */
object Prompt {

  def user(question: String): String =
    s"Write an SQL query that returns - $question"

  def system(table: String, ddl: String, contextBlock: String): String =
    s"""You are a SQL generator. Target table:
       |CREATE TABLE $table ($ddl);
       |
       |$contextBlock
       |Reply with a single ANSI SQL SELECT statement for Spark SQL and
       |nothing else.
       |Example:
       |SELECT name FROM $table WHERE LOWER(status) = 'online';
       |""".stripMargin
}
