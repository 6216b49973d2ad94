package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style heuristic cleaning (Raffel et al. 2020 §2.2): line-level
  * retention rules plus page-level discard rules — the other canonical
  * heuristic filter next to the Gopher rule set (q92), which gates whole
  * documents; this one REWRITES them line by line.
  *
  * Line rules (a line survives iff ALL hold):
  *   - ends in terminal punctuation (. ! ? or closing quote after one)
  *   - has ≥ 3 words
  *   - does not contain "javascript" (case-insensitive)
  * Page rules (the document is kept iff ALL hold, judged on KEPT lines):
  *   - ≥ `minLines` surviving lines
  *   - no "lorem ipsum" and no '{' anywhere in the original text
  *
  * One map-only codegen scan — array lambdas over the line split, no
  * explode, no shuffle: at 100 TB this is a straight scan.
  *
  * Registered as q101 with a FULL oracle: the fixture corpus has no
  * newlines or punctuation, so the query synthesizes multi-line pages
  * deterministically from it (every rule fires somewhere) and DuckDB
  * restates both the synthesis and the rules; planted multi-line docs in
  * CleaningSpec additionally pin each rule in isolation. */
object Cleaning {

  private val TerminalPunct = """[.!?]["']?\s*$"""

  def c4Clean(docs: DataFrame, textCol: Column, idCol: Column,
      minLines: Int = 5): DataFrame = {
    val lines = split(textCol, "\n", -1)
    val keepLine = (l: Column) =>
      l.rlike(TerminalPunct) &&
        size(split(trim(l), "\\s+")) >= 3 &&
        !lower(l).contains("javascript")
    val kept = filter(lines, keepLine)
    val pageKept = size(kept) >= minLines &&
      !lower(textCol).contains("lorem ipsum") &&
      !textCol.contains("{")
    docs.select(idCol.cast("long").as("doc_id"),
      when(pageKept, concat_ws("\n", kept)).otherwise(lit("")).as("clean_text"),
      size(kept).cast("long").as("kept_lines"),
      (size(lines) - size(kept)).cast("long").as("dropped_lines"),
      when(pageKept, 1L).otherwise(0L).as("page_kept"))
  }
}
