package graft.queries

import graft.{QueryDef, Tables}
import graft.validate.{EventRules, Validator}

/** Validation rule-engine surface (F4/F5): per-rule report + severity-
  * weighted overall score, all from one scan of `events`.
  */
object Validation {

  val report = QueryDef(
    "q_validation_report",
    (s, d) => Validator.report(EventRules.enrich(Tables.events(s, d)), EventRules.all),
    Some(s"WITH ${EventRules.enrichDuck}\n" +
      Validator.reportSqlDuck("enriched", EventRules.all))
  )

  val score = QueryDef(
    "q_validation_score",
    (s, d) => Validator.score(EventRules.enrich(Tables.events(s, d)), EventRules.all),
    Some(s"WITH ${EventRules.enrichDuck}\n" +
      Validator.scoreSqlDuck("enriched", EventRules.all))
  )

  def all: Seq[QueryDef] = Seq(report, score)
}
