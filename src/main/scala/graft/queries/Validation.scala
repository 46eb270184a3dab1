package graft.queries

import graft.{QueryDef, Tables}
import graft.validate.{EventRules, Validator}

/** Validation rule-engine surface (F4/F5): per-rule report + severity-
  * weighted overall score, all from one scan of `events`.
  */
object Validation {

  val report = QueryDef(
    "q_validation_report",
    (s, d) => Validator.report(Tables.events(s, d), EventRules.all),
    Some(Validator.reportSqlDuck("events", EventRules.all))
  )

  val score = QueryDef(
    "q_validation_score",
    (s, d) => Validator.score(Tables.events(s, d), EventRules.all),
    Some(Validator.scoreSqlDuck("events", EventRules.all))
  )

  def all: Seq[QueryDef] = Seq(report, score)
}
