package graft

/** Soak knobs for the model-based gauntlets: CI runs the committed
  * fixed seeds/op counts (deterministic regressions), while a local
  * soak can deepen both without editing the specs:
  * {{{
  *   SPARK_GRAFT_GAUNTLET_OPS=60 \
  *   SPARK_GRAFT_GAUNTLET_SEEDS=101,102,103 sbt "testOnly graft.*Gauntlet* graft.CdcReplaySpec"
  * }}}
  * Malformed values fail with a MESSAGE naming the variable (these are
  * read at spec construction — a bare NumberFormatException would
  * abort every suite with nothing but a stack trace); duplicate seeds
  * are deduped (ScalaTest refuses duplicate test names).
  */
object GauntletEnv {
  /** Generous per-table retention for gauntlet tables: a deep soak's
    * long, many-commit sequences must not let the catalog's 60 s /
    * 64-snapshot defaults expire v0 out from under the
    * net-composition and stream-from-0 checks (found by a depth-25
    * concurrency soak — 150 commits blew the count cap). Retention
    * expiry itself is covered by RetentionSpec.
    */
  val SoakRetention: String =
    " TBLPROPERTIES ('graft.retention.seconds'='3600', " +
      "'graft.retention.snapshots'='100000')"
  private def parse[A](name: String, raw: String, what: String)(f: String => A): A =
    try f(raw)
    catch { case _: NumberFormatException =>
      throw new IllegalArgumentException(s"$name must be $what, got '$raw'")
    }
  def ops(default: Int): Int =
    sys.env.get("SPARK_GRAFT_GAUNTLET_OPS").map(v =>
      parse("SPARK_GRAFT_GAUNTLET_OPS", v, "a positive integer") { s =>
        val n = s.trim.toInt
        require(n > 0, s"SPARK_GRAFT_GAUNTLET_OPS must be > 0, got $n")
        n
      }).getOrElse(default)
  def seeds(default: Seq[Long]): Seq[Long] =
    sys.env.get("SPARK_GRAFT_GAUNTLET_SEEDS").map(v =>
      parse("SPARK_GRAFT_GAUNTLET_SEEDS", v, "comma-separated integers") {
        _.split(',').iterator.map(_.trim).filter(_.nonEmpty).map(_.toLong)
          .toSeq.distinct
      }).getOrElse(default)
}
