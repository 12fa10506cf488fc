package graft

/** Soak knobs for the model-based gauntlets: CI runs the committed
  * fixed seeds/op counts (deterministic regressions), while a local
  * soak can deepen both without editing the specs:
  * {{{
  *   SPARK_GRAFT_GAUNTLET_OPS=60 \
  *   SPARK_GRAFT_GAUNTLET_SEEDS=101,102,103 sbt "testOnly graft.*Gauntlet* graft.CdcReplaySpec"
  * }}}
  */
object GauntletEnv {
  def ops(default: Int): Int =
    sys.env.get("SPARK_GRAFT_GAUNTLET_OPS").map(_.trim.toInt).getOrElse(default)
  def seeds(default: Seq[Long]): Seq[Long] =
    sys.env.get("SPARK_GRAFT_GAUNTLET_SEEDS")
      .map(_.split(',').toSeq.map(_.trim.toLong)).getOrElse(default)
}
