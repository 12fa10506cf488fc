package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffles (SURVEY.md §7 risk "skewed keys →
  * salting or AQE skew-join" — the manual technique for when AQE's
  * post-hoc split isn't available or the skew is known up front).
  *
  * A hot join key sends all its rows to ONE reduce task; at 100 TB a
  * single key with 1% of the data serializes 1 TB through one task.
  * Salting splits it: the big side gets a salt in [0, S) appended to
  * the key, the small side is replicated ×S, and the equi join runs on
  * (key, salt) — the hot key's rows now spread across S tasks. The
  * output is IDENTICAL to the unsalted join (each big row matches
  * exactly the one replica with its salt), which is what makes the
  * oracle row exact.
  *
  * Trade: the small side shuffles ×S — use only when the small side is
  * too big to broadcast (broadcast needs no salting: no shuffle at all)
  * but far smaller than the skewed side. The salt source is
  * row-position based (`monotonically_increasing_id`), uniform across a
  * hot key's rows regardless of the key's own distribution — a
  * key-derived hash would put the whole hot key in one salt bucket and
  * change nothing.
  */
object SkewOps {

  private val SaltCol = "__graft_salt"

  /** Inner equi join on `key` with S-way salting. The join is pinned to
    * a shuffle-hash plan — salting exists precisely for the case where
    * the small side cannot broadcast, so letting the planner broadcast
    * it would demo nothing.
    */
  def saltedInnerJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val salted = big.withColumn(
      SaltCol, pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val replicated = small.withColumn(
      SaltCol, explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated.hint("shuffle_hash"), Seq(key, SaltCol)).drop(SaltCol)
  }
}
