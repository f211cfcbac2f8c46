package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utility: salt the hot side, explode the dim side.
  *
  * A shuffle join on a power-law key (the usual shape of user_id / doc
  * source / hot product keys at 100 TB) puts the hottest key on one
  * reducer. Salting splits each key into `salts` sub-keys: the fact side
  * gets a random-but-deterministic salt per row, the (smaller) dim side is
  * replicated once per salt, and the join key becomes (key, salt) — the hot
  * key's rows now spread over `salts` reducers. AQE's skew-join split
  * handles moderate skew automatically; explicit salting is the tool when
  * one key alone exceeds what a single task should hold.
  */
object Skew {

  /** Deterministic per-row salt in [0, salts): hash of the whole row's key
    * column plus a disambiguator column (avoid rand() — keeps reruns and
    * retries identical).
    */
  def salt(disambig: Column, salts: Int): Column =
    pmod(hash(disambig), lit(salts))

  /** Join `facts` (large, skewed on `key`) with `dim` (small enough to
    * replicate `salts`×, too large or unwanted to broadcast whole).
    */
  def saltedJoin(
      facts: DataFrame, dim: DataFrame, key: String,
      disambig: String, salts: Int): DataFrame = {
    val saltedFacts = facts.withColumn("__salt", salt(col(disambig), salts))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFacts.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
