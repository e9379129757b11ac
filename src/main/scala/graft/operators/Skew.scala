package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling helpers (SURVEY §5). AQE's skew-join split is the
  * default answer (on in every graft session); `saltedJoin` is the
  * explicit fallback for the cases AQE cannot fix — e.g. a single hot
  * key whose rows exceed one executor's memory even after splitting,
  * or a deliberately pre-partitioned pipeline where AQE is disabled.
  */
object Skew {

  /** Inner equi-join with the left (large, skewed) side salted.
    *
    * Left rows get a salt in [0, saltFactor) derived from a per-row
    * unique id; right rows are replicated saltFactor times (an explode
    * of a literal range — cheap when the right side is the smaller
    * one). The join key becomes (key, salt), so a hot key's rows spread
    * over `saltFactor` reducers instead of one.
    *
    * Why not hash the row content for the salt: (a) byte-identical
    * duplicate rows — the common shape of a hot key in denormalized
    * facts — would all hash to ONE salt and stay unspread, and (b)
    * hashing struct(all columns) fails analysis outright on MapType
    * columns. The unique-id salt spreads every row; any salt value in
    * [0, saltFactor) is equally correct (the right side covers all of
    * them), so the id's nondeterminism under task retry is harmless.
    *
    * Semantics identical to `left.join(right, leftKey === rightKey)`
    * (verified in SkewSpec); row multiplicity is preserved because every
    * left row matches exactly one replica of each right match.
    */
  def saltedJoin(left: DataFrame, right: DataFrame,
                 leftKey: String, rightKey: String,
                 saltFactor: Int = 16): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor - 1L))))
    // SHUFFLE_HASH pin: this operator exists precisely for the case where
    // the right side cannot broadcast (at the design scale it is SF-sized
    // ×saltFactor). Without the hint, a small-SF run broadcasts the
    // replicated side — the salt becomes dead weight and the measured
    // plan (broadcast of a deliberately saltFactor-times-inflated table)
    // is one that can never exist at scale. The hint forces the
    // shuffle-on-(key, salt) plan that IS the operator.
    //
    // The hint sits on the SALTED side, making it the hash-join build
    // side: per (key, salt) slot the salted side holds 1/saltFactor of
    // the key's left rows while the replicated side holds ALL of the
    // key's right rows — for a fact⋈fact shape like lineitem⋈orders
    // (≈4 lines/order × saltFactor=16) building the replicated side
    // would hash a table ~4× larger per partition than this one.
    salted.hint("shuffle_hash").join(replicated,
        salted(leftKey) === replicated(rightKey) &&
          salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
