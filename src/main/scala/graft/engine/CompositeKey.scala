package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A (possibly composite) join key for the maintained-join family
  * ([[JoinView]], [[FilterJoinView]], [[AsOfJoinView]]). Real schemas
  * join on multi-column keys constantly — the reference's own key model
  * is composite (bytewise-encoded key ARRAYS,
  * `/root/reference/index.js:236`), so multi-part keys are the native
  * idiom, not an add-on. Implicit conversions keep the single-column
  * call sites (`"o_custkey"`) source-compatible.
  */
final case class JoinKey(parts: Seq[String]) {
  require(parts.nonEmpty, "a join key needs at least one column")
  require(parts.distinct.size == parts.size,
    s"join key columns must be distinct, got ${parts.mkString(", ")}")
  def size: Int = parts.size
  override def toString: String = parts.mkString("(", ",", ")")
}

object JoinKey {
  import scala.language.implicitConversions
  implicit def fromString(c: String): JoinKey = JoinKey(Seq(c))
  implicit def fromSeq(cs: Seq[String]): JoinKey = JoinKey(cs)
}

/** The state-key SPELLING of composite keys, shared by the whole
  * maintained-join family — the [[functions.BytewiseKey]] idea (escape,
  * then terminate/separate, so byte equality equals tuple equality) at
  * the string level the stores key on:
  *
  *  - one part: the raw string cast — byte-identical to every existing
  *    single-key view (no stored-state migration);
  *  - several parts: each part ESCAPED (`ESC → ESC ESC`, `SEP → ESC
  *    0x03`) then joined with [[Sep]] via `concat`. Escaping makes the
  *    spelling INJECTIVE — a part containing the separator can neither
  *    truncate the key nor collide with a different tuple (the failure
  *    mode of naive `concat_ws(U+0001, ...)`) — and `concat` (not
  *    `concat_ws`, which silently DROPS nulls and would collide
  *    ("a", null) with ("a")) NULL-POISONS: any null part nulls the
  *    whole key, matching SQL's null-never-equi-joins.
  *
  * The salt shard ([[salted]]) is appended as one more [[Sep]]-separated
  * segment; because escaped parts contain no raw separator, [[unsalt]]
  * recovers the base spelling exactly as the first `parts` segments.
  * (Single-part keys keep their historical raw spelling, so the
  * documented caveat stands there: with salting enabled a ONE-column key
  * must not contain U+0001 — spell it as a composite of one real column
  * plus a constant discriminator, or pre-escape it, if it can.)
  */
private[graft] object CompositeKey {
  /** Separator between spelled parts, and between key and salt shard. */
  val Sep = "\u0001"
  private val Esc = "\u0002"
  private val SubSep = "\u0003"

  /** Escape one part so it contains no raw [[Sep]]: ESC doubles, SEP
    * maps to ESC+0x03. Standard prefix-free escaping — decoding is
    * unambiguous, so the joined spelling is injective. */
  def escapePart(c: Column): Column =
    regexp_replace(
      regexp_replace(c.cast("string"), lit(Esc), lit(Esc + Esc)),
      lit(Sep), lit(Esc + SubSep))

  /** Spelling of a key tuple (see object doc). */
  def spell(cols: Seq[Column]): Column =
    if (cols.size == 1) cols.head.cast("string")
    else concat(cols.map(escapePart).flatMap(c => Seq(lit(Sep), c)).tail: _*)

  /** [[spell]] over plain column names. */
  def spellNames(key: JoinKey): Column = spell(key.parts.map(col))

  /** [[spell]] over a prefix-qualified struct (CDC `emit_value.*`). */
  def spellUnder(prefix: String, key: JoinKey): Column =
    spell(key.parts.map(p => col(s"$prefix.$p")))

  /** Emit key of a row: the spelled join key, sharded by a salt derived
    * from the row's OWN primary key when salting — the same row always
    * lands in the same shard, so delete-then-insert stays shard-local.
    * `concat` (null-poisoning) keeps a null key null rather than
    * spelling a bare shard. Identity at salt 1.
    *
    * `parts` enforces the single-part caveat at RUN time instead of
    * leaving it to the object doc: a ONE-column key keeps its raw
    * unescaped spelling (byte-compat with every existing store), so a
    * raw U+0001 inside it would make [[unsalt]] silently truncate the
    * key — under salting such a row now fails the write loudly
    * (`raise_error`) with the documented workaround. Multi-part keys
    * are escaped and need no guard; the check is one `contains` per
    * row, only compiled in when `parts == 1 && saltBuckets > 1`. */
  def salted(spelledJk: Column, pk: Column, saltBuckets: Int,
      parts: Int = 1): Column =
    if (saltBuckets <= 1) spelledJk
    else {
      val base =
        if (parts > 1) spelledJk
        else when(spelledJk.isNull || !spelledJk.contains(Sep), spelledJk)
          .otherwise(raise_error(concat(
            lit("single-column join key value '"), spelledJk,
            lit("' contains the U+0001 shard separator and saltBuckets > 1 " +
              "— unsalt would truncate it; spell the key as a composite " +
              "(add a constant discriminator column) or pre-escape it"))))
      concat(base, lit(Sep),
        pmod(xxhash64(pk.cast("string")), lit(saltBuckets)).cast("string"))
    }

  /** Expand a one-column relation of spelled base keys to its S salted
    * spellings (identity at salt 1) — the bounded fan-out every
    * key-addressed read pays under salting. */
  def expand(spark: SparkSession, keys: DataFrame, saltBuckets: Int): DataFrame =
    if (saltBuckets <= 1) keys
    else {
      val c = keys.columns.head
      keys.crossJoin(spark.range(saltBuckets).toDF("__salt"))
        .select(concat(col(c).cast("string"), lit(Sep), col("__salt")).as(c))
    }

  /** Strip the salt shard off a stored emit key: the spelled base key is
    * the first `parts` [[Sep]]-separated segments (escaped parts carry
    * no raw separator). True identity at salt 1 — a single UNSALTED key
    * containing U+0001 is never touched. */
  def unsalt(k: Column, parts: Int, saltBuckets: Int): Column =
    if (saltBuckets <= 1) k else substring_index(k, Sep, parts)

  /** Equi-join condition over the original key columns of two sides
    * (part-wise `===` — Catalyst-native equality, null never matches). */
  def equi(left: JoinKey, right: JoinKey): Column = {
    require(left.size == right.size,
      s"join keys must have the same arity: $left vs $right")
    left.parts.zip(right.parts)
      .map { case (l, r) => col(l) === col(r) }.reduce(_ && _)
  }
}
