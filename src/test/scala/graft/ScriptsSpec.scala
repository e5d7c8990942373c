package graft

import org.apache.spark.sql.functions._

import graft.operators.Scripts

/** Homoglyph-flag edge cases the planted corpus can't state: honest
  * bilingual text (scripts in SEPARATE words) must not be flagged. */
class ScriptsSpec extends SparkSpec {

  import spark.implicits._

  private def mixed(s: String): Boolean =
    Seq(s).toDF("t").select(Scripts.hasMixedScriptWord(col("t")))
      .head.getBoolean(0)

  test("bilingual text is not a homoglyph; intra-word mixes are") {
    assert(!mixed("hello world"))
    assert(!mixed("hello \u043f\u0440\u0438\u0432\u0435\u0442 world")) // separate Cyrillic word
    assert(mixed("p\u0430yp\u0430l"))            // Cyrillic a inside a Latin word
    assert(mixed("\u0440ay"))                     // leading Cyrillic, Latin tail
    // non-adjacent mixes inside ONE token still trip (digit/punct between)
    assert(mixed("p1\u0430"))                     // digit between scripts
    assert(mixed("\u0440-pal"))                   // hyphen between scripts
    assert(!mixed("pay \u0440\u0443"))            // whitespace separates \u2192 clean
  }

  test("per-class counts are exact and independent") {
    val r = Seq(("ab \u043f\u0440\u0438 \u6570\u636e \u0628")).toDF("t")
      .select(Scripts.nCyrillic(col("t")), Scripts.nCjk(col("t")),
        Scripts.nArabic(col("t"))).head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((3L, 2L, 1L)))
  }
}
