package graft

import org.apache.spark.sql.functions._

import graft.operators.Mojibake

/** Detector edge cases the planted-corpus oracle can't state: healthy
  * accented text must NOT trip the Ã-ladder, each class fires
  * independently. */
class MojibakeSpec extends SparkSpec {

  import spark.implicits._

  private def detect(s: String): (Boolean, Boolean, Boolean) = {
    val r = Seq(s).toDF("t").select(
      Mojibake.hasReplacement(col("t")),
      Mojibake.hasC1Controls(col("t")),
      Mojibake.hasLatin1Mojibake(col("t"))).head
    (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2))
  }

  test("clean text — ASCII and healthy accents — is not flagged") {
    assert(detect("plain ascii words") === (false, false, false))
    // properly-decoded café / naïve: no ladder, no C1
    assert(detect("café naïve À bientôt") ===
      (false, false, false))
    // Ã followed by a plain letter (legit Portuguese 'nÃO'
    // uppercased oddly) is still not the ladder shape
    assert(detect("SÃO PAULO") === (false, false, false))
  }

  test("each damage class fires independently") {
    assert(detect("lost byte � here") === (true, false, false))
    assert(detect("smart quote  band") === (false, true, false))
    assert(detect("cafÃ©") === (false, false, true))
    assert(detect("Â nbsp ladder") === (false, false, true))
  }
}
