package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.LanguageId

/** Stopword-profile language ID: five languages distinguished on real
  * sentences; deterministic tiebreak; Column/SQL expression generation
  * stays in lockstep with the scalar form. */
class LanguageIdSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val samples = Seq(
    "en" -> "The quick brown fox jumps over the lazy dog and it was the best of times for all of the animals in the forest.",
    "de" -> "Der schnelle braune Fuchs springt über den faulen Hund und das ist eine der besten Zeiten mit den Tieren im Wald.",
    "fr" -> "Le renard brun rapide saute sur le chien paresseux et c'est une des meilleures périodes pour les animaux dans la forêt.",
    "es" -> "El rápido zorro marrón salta sobre el perro perezoso y es una de las mejores épocas para los animales en el bosque.",
    "it" -> "La rapida volpe marrone salta sopra il cane pigro e questa è una delle migliori epoche per gli animali nel bosco.")

  test("five languages distinguished on natural sentences") {
    samples.foreach { case (lang, text) =>
      val (detected, scores) = LanguageId.detect(text)
      assert(detected == lang, s"expected $lang got $detected (scores $scores)")
    }
  }

  test("deterministic profile-order tiebreak and null safety") {
    assert(LanguageId.detect("")._1 == "en") // all-zero scores -> first profile
    assert(LanguageId.detect(null)._1 == "en")
    assert(LanguageId.detect("zzz qqq xxx")._1 == "en")
  }

  test("Column expressions reproduce the scalar scores") {
    import spark.implicits._
    val df = samples.toDF("lang", "text")
      .selectExpr(("lang" +: "text" +: LanguageId.sparkScoreExprs("text")): _*)
      .selectExpr("*", LanguageId.argmaxCase)
    val rows = df.collect()
    rows.foreach { r =>
      val lang = r.getString(0)
      val text = r.getString(1)
      val (scalarLang, scalarScores) = LanguageId.detect(text)
      assert(r.getAs[String]("lang_guess") == scalarLang)
      LanguageId.Profiles.map(_._1).foreach { l =>
        assert(r.getAs[Long](s"score_$l") == scalarScores(l).toLong,
          s"column/scalar drift for $l on '$lang' sample")
      }
      assert(r.getAs[String]("lang_guess") == lang)
    }
  }
}
