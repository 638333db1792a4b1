package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions._

/** Pins the scalar text functions to the reference's behavior
  * (/root/reference/test/utils_test.py, data_cleaners_test.py). */
class TextFunctionsSpec extends AnyFunSuite {

  test("matchAll non-overlapping semantics (utils_test.py:25-28)") {
    assert(matchAll("p", "apppap") == Seq(1, 2, 3, 5))
    assert(matchAll("pp", "apppap") == Seq(1))
    assert(matchAll("p", "a") == Seq())
  }

  test("escapeTitle matches urllib.parse.quote (utils_test.py:35-36)") {
    assert(escapeTitle("List of countries and dependencies by population") ==
      "List%20of%20countries%20and%20dependencies%20by%20population")
    // unicode golden from iobes_test.py:48
    assert(escapeTitle("2002–03 NHL season") == "2002%E2%80%9303%20NHL%20season")
    assert(escapeTitle("a/b_c.d-e~f") == "a/b_c.d-e~f")
    assert(escapeTitle("a+b&c=d") == "a%2Bb%26c%3Dd")
  }

  test("cleanPageContent drops template parens + references tag (data_cleaners.py:5-14)") {
    assert(cleanPageContent("before<references />after") == "beforeafter")
    assert(cleanPageContent("in ( ; Kaapstad) word") == "in  word")
    assert(cleanPageContent("x (, abc ) y") == "x  y")
    assert(cleanPageContent("x (abc; ) y") == "x  y")
    // balanced non-degenerate parens survive
    assert(cleanPageContent("x (abc) y") == "x (abc) y")
  }

  test("upperFirst / lowerFirst do not touch the rest of the string") {
    assert(upperFirst("some text") == "Some text")
    assert(upperFirst("FIFA") == "FIFA")
    assert(upperFirst("wêreld") == "Wêreld")
    assert(upperFirst("") == "")
    assert(lowerFirst("Some Text") == "some Text")
  }

  test("asciiFold + cleanEntity fold Latin diacritics (db.py:12-13 approximation)") {
    assert(cleanEntity("Wêreldbeker") == "wereldbeker")
    assert(cleanEntity("  Suid-Afrika ") == "suid-afrika")
    assert(cleanEntity("Éléphant") == "elephant")
    assert(cleanEntity("Straße") == "strasse")
    assert(cleanEntity("Øre") == "ore")
  }

  test("underscoreToSpace (lookups.py:30-31)") {
    assert(underscoreToSpace("Fort_de_Goede_Hoop") == "Fort de Goede Hoop")
  }

  test("validity flags (process_pages.py:9-29)") {
    assert(titleHasInvalidFlag("Picture.JPG of things"))
    assert(titleHasInvalidFlag("Foo (disambiguation)"))
    assert(!titleHasInvalidFlag("Parade"))
    assert(textHasImageFlag("some .svg link"))
    assert(!textHasImageFlag("Kaapstad"))
  }

  test("countOccurrences uses non-overlapping matches") {
    assert(countOccurrences("aa", "aaaa") == 2)
  }

  test("asciiFold romanizes Greek and Cyrillic (unidecode-style)") {
    assert(cleanEntity("Μόσχα") == "moskha") // NFD strips the tonos, then romanize
    assert(cleanEntity("Αθήνα") == "athena")
    assert(cleanEntity("Москва") == "moskva")
    assert(cleanEntity("Хрущёв") == "khrushchev")
    assert(cleanEntity("объект") == "obekt") // hard sign dropped
    assert(asciiFold("Шостакович") == "Shostakovich") // capitals keep case
    // frequent ideographs transliterate unidecode-style (pinyin + space);
    // ideographs beyond the bounded table still pass through
    assert(asciiFold("東京") == "Dong Jing ")
    assert(asciiFold("中国") == "Zhong Guo ")
    assert(asciiFold("麤") == "麤")
  }

  test("asciiFold covers kana letterwise, incl. NFD-decomposed voicing") {
    import graft.functions.TextFunctions.{asciiFold, cleanEntity, foldResidue}
    assert(asciiFold("ひらがな") == "hiragana")
    assert(asciiFold("カタカナ") == "katakana")
    // voiced kana survive the NFD mark strip (が = か + U+3099)
    assert(asciiFold("がぎぐげご") == "gagigugego")
    assert(asciiFold("パピプペポ") == "papipupepo")
    assert(asciiFold("ラーメン") == "ra-men")
    assert(cleanEntity("トウキョウ") == "toukiyou") // letterwise, no digraphs
    assert(foldResidue("すしダンゴ") == 0)
  }

  test("foldResidue makes non-covered-script passthrough observable") {
    import graft.functions.TextFunctions.foldResidue
    // fully covered inputs leave zero residue
    assert(foldResidue("Wêreldé-ü ö í à Ørsted Łódź") == 0)
    assert(foldResidue("Ψάρι Шостакович") == 0)
    assert(foldResidue(null) == 0)
    // frequent ideographs now fold (bounded CjkPinyin table)...
    assert(foldResidue("東京 tower") == 0)
    // ...but rare ideographs outside it pass through and are COUNTED,
    // not silent — the bounded-coverage contract stays observable
    assert(foldResidue("麤鱻 tower") == 2)
  }

  test("asciiFold covers Arabic, Hebrew, Hangul, Devanagari, eastern digits") {
    import graft.functions.TextFunctions.{asciiFold, foldResidue}
    // Arabic: مرحبا (marhaban greeting)
    assert(asciiFold("مرحبا") == "mrhba")
    assert(foldResidue("مرحبا") == 0)
    // Arabic tashkeel (fatha etc.) are non-spacing marks: stripped
    assert(asciiFold("مُحَمَّد") == "mhmd")
    // Eastern-Arabic + Persian digits
    assert(asciiFold("١٢٣ ۴۵۶") == "123 456")
    // Hebrew with final forms: שלום
    assert(asciiFold("שלום") == "shlvm")
    assert(asciiFold("ספר ים") == "spr ym")
    // Hangul: algorithmic jamo romanization over the full syllable block
    // (letter-wise like unidecode — final ㄱ stays "g", not positional "k")
    assert(asciiFold("한국") == "hangug")
    assert(asciiFold("서울") == "seoul")
    assert(asciiFold("김치") == "gimchi")
    // Devanagari (letter-wise, no inherent-vowel reconstruction)
    assert(asciiFold("नमस्ते") == "nmste")
    assert(foldResidue("नमस्ते") == 0)
  }
}
