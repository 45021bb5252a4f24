package graft.analyze

/** The classic Porter stemming algorithm (M.F. Porter, "An algorithm for
  * suffix stripping", Program 14(3), 1980 — public algorithm), implemented
  * step-for-step from the paper so each step is unit-testable against the
  * paper's own worked examples (PorterSpec).
  *
  * Role here: the `porter_stem` analysis option — OpenSearch's
  * `porter_stem` token filter (the reference hands analysis chains to
  * OpenSearch per index mapping). The engine applies it as a CORPUS
  * transform ([[Analysis.porterStem]]) before indexing plus the same
  * kernel on query terms, so the index machinery and its four-way
  * tokenizer agreement stay untouched — an analyzer is data preparation,
  * not index plumbing.
  *
  * Implementation notes (the paper's definitions, verbatim semantics):
  *  - a *consonant* is a letter other than A E I O U and other than Y
  *    preceded by a consonant; everything else is a vowel;
  *  - `m` is the number of VC sequences in the [C](VC)^m[V] form;
  *  - `*S` = stem ends s; `*v*` = stem contains a vowel; `*d` = stem ends
  *    double consonant; `*o` = stem ends cvc where the final c is not
  *    W, X or Y.
  * Input is assumed already analyzer-normalized ([a-z0-9]+); tokens with
  * digits or length < 3 pass through unchanged (stemming two-letter words
  * is explicitly pointless per the paper).
  */
object Porter {

  def stem(word: String): String = {
    if (word.length < 3 || word.exists(c => c < 'a' || c > 'z')) word
    else step5(step4(step3(step2(step1c(step1b(step1a(word)))))))
  }

  // ----------------------------------------------------- measure helpers

  private def isConsonant(w: String, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => i == 0 || !isConsonant(w, i - 1)
    case _ => true
  }

  /** m(stem): count of VC sequences. */
  private[analyze] def measure(stem: String): Int = {
    var m = 0
    var i = 0
    val n = stem.length
    // skip initial consonants
    while (i < n && isConsonant(stem, i)) i += 1
    while (i < n) {
      // in a vowel run
      while (i < n && !isConsonant(stem, i)) i += 1
      if (i < n) { // consonant follows a vowel: one VC
        m += 1
        while (i < n && isConsonant(stem, i)) i += 1
      }
    }
    m
  }

  private def containsVowel(stem: String): Boolean =
    stem.indices.exists(i => !isConsonant(stem, i))

  private def endsDoubleConsonant(w: String): Boolean =
    w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
      isConsonant(w, w.length - 1)

  /** `*o`: stem ends cvc where the final c is not w, x or y. */
  private def endsCvcNotWxy(w: String): Boolean = {
    val n = w.length
    n >= 3 && isConsonant(w, n - 3) && !isConsonant(w, n - 2) &&
      isConsonant(w, n - 1) &&
      { val c = w.charAt(n - 1); c != 'w' && c != 'x' && c != 'y' }
  }

  /** Replace `suffix` by `repl` when the remaining stem satisfies `cond`;
    * None when the suffix does not fit or the condition fails. */
  private def rule(w: String, suffix: String, repl: String,
      cond: String => Boolean): Option[String] =
    if (w.endsWith(suffix) && w.length > suffix.length) {
      val stem = w.substring(0, w.length - suffix.length)
      if (cond(stem)) Some(stem + repl) else None
    } else None

  // -------------------------------------------------------------- steps

  /** SSES→SS, IES→I, SS→SS, S→ (paper: caresses→caress, ponies→poni,
    * ties→ti, caress→caress, cats→cat). */
  private[analyze] def step1a(w: String): String =
    if (w.endsWith("sses")) w.dropRight(2)
    else if (w.endsWith("ies")) w.dropRight(2)
    else if (w.endsWith("ss")) w
    else if (w.endsWith("s")) w.dropRight(1)
    else w

  /** (m>0) EED→EE; (*v*) ED→, (*v*) ING→ — and on success of the latter
    * two: AT→ATE, BL→BLE, IZ→IZE, (*d and last letter not l, s or z) →
    * single letter,
    * (m=1 and *o) → +E. Paper: feed→feed, agreed→agree, plastered→plaster,
    * bled→bled, motoring→motor, sing→sing; conflat(ed)→conflate,
    * troubl(ed)→trouble, siz(ed)→size, hopp(ing)→hop, tann(ed)→tan,
    * fall(ing)→fall, hiss(ing)→hiss, fizz(ed)→fizz, fail(ing)→fail,
    * fil(ing)→file. */
  private[analyze] def step1b(w: String): String = {
    if (w.endsWith("eed")) {
      val stem = w.dropRight(3)
      if (measure(stem) > 0) w.dropRight(1) else w
    } else {
      val stripped =
        if (w.endsWith("ed") && containsVowel(w.dropRight(2))) Some(w.dropRight(2))
        else if (w.endsWith("ing") && containsVowel(w.dropRight(3))) Some(w.dropRight(3))
        else None
      stripped match {
        case None => w
        case Some(s) =>
          if (s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz")) s + "e"
          else if (endsDoubleConsonant(s) &&
              !Seq('l', 's', 'z').contains(s.last)) s.dropRight(1)
          else if (measure(s) == 1 && endsCvcNotWxy(s)) s + "e"
          else s
      }
    }
  }

  /** (*v*) Y→I (happy→happi, sky→sky). */
  private[analyze] def step1c(w: String): String =
    if (w.endsWith("y") && containsVowel(w.dropRight(1))) w.dropRight(1) + "i"
    else w

  private val Step2Rules = Seq(
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"))

  /** (m>0) long-suffix map, longest listed match only (paper's step 2). */
  private[analyze] def step2(w: String): String =
    Step2Rules.collectFirst {
      case (suf, rep) if w.endsWith(suf) => (suf, rep)
    } match {
      case Some((suf, rep)) =>
        rule(w, suf, rep, s => measure(s) > 0).getOrElse(w)
      case None => w
    }

  private val Step3Rules = Seq(
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""))

  /** (m>0) icate/ative/alize/iciti/ical/ful/ness (triplicate→triplic,
    * formative→form, formalize→formal, electriciti/electrical→electric,
    * hopeful→hope, goodness→good). */
  private[analyze] def step3(w: String): String =
    Step3Rules.collectFirst {
      case (suf, rep) if w.endsWith(suf) => (suf, rep)
    } match {
      case Some((suf, rep)) =>
        rule(w, suf, rep, s => measure(s) > 0).getOrElse(w)
      case None => w
    }

  private val Step4Suffixes = Seq(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")

  /** (m>1) drop the suffix; ION only after S or T (paper's step 4 —
    * revival→reviv, allowance→allow, inference→infer, …,
    * adoption→adopt). Longest listed match only: EMENT before MENT
    * before ENT, so replacement→replac not replacem. */
  private[analyze] def step4(w: String): String = {
    val hit = Step4Suffixes
      .filter(w.endsWith)
      .sortBy(-_.length)
      .headOption
    hit match {
      case Some(suf) =>
        val stem = w.substring(0, w.length - suf.length)
        val condOk = measure(stem) > 1 &&
          (suf != "ion" || (stem.nonEmpty &&
            (stem.last == 's' || stem.last == 't')))
        if (condOk) stem else w
      case None => w
    }
  }

  /** 5a: (m>1) E→, (m=1 and not *o) E→ (probate→probat, rate→rate,
    * cease→ceas); 5b: (m>1 and *d and *L) single letter
    * (controll→control, roll→roll). */
  private[analyze] def step5(w: String): String = {
    val a =
      if (w.endsWith("e")) {
        val stem = w.dropRight(1)
        val m = measure(stem)
        if (m > 1 || (m == 1 && !endsCvcNotWxy(stem))) stem else w
      } else w
    if (a.endsWith("ll") && measure(a.dropRight(1)) > 1) a.dropRight(1) else a
  }
}
