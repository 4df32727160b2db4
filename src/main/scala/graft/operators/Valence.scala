package graft.operators

/** Default English valence lexicon for the P9 sentiment surface — the
  * TextBlob-grade data the reference leans on
  * (wimbd/sentiment_coocurrence/map_count.py:25 scores with TextBlob's
  * pattern lexicon). Values are ORIGINAL-AUTHORED polarities in [-1, 1]
  * on the TextBlob scale (this is a compact ~230-entry lexicon tuned for
  * web/review text, not a copy of any published lexicon file); boosters
  * are multiplicative intensity modifiers (TextBlob "very" ≈ 1.3-style);
  * negators flip-and-dampen via
  * [[graft.functions.expressions.ValencePolarity.NegationFactor]].
  *
  * Tokens are matched post whitespace-split with terminators stripped, so
  * contractions keep their apostrophe — both spellings are listed.
  */
object Valence {

  val default: Map[String, Double] = Map(
    // strong positive
    "perfect" -> 1.0, "best" -> 1.0, "excellent" -> 0.9, "amazing" -> 0.9,
    "outstanding" -> 0.9, "wonderful" -> 0.9, "fantastic" -> 0.9,
    "superb" -> 0.9, "brilliant" -> 0.9, "awesome" -> 0.9, "flawless" -> 0.9,
    "magnificent" -> 0.9, "incredible" -> 0.9, "marvelous" -> 0.9,
    "exceptional" -> 0.8, "delightful" -> 0.8, "beautiful" -> 0.8,
    "delicious" -> 0.8, "great" -> 0.8,
    // positive
    "good" -> 0.7, "love" -> 0.7, "loved" -> 0.7, "loves" -> 0.7,
    "happy" -> 0.7, "excited" -> 0.7, "exciting" -> 0.7, "success" -> 0.7,
    "successful" -> 0.7, "favorite" -> 0.7, "impressive" -> 0.7,
    "nice" -> 0.6, "glad" -> 0.6, "pleased" -> 0.6, "enjoyable" -> 0.6,
    "enjoy" -> 0.6, "enjoyed" -> 0.6, "friendly" -> 0.6, "fun" -> 0.6,
    "recommend" -> 0.6, "recommended" -> 0.6, "win" -> 0.6, "winner" -> 0.6,
    "satisfied" -> 0.6, "satisfying" -> 0.6, "pleasant" -> 0.6,
    "elegant" -> 0.6, "charming" -> 0.6, "grateful" -> 0.6, "tasty" -> 0.6,
    "helpful" -> 0.5, "reliable" -> 0.5, "smooth" -> 0.5, "better" -> 0.5,
    "effective" -> 0.5, "efficient" -> 0.5, "positive" -> 0.5,
    "thanks" -> 0.5, "thank" -> 0.5, "appreciate" -> 0.5,
    "appreciated" -> 0.5, "valuable" -> 0.5, "polished" -> 0.5,
    "generous" -> 0.5, "honest" -> 0.5, "vibrant" -> 0.5, "cozy" -> 0.5,
    "useful" -> 0.4, "solid" -> 0.4, "clean" -> 0.4, "easy" -> 0.4,
    "improved" -> 0.4, "improvement" -> 0.4, "correct" -> 0.4,
    "robust" -> 0.4, "fresh" -> 0.4, "worth" -> 0.4, "worthy" -> 0.4,
    "strong" -> 0.4, "interesting" -> 0.4, "comfortable" -> 0.4,
    "fine" -> 0.3, "decent" -> 0.3, "clear" -> 0.3, "right" -> 0.3,
    "well" -> 0.3, "works" -> 0.3, "stable" -> 0.3, "secure" -> 0.3,
    "safe" -> 0.3, "fair" -> 0.3, "quality" -> 0.3, "smart" -> 0.3,
    "okay" -> 0.2, "ok" -> 0.2,
    // strong negative
    "worst" -> -1.0, "terrible" -> -0.9, "horrible" -> -0.9,
    "awful" -> -0.9, "atrocious" -> -0.9, "disgusting" -> -0.9,
    "abysmal" -> -0.9, "appalling" -> -0.9, "dreadful" -> -0.8,
    "hate" -> -0.8, "hated" -> -0.8, "hates" -> -0.8, "nightmare" -> -0.8,
    "disaster" -> -0.8, "disastrous" -> -0.8, "catastrophic" -> -0.8,
    "unusable" -> -0.8, "scam" -> -0.8, "fraud" -> -0.8,
    // negative
    "bad" -> -0.7, "useless" -> -0.7, "garbage" -> -0.7,
    "poor" -> -0.6, "unhappy" -> -0.6, "angry" -> -0.6, "ugly" -> -0.6,
    "frustrating" -> -0.6, "frustrated" -> -0.6, "disappointed" -> -0.6,
    "disappointing" -> -0.6, "buggy" -> -0.6, "broken" -> -0.6,
    "fail" -> -0.6, "failed" -> -0.6, "fails" -> -0.6, "failure" -> -0.6,
    "crash" -> -0.6, "crashed" -> -0.6, "crashes" -> -0.6, "waste" -> -0.6,
    "wasted" -> -0.6, "regret" -> -0.6, "rude" -> -0.6, "lying" -> -0.6,
    "trash" -> -0.6, "fatal" -> -0.6,
    "sad" -> -0.5, "annoyed" -> -0.5, "annoying" -> -0.5, "wrong" -> -0.5,
    "confusing" -> -0.5, "overpriced" -> -0.5, "lie" -> -0.5,
    "lies" -> -0.5, "unfair" -> -0.5, "unreliable" -> -0.5,
    "dangerous" -> -0.5, "painful" -> -0.5, "worse" -> -0.5, "dying" -> -0.5,
    "mediocre" -> -0.4, "boring" -> -0.4, "error" -> -0.4, "errors" -> -0.4,
    "problem" -> -0.4, "problems" -> -0.4, "confused" -> -0.4,
    "messy" -> -0.4, "dirty" -> -0.4, "pain" -> -0.4, "hurt" -> -0.4,
    "difficult" -> -0.4, "unstable" -> -0.4, "insecure" -> -0.4,
    "harsh" -> -0.4, "severe" -> -0.4, "dead" -> -0.4, "lost" -> -0.4,
    "lose" -> -0.4, "losing" -> -0.4, "loss" -> -0.4, "lacking" -> -0.4,
    "dull" -> -0.3, "bug" -> -0.3, "bugs" -> -0.3, "issue" -> -0.3,
    "issues" -> -0.3, "hard" -> -0.3, "cheap" -> -0.3, "expensive" -> -0.3,
    "risky" -> -0.3, "weak" -> -0.3, "missing" -> -0.3, "noisy" -> -0.3,
    "stale" -> -0.3, "bland" -> -0.3, "critical" -> -0.3,
    "limited" -> -0.2, "cold" -> -0.2)

  /** Intensity multipliers: >1 amplifies, <1 dampens ("barely good"). */
  val boosters: Map[String, Double] = Map(
    "extremely" -> 1.6, "insanely" -> 1.6, "incredibly" -> 1.5,
    "absolutely" -> 1.5, "utterly" -> 1.5, "exceptionally" -> 1.5,
    "completely" -> 1.4, "totally" -> 1.4, "remarkably" -> 1.4,
    "super" -> 1.4, "very" -> 1.3, "truly" -> 1.3, "highly" -> 1.3,
    "deeply" -> 1.3, "really" -> 1.25, "especially" -> 1.25, "so" -> 1.2,
    "particularly" -> 1.2, "rather" -> 1.1, "quite" -> 1.1, "pretty" -> 1.1,
    "fairly" -> 0.9, "moderately" -> 0.9, "relatively" -> 0.9,
    "somewhat" -> 0.8, "mildly" -> 0.8, "slightly" -> 0.7,
    "marginally" -> 0.7, "barely" -> 0.6, "hardly" -> 0.6)

  /** Negation tokens (both contraction spellings survive tokenization). */
  val negators: Seq[String] = Seq(
    "not", "no", "never", "none", "nobody", "nothing", "neither", "nor",
    "cannot", "cant", "can't", "dont", "don't", "doesnt", "doesn't",
    "didnt", "didn't", "isnt", "isn't", "wasnt", "wasn't", "arent",
    "aren't", "werent", "weren't", "wont", "won't", "wouldnt", "wouldn't",
    "couldnt", "couldn't", "shouldnt", "shouldn't", "aint", "ain't",
    "without", "lack", "lacks", "lacked")
}
