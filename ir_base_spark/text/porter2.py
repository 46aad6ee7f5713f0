"""Pure-Python Porter2 (Snowball English) stemmer.

Implements the public "English (Porter2) stemming algorithm" from
snowballstem.org. The reference engine stems with the generated Snowball
English stemmer (/root/reference/src/org/tartarus/snowball/ext/
englishStemmer.java — generated code, 1329 lines); this is an independent
from-spec implementation of the same public algorithm, NOT a translation
of that file.

The stemmer is deliberately dependency-free (no PyStemmer/snowballstemmer
in this environment) and is shared verbatim between the Spark tokenizer
UDF (ir_base_spark.index.tokenize) and the single-node oracle
(ir_base_spark.oracle), so engine/oracle token identity holds by
construction.

Performance note: inside Arrow-batched UDFs we never call this per token
occurrence — tokens are deduplicated per batch and stemmed once through a
module-level memo cache (see ``stem_cached``), which keeps the pure-Python
cost amortized near zero for Zipf-distributed text.
"""

from __future__ import annotations

VOWELS = frozenset("aeiouy")
DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
LI_ENDINGS = frozenset("cdeghkmnrt")

# Exceptional forms applied after the prelude (word-level overrides).
_EXCEPTIONS1 = {
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "idly": "idl",
    "gently": "gentl",
    "ugly": "ugli",
    "early": "earli",
    "only": "onli",
    "singly": "singl",
    "sky": "sky",
    "news": "news",
    "howe": "howe",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
}

# Words left invariant when found after step 1a.
_EXCEPTIONS2 = frozenset(
    ("inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed")
)

_STEP2_SUFFIXES = (
    # (suffix, replacement); checked longest-first; 'li'/'ogi' special-cased
    ("ization", "ize"),
    ("ational", "ate"),
    ("fulness", "ful"),
    ("ousness", "ous"),
    ("iveness", "ive"),
    ("tional", "tion"),
    ("biliti", "ble"),
    ("lessli", "less"),
    ("entli", "ent"),
    ("ation", "ate"),
    ("alism", "al"),
    ("aliti", "al"),
    ("ousli", "ous"),
    ("iviti", "ive"),
    ("fulli", "ful"),
    ("enci", "ence"),
    ("anci", "ance"),
    ("abli", "able"),
    ("izer", "ize"),
    ("ator", "ate"),
    ("alli", "al"),
    ("bli", "ble"),
    ("ogi", None),   # -> "og" iff preceded by l
    ("li", None),    # -> ""  iff preceded by valid li-ending
)

_STEP3_SUFFIXES = (
    ("ational", "ate"),
    ("tional", "tion"),
    ("alize", "al"),
    ("icate", "ic"),
    ("iciti", "ic"),
    ("ative", None),  # delete iff in R2
    ("ical", "ic"),
    ("ness", ""),
    ("ful", ""),
)

_STEP4_SUFFIXES = (
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "ion",  # special: only if preceded by s/t
    "al", "er", "ic",
)


def _regions(word: str) -> tuple[int, int]:
    """Return (r1, r2) start offsets per the Porter2 definition.

    R1 = region after the first non-vowel following a vowel (or len).
    Special-cased prefixes gener/commun/arsen set R1 to the remainder.
    R2 = same rule applied within R1.
    """
    n = len(word)
    r1 = n
    if word.startswith(("gener", "arsen")):
        r1 = 5
    elif word.startswith("commun"):
        r1 = 6
    else:
        for i in range(1, n):
            if word[i] not in VOWELS and word[i - 1] in VOWELS:
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if word[i] not in VOWELS and word[i - 1] in VOWELS:
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    """True if the word ends in a short syllable.

    A short syllable is (a) vowel + non-vowel other than w/x/Y preceded by
    a non-vowel, or (b) a vowel at position 0 followed by a non-vowel.
    """
    n = len(word)
    if n == 2:
        return word[0] in VOWELS and word[1] not in VOWELS
    if n >= 3:
        a, b, c = word[n - 3], word[n - 2], word[n - 1]
        return (
            a not in VOWELS
            and b in VOWELS and b != "Y"
            and c not in VOWELS and c not in "wxY"
        )
    return False


def _contains_vowel(segment: str) -> bool:
    return any(ch in VOWELS or ch == "y" for ch in segment)


def stem(token: str) -> str:
    """Stem one lowercase token with the Porter2 English algorithm."""
    word = token
    if len(word) <= 2:
        return word

    # Prelude: strip leading apostrophe; mark consonant-y as Y.
    if word.startswith("'"):
        word = word[1:]
        if len(word) <= 2:
            return word
    if word.startswith("y"):
        word = "Y" + word[1:]
    chars = list(word)
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in VOWELS:
            chars[i] = "Y"
    word = "".join(chars)

    low = word.lower()
    if low in _EXCEPTIONS1:
        return _EXCEPTIONS1[low]

    r1, r2 = _regions(word)

    # Step 0: longest of ' / 's / 's'
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # Step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-3] + ("i" if len(word) > 4 else "ie")
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s"):
        # delete if the preceding word part contains a vowel NOT
        # immediately before the s
        if _contains_vowel(word[:-2]):
            word = word[:-1]

    if word.lower() in _EXCEPTIONS2:
        return word.replace("Y", "y")

    # Step 1b
    if word.endswith(("eedly", "eed")):
        suf = "eedly" if word.endswith("eedly") else "eed"
        if len(word) - len(suf) >= r1:
            word = word[: -len(suf)] + "ee"
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem_part = word[: -len(suf)]
                if _contains_vowel(stem_part):
                    word = stem_part
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(DOUBLES):
                        word = word[:-1]
                    elif r1 >= len(word) and _ends_short_syllable(word):
                        # word is short: ends in short syllable and R1 null
                        word += "e"
                break

    # Step 1c: y/Y -> i if preceded by a non-vowel which is not word[0]
    if (
        len(word) > 2
        and word[-1] in "yY"
        and word[-2] not in VOWELS
    ):
        word = word[:-1] + "i"

    # Step 2 (suffix must lie in R1)
    for suf, repl in _STEP2_SUFFIXES:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ogi":
                    if word.endswith("logi"):
                        word = word[:-1]
                elif suf == "li":
                    if len(word) >= 3 and word[-3] in LI_ENDINGS:
                        word = word[:-2]
                else:
                    word = word[: -len(suf)] + repl
            break

    # Step 3 (suffix must lie in R1; 'ative' additionally in R2)
    for suf, repl in _STEP3_SUFFIXES:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ative":
                    if len(word) - len(suf) >= r2:
                        word = word[: -len(suf)]
                else:
                    word = word[: -len(suf)] + repl
            break

    # Step 4 (suffix must lie in R2)
    for suf in _STEP4_SUFFIXES:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                if suf == "ion":
                    if len(word) >= 4 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(suf)]
            break

    # Step 5
    if word.endswith("e"):
        if len(word) - 1 >= r2:
            word = word[:-1]
        elif len(word) - 1 >= r1 and not _ends_short_syllable(word[:-1]):
            word = word[:-1]
    elif word.endswith("ll") and len(word) - 1 >= r2:
        word = word[:-1]

    return word.replace("Y", "y")


_STEM_CACHE: dict[str, str] = {}


def stem_cached(token: str) -> str:
    """Memoized stem — the hot path for Zipf-distributed token streams."""
    s = _STEM_CACHE.get(token)
    if s is None:
        if len(_STEM_CACHE) > 2_000_000:  # bound per-worker memory
            _STEM_CACHE.clear()
        s = stem(token)
        _STEM_CACHE[token] = s
    return s
