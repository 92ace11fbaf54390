"""Porter stemmer (Porter 1980, "An algorithm for suffix stripping")
— the classic rule-based English stemmer, frozen here from the
published algorithm (steps 1a through 5b, with the standard m-measure
and *v* / *d / *o conditions).

Why it's in a 100-TB engine: stemming folds the corpus vocabulary
(plurals/derivations collapse to one stem) before TF-IDF/BM25 term
statistics, topic fingerprints and vocabulary-drift reports, typically
shrinking term tables 20-40%.

Scale shape: the stemmer runs over the DISTINCT vocabulary (bounded by
word-form diversity, not corpus size), never over raw token streams —
callers pre-aggregate with a grouped count, then this per-word kernel
is a driver-of-the-bucket triviality.  The per-word Python loop is
deliberate: the input is the vocabulary table, and the kernel is
branch-heavy (vectorizing it would freeze a different, subtly wrong
rule set).

The oracle for the query is a committed staleness-guarded golden from
a plain loop over this frozen kernel (the markdown_docs convention) —
Porter is not expressible in SQL.
"""

from __future__ import annotations


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in "aeiou":
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """The m in [C](VC)^m[V]: number of VC alternations."""
    m = 0
    prev_v = False
    for i in range(len(stem)):
        v = not _is_cons(stem, i)
        if prev_v and not v:
            m += 1
        prev_v = v
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return (len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1))


def _ends_cvc(w: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y."""
    if len(w) < 3:
        return False
    return (_is_cons(w, len(w) - 3) and not _is_cons(w, len(w) - 2)
            and _is_cons(w, len(w) - 1) and w[-1] not in "wxy")


def _replace(w: str, suffix: str, rep: str, min_m: int) -> str | None:
    """If w ends with suffix and measure(stem) > min_m, replace; else
    None (rule did not fire)."""
    if not w.endswith(suffix):
        return None
    stem = w[: len(w) - len(suffix)]
    if _measure(stem) > min_m:
        return stem + rep
    return w  # suffix matched but condition failed: step still consumed


_STEP2 = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
    ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
    ("iviti", "ive"), ("biliti", "ble"),
)

_STEP3 = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
)

_STEP4 = ("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
          "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
          "ous", "ive", "ize")


def porter_stem(word: str) -> str:
    """Stem one lowercase ``[a-z]+`` word by the frozen Porter rules.
    Words of length <= 2 return unchanged (the published convention)."""
    w = word
    if len(w) <= 2:
        return w

    # --- step 1a ---
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # --- step 1b ---
    fire_cleanup = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w = w[:-2]
        fire_cleanup = True
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w = w[:-3]
        fire_cleanup = True
    if fire_cleanup:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w):
            w += "e"

    # --- step 1c ---
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # --- step 2 (m > 0) ---
    for suf, rep in _STEP2:
        if w.endswith(suf):
            got = _replace(w, suf, rep, 0)
            if got is not None:
                w = got
            break

    # --- step 3 (m > 0) ---
    for suf, rep in _STEP3:
        if w.endswith(suf):
            got = _replace(w, suf, rep, 0)
            if got is not None:
                w = got
            break

    # --- step 4 (m > 1; ion additionally requires a *S or *T stem) ---
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if suf == "ion" and not (stem and stem[-1] in "st"):
                break
            if _measure(stem) > 1:
                w = stem
            break

    # --- step 5a ---
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            w = stem

    # --- step 5b ---
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w


def stem_words_batch(words) -> list:
    """Stem a sequence of lowercase words (the vocabulary-table batch
    kernel; see the module docstring for why this is a Python loop)."""
    return [porter_stem(w) for w in words]
