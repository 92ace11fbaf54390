"""Row-level pair-quality analyzers (M14-M18): punctuation, number,
English-word, special-symbol agreement and sentence-quality class.

Semantics re-implemented (not copied) from
euaa_사례/sentences/metadata_generator.py:

* punctuation profile + compare (:92-112): profile = end-period (if the
  text ends with ``.``) followed by every ``! ? : ; % " ` ~ …`` in order;
  ``match`` iff the two profiles are identical sequences.
* number agreement (:123-271): extract numeric tokens by the 5-pattern
  cascade (thousands-grouped, decimals, ranges, ordinals, bare ints; each
  pattern consumes its matches before the next runs), superscript digits
  (English side); status all/partial/no_match by multiset compare; when
  mismatched, retry after word->number mapping (English month/ordinal/
  multiplier table, Korean 이중/더블).
* English-word agreement (:283-341): latin words in the Korean text must
  appear in the English text with enough multiplicity, with plural
  (ies->y, s->), hyphen-part and roman-numeral credits.
* special symbols (:353-372): NFKC both sides, chars outside the allowed
  class compared as multisets with super/subscript->digit credit.
* quality class (:383-421): invalid_input / empty / all_match /
  partial_match / no_korean_in_kor / valid_candidate.

Stateful-stage pattern: all regexes and word tables compile once per actor
(__init__); __call__ analyzes a pandas batch.  Detail dicts are emitted as
JSON strings (Arrow-friendly; SURVEY.md §1.2).
"""

from __future__ import annotations

import json
import re
import unicodedata
from collections import Counter

import pandas as pd


# --- punctuation (M14) -----------------------------------------------------

_OTHER_PUNCT_RE = re.compile(r"[!?:;%\"`~…]")


def punct_profile(text: str) -> list[str]:
    if not isinstance(text, str) or not text:
        return []
    # endswith, not re "\.$": Python's $ matches before a trailing newline
    # while RE2 (the DuckDB oracle) does not — endswith equals RE2 semantics
    end = ["."] if text.endswith(".") else []
    return end + _OTHER_PUNCT_RE.findall(text)


def compare_punct(kor: str, eng: str) -> dict:
    kp, ep = punct_profile(kor), punct_profile(eng)
    kc, ec = Counter(kp), Counter(ep)
    diffs = {
        p: {"korean": kc.get(p, 0), "english": ec.get(p, 0),
            "diff": kc.get(p, 0) - ec.get(p, 0)}
        for p in set(kp + ep)
        if kc.get(p, 0) != ec.get(p, 0)
    }
    return {
        "punct_match_type": "match" if kp == ep else "no_match",
        "kor_punct": "".join(kp),
        "eng_punct": "".join(ep),
        "punct_differences": json.dumps(diffs, ensure_ascii=False, sort_keys=True),
    }


# --- numbers (M15) ---------------------------------------------------------

class NumberComparer:
    def __init__(self):
        self.patterns = [
            re.compile(r"\d{1,3}(?:,\d{3})+(?:\.\d+)?"),
            re.compile(r"\d+\.\d+"),
            re.compile(r"\d+-\d+"),
            re.compile(r"\b(\d+)(?:st|nd|rd|th)\b", re.IGNORECASE),
            re.compile(r"\d+"),
        ]
        eng = {
            "1": ["one", "first", "primary", "January", "Jan", "single", "uni", "once", "mono"],
            "2": ["two", "second", "secondary", "February", "Feb", "dual", "double", "bi", "twin", "pair", "couple", "twice", "di"],
            "3": ["three", "third", "March", "Mar", "triple", "tri", "trio", "thrice"],
            "4": ["four", "fourth", "April", "Apr", "quad", "tetra", "quartet", "quarter"],
            "5": ["five", "fifth", "May", "penta", "quintet"],
            "6": ["six", "sixth", "June", "Jun", "hexa", "sextet"],
            "7": ["seven", "seventh", "July", "Jul", "septet", "hepta"],
            "8": ["eight", "eighth", "August", "Aug", "octet", "octa"],
            "9": ["nine", "ninth", "September", "Sep", "Sept", "nona"],
            "10": ["ten", "tenth", "October", "Oct", "deca", "decade"],
            "11": ["eleven", "eleventh", "November", "Nov"],
            "12": ["twelve", "twelfth", "December", "Dec", "dozen"],
            "13": ["thirteen", "thirteenth"], "14": ["fourteen", "fourteenth"],
            "15": ["fifteen", "fifteenth"], "16": ["sixteen", "sixteenth"],
            "17": ["seventeen", "seventeenth"], "18": ["eighteen", "eighteenth"],
            "19": ["nineteen", "nineteenth"], "20": ["twenty", "twentieth"],
            "30": ["thirty", "thirtieth"], "40": ["forty", "fortieth"],
            "50": ["fifty", "fiftieth"], "60": ["sixty", "sixtieth"],
            "70": ["seventy", "seventieth"], "80": ["eighty", "eightieth"],
            "90": ["ninety", "ninetieth"], "100": ["hundred"],
            "1000": ["thousand"], "0": ["zero", "oh"],
        }
        self.word_to_num = {w.lower(): n for n, ws in eng.items() for w in ws}
        self.kor_word_to_num = {"이중": "2", "더블": "2"}
        self.kor_pattern = re.compile("|".join(map(re.escape, self.kor_word_to_num)))
        self.superscripts = {"⁰": "0", "¹": "1", "²": "2", "³": "3", "⁴": "4",
                             "⁵": "5", "⁶": "6", "⁷": "7", "⁸": "8", "⁹": "9"}
        self.token_re = re.compile(r"[\w-]+")

    _HAS_DIGIT_RE = re.compile(r"\d")

    def _extract(self, text: str, superscripts: bool) -> list[str]:
        if not isinstance(text, str) or not text:
            return []
        nums: list[str] = []
        if superscripts:
            nums.extend(d for s, d in self.superscripts.items() if s in text)
        # fast path: every cascade pattern requires a digit; one C scan
        # skips five substitution passes on number-free text
        if not self._HAS_DIGIT_RE.search(text):
            return nums
        for pat in self.patterns:
            # group(0) INCLUDING the ordinal suffix ("1st", not "1"): the
            # reference stores the whole match too (metadata_generator.py:148
            # — its ordinal capture group is equally unused), so "1st" vs
            # "1" is a no_match there as well; kept for parity
            text = pat.sub(lambda m: nums.append(m.group(0).replace(",", "")) or " ", text)
        return nums

    def _map_eng_words(self, text: str) -> list[str]:
        found = []
        for token in self.token_re.findall((text or "").lower()):
            if token in self.word_to_num:
                found.append(self.word_to_num[token])
                continue
            parts = token.split("-") if "-" in token else [token]
            for part in parts:
                hit = next(
                    (n for w, n in self.word_to_num.items()
                     if len(w) >= 2 and part.startswith(w)),
                    None,
                )
                if hit is not None:
                    found.append(hit)
                    break
        return found

    def _map_kor_words(self, text: str) -> list[str]:
        if not text:
            return []
        return [self.kor_word_to_num[t] for t in self.kor_pattern.findall(text)]

    @staticmethod
    def _status(kc: Counter, ec: Counter) -> str:
        if not kc and not ec:
            return "no_numbers"
        if kc == ec:
            return "all_match"
        if bool(kc & ec):
            return "partial_match"
        return "no_match"

    def compare(self, kor: str, eng: str) -> dict:
        kn = self._extract(kor, superscripts=False)
        en = self._extract(eng, superscripts=True)
        kc, ec = Counter(kn), Counter(en)
        status = self._status(kc, ec)
        if status not in ("no_numbers", "all_match"):
            if bool(kc) != bool(ec):
                if kc and not ec:
                    en.extend(self._map_eng_words(eng))
                else:
                    kn.extend(self._map_kor_words(kor))
            else:
                kn.extend(self._map_kor_words(kor))
                en.extend(self._map_eng_words(eng))
            kc, ec = Counter(kn), Counter(en)
        diffs = {
            n: {"korean": kc.get(n, 0), "english": ec.get(n, 0),
                "diff": kc.get(n, 0) - ec.get(n, 0)}
            for n in sorted(kc.keys() | ec.keys())
            if kc.get(n, 0) != ec.get(n, 0)
        }
        return {
            "number_match_status": self._status(kc, ec),
            "kor_numbers": ", ".join(sorted(kn)),
            "eng_numbers_after_mapping": ", ".join(sorted(en)),
            "num_differences": json.dumps(diffs, ensure_ascii=False, sort_keys=True),
        }


# --- English words in Korean (M16) -----------------------------------------

_WORD_RE = re.compile(r"[a-zA-Z]+(?:[.-][a-zA-Z]+)*")
_SUFFIX_RE = re.compile(r"\d+([a-zA-Z]+)")
_ROMAN = {"i": "1", "ii": "2", "iii": "3", "iv": "4", "v": "5",
          "vi": "6", "vii": "7", "viii": "8", "ix": "9", "x": "10"}


def compare_english_words(kor: str, eng: str) -> dict:
    kor_words = _WORD_RE.findall(kor or "")
    if not kor_words:
        return {"kor_eng_words": "", "eng_word_match_status": "no_eng_in_kor",
                "eng_word_differences": "{}"}
    kor_counter = Counter(w.lower() for w in kor_words)
    eng_lower = (eng or "").lower()
    eng_counter = Counter(_WORD_RE.findall(eng_lower) + _SUFFIX_RE.findall(eng_lower))
    eng_nums = set(re.findall(r"\d+", eng or ""))
    for word, count in list(eng_counter.items()):
        if word.endswith("ies"):
            eng_counter[word[:-3] + "y"] += count
        elif len(word) > 2 and word.endswith("s"):
            eng_counter[word[:-1]] += count
        if "-" in word:
            for part in word.split("-"):
                if part:
                    eng_counter[part] += count
    missing = {}
    for word, need in kor_counter.items():
        if word in _ROMAN and _ROMAN[word] in eng_nums:
            continue
        have = eng_counter.get(word, 0)
        if need > have:
            missing[word] = need - have
    status = (
        "all_match" if not missing
        else "no_match" if len(missing) == len(kor_counter)
        else "partial_match"
    )
    return {
        "kor_eng_words": ", ".join(sorted(kor_counter.keys())),
        "eng_word_match_status": status,
        "eng_word_differences": json.dumps(missing, ensure_ascii=False, sort_keys=True),
    }


# --- special symbols (M17) -------------------------------------------------

_ALLOWED_RE = re.compile(r"[a-zA-Z0-9_ㄱ-ㅎㅏ-ㅣ가-힣\s.,!?:;'\"`~%()’“”·/&-]")
# complement of _ALLOWED_RE: one search() decides whether any special
# symbol exists at all (the common no-symbol case skips all the Counter
# machinery below)
_DISALLOWED_RE = re.compile(r"[^a-zA-Z0-9_ㄱ-ㅎㅏ-ㅣ가-힣\s.,!?:;'\"`~%()’“”·/&-]")
_NO_SYMBOLS_RESULT = {
    "kor_special_symbols": "", "eng_special_symbols": "",
    "symbol_match_status": "no_special_symbols", "symbol_differences": "{}",
}
_SPECIAL_DIGIT = {"¹": "1", "²": "2", "³": "3", "⁴": "4", "⁵": "5", "⁶": "6",
                  "⁷": "7", "⁸": "8", "⁹": "9", "₁": "1", "₂": "2", "₃": "3",
                  "₄": "4", "₅": "5", "₆": "6", "₇": "7", "₈": "8", "₉": "9"}


def compare_special_symbols(kor: str, eng: str) -> dict:
    kor = unicodedata.normalize("NFKC", kor or "")
    eng = unicodedata.normalize("NFKC", eng or "")
    if not (_DISALLOWED_RE.search(kor) or _DISALLOWED_RE.search(eng)):
        return dict(_NO_SYMBOLS_RESULT)
    k_sym = Counter(_ALLOWED_RE.sub("", kor))
    e_sym = Counter(_ALLOWED_RE.sub("", eng))
    k_num = Counter(re.findall(r"\d", kor))
    e_num = Counter(re.findall(r"\d", eng))
    k_rem, e_rem = k_sym.copy(), e_sym.copy()
    common = k_rem & e_rem
    k_rem -= common
    e_rem -= common
    for sym, count in list(k_rem.items()):
        d = _SPECIAL_DIGIT.get(sym)
        if d and e_num[d] > 0:
            m = min(count, e_num[d])
            k_rem[sym] -= m
            e_num[d] -= m
    for sym, count in list(e_rem.items()):
        d = _SPECIAL_DIGIT.get(sym)
        if d and k_num[d] > 0:
            m = min(count, k_num[d])
            e_rem[sym] -= m
            k_num[d] -= m
    k_rem += Counter()
    e_rem += Counter()
    total_initial = sum(k_sym.values()) + sum(e_sym.values())
    total_rem = sum(k_rem.values()) + sum(e_rem.values())
    status = (
        "no_special_symbols" if total_initial == 0
        else "all_match" if total_rem == 0
        else "partial_match" if total_initial > total_rem
        else "no_match"
    )
    diffs = {
        s: {"korean": k_rem[s], "english": e_rem[s]}
        for s in (k_rem.keys() | e_rem.keys())
        if k_rem[s] > 0 or e_rem[s] > 0
    }
    return {
        "kor_special_symbols": "".join(sorted(k_sym.elements())),
        "eng_special_symbols": "".join(sorted(e_sym.elements())),
        "symbol_match_status": status,
        "symbol_differences": json.dumps(diffs, ensure_ascii=False, sort_keys=True),
    }


# --- quality class (M18) ---------------------------------------------------

_HANGUL_ANY_RE = re.compile(r"[ㄱ-ㆎ가-힣]")


def sentence_quality_class(kor, eng) -> str:
    if not isinstance(kor, str) or not isinstance(eng, str):
        return "invalid_input"
    k, e = kor.lower().strip(), eng.lower().strip()
    if not k and not e:
        return "empty"
    if k == e:
        return "all_match"
    if re.sub(r"\s+", "", k) == re.sub(r"\s+", "", e):
        return "partial_match"
    if not _HANGUL_ANY_RE.search(k):
        return "no_korean_in_kor"
    return "valid_candidate"


# --- batched kernels -------------------------------------------------------
#
# The per-row functions above are the SEMANTIC REFERENCE (used by the
# golden generator and the SQL oracles).  The batched kernels below give
# byte-identical output (asserted by tests/test_analyzers.py A/B) with
# the per-row regex calls collapsed into ONE C pass over the whole batch
# joined by a separator — the same joined-scan + searchsorted trick the
# minhash kernel uses.

import numpy as np


def _collect(pattern: "re.Pattern[str]", texts: list[str], sep: str = " ",
             group: int = 0) -> list[list[str]]:
    """Per-row ordered match lists from ONE finditer over the joined
    batch.  ``sep`` must be un-matchable by (and unable to bridge)
    ``pattern`` — a single char outside every class the pattern uses."""
    per: list[list[str]] = [[] for _ in texts]
    if not texts:
        return per
    joined = sep.join(texts)
    offs = np.empty(len(texts) + 1, dtype=np.int64)
    offs[0] = 0
    np.cumsum(np.fromiter(((len(t) + len(sep)) for t in texts),
                          dtype=np.int64, count=len(texts)), out=offs[1:])
    starts, groups = [], []
    for m in pattern.finditer(joined):
        starts.append(m.start())
        groups.append(m.group(group))
    if starts:
        rows = np.searchsorted(
            offs, np.asarray(starts, dtype=np.int64), side="right") - 1
        for r, g in zip(rows.tolist(), groups):
            per[r].append(g)
    return per


def _collect_dense(pattern: "re.Pattern[str]", texts: list[str], *,
                   marker: str = "zqzrowsepzqz", sep_fmt: str = "{}",
                   group: int = 0) -> list[list[str]]:
    """Per-row match lists for DENSE patterns (many matches per row, e.g.
    word tokenization) without per-match Python objects: join rows with a
    sentinel TOKEN the pattern itself matches, run one C ``findall``, and
    split the flat result at the sentinels.  Falls back to the finditer
    path if the sentinel count is off (natural occurrence in the text or
    a pattern that can't match it)."""
    per: list[list[str]] = [[] for _ in texts]
    if not texts:
        return per
    sep = " " + sep_fmt.format(marker) + " "
    words = pattern.findall(sep.join(texts))
    arr = np.asarray(words, dtype=object) if words \
        else np.empty(0, dtype=object)
    idx = np.flatnonzero(arr == marker)
    if len(idx) != len(texts) - 1:
        return _collect(pattern, texts, sep=" ", group=group)
    bounds = [-1] + idx.tolist() + [len(words)]
    return [words[bounds[k] + 1 : bounds[k + 1]] for k in range(len(texts))]


def _punct_batch(kors: list[str], engs: list[str]) -> list[dict]:
    kh = _collect(_OTHER_PUNCT_RE, kors, sep="\x01")
    eh = _collect(_OTHER_PUNCT_RE, engs, sep="\x01")
    out = []
    for k, e, kp_tail, ep_tail in zip(kors, engs, kh, eh):
        kp = (["."] if k.endswith(".") else []) + kp_tail
        ep = (["."] if e.endswith(".") else []) + ep_tail
        if kp == ep:  # the common agreeing case: no Counter machinery
            out.append({
                "punct_match_type": "match",
                "kor_punct": "".join(kp), "eng_punct": "".join(ep),
                "punct_differences": "{}",
            })
            continue
        kc, ec = Counter(kp), Counter(ep)
        diffs = {
            p: {"korean": kc.get(p, 0), "english": ec.get(p, 0),
                "diff": kc.get(p, 0) - ec.get(p, 0)}
            for p in set(kp + ep)
            if kc.get(p, 0) != ec.get(p, 0)
        }
        out.append({
            "punct_match_type": "no_match",
            "kor_punct": "".join(kp), "eng_punct": "".join(ep),
            "punct_differences": json.dumps(diffs, ensure_ascii=False,
                                            sort_keys=True),
        })
    return out


_NO_ENG_RESULT = {"kor_eng_words": "", "eng_word_match_status": "no_eng_in_kor",
                  "eng_word_differences": "{}"}
_DIGITS_RE = re.compile(r"\d+")


def _english_words_batch(kors: list[str], engs: list[str]) -> list[dict]:
    k_words = _collect_dense(_WORD_RE, kors)
    need = [i for i, ws in enumerate(k_words) if ws]
    out: list[dict] = [dict(_NO_ENG_RESULT) for _ in kors]
    if not need:
        return out
    engs_lower = [engs[i].lower() for i in need]
    e_words = _collect_dense(_WORD_RE, engs_lower)
    # suffix matches are sparse: the finditer path is fine ("0{}" would
    # make the sentinel a \d+(alpha) match, but there's no need)
    e_suffix = _collect(_SUFFIX_RE, engs_lower, group=1)
    for j, i in enumerate(need):
        # findall on the ORIGINAL case then lower per word (pre-lowering
        # the text would shift spans for chars like 'İ' whose lowercase
        # expands to two codepoints)
        kor_counter = Counter(map(str.lower, k_words[i]))
        eng_counter = Counter(e_words[j])
        eng_counter.update(e_suffix[j])
        for word, count in list(eng_counter.items()):
            if word.endswith("ies"):
                eng_counter[word[:-3] + "y"] += count
            elif len(word) > 2 and word.endswith("s"):
                eng_counter[word[:-1]] += count
            if "-" in word:
                for part in word.split("-"):
                    if part:
                        eng_counter[part] += count
        eng_nums = None  # lazy: only roman-numeral credits need it
        missing = {}
        for word, need_n in kor_counter.items():
            if word in _ROMAN:
                if eng_nums is None:
                    eng_nums = set(_DIGITS_RE.findall(engs[i]))
                if _ROMAN[word] in eng_nums:
                    continue
            have = eng_counter.get(word, 0)
            if need_n > have:
                missing[word] = need_n - have
        status = (
            "all_match" if not missing
            else "no_match" if len(missing) == len(kor_counter)
            else "partial_match"
        )
        out[i] = {
            "kor_eng_words": ", ".join(sorted(kor_counter.keys())),
            "eng_word_match_status": status,
            "eng_word_differences": json.dumps(missing, ensure_ascii=False,
                                               sort_keys=True),
        }
    return out


_ASCII_DIGIT_RE = re.compile(r"\d")


def _symbols_batch(kors: list[str], engs: list[str]) -> list[dict]:
    nk = [unicodedata.normalize("NFKC", k) for k in kors]
    ne = [unicodedata.normalize("NFKC", e) for e in engs]
    k_hits = _collect(_DISALLOWED_RE, nk)
    e_hits = _collect(_DISALLOWED_RE, ne)
    out = []
    for k, e, kh, eh in zip(nk, ne, k_hits, e_hits):
        if not kh and not eh:
            out.append(dict(_NO_SYMBOLS_RESULT))
            continue
        # the hit lists ARE the _ALLOWED_RE.sub("", ...) residue
        k_sym, e_sym = Counter(kh), Counter(eh)
        k_rem, e_rem = k_sym.copy(), e_sym.copy()
        common = k_rem & e_rem
        k_rem -= common
        e_rem -= common
        # digit counters only when a super/subscript credit can apply
        needs_digits = any(s in _SPECIAL_DIGIT for s in k_rem) \
            or any(s in _SPECIAL_DIGIT for s in e_rem)
        if needs_digits:
            k_num = Counter(_ASCII_DIGIT_RE.findall(k))
            e_num = Counter(_ASCII_DIGIT_RE.findall(e))
            for sym, count in list(k_rem.items()):
                d = _SPECIAL_DIGIT.get(sym)
                if d and e_num[d] > 0:
                    m = min(count, e_num[d])
                    k_rem[sym] -= m
                    e_num[d] -= m
            for sym, count in list(e_rem.items()):
                d = _SPECIAL_DIGIT.get(sym)
                if d and k_num[d] > 0:
                    m = min(count, k_num[d])
                    e_rem[sym] -= m
                    k_num[d] -= m
        k_rem += Counter()
        e_rem += Counter()
        total_initial = sum(k_sym.values()) + sum(e_sym.values())
        total_rem = sum(k_rem.values()) + sum(e_rem.values())
        status = (
            "no_special_symbols" if total_initial == 0
            else "all_match" if total_rem == 0
            else "partial_match" if total_initial > total_rem
            else "no_match"
        )
        diffs = {
            s: {"korean": k_rem[s], "english": e_rem[s]}
            for s in (k_rem.keys() | e_rem.keys())
            if k_rem[s] > 0 or e_rem[s] > 0
        }
        out.append({
            "kor_special_symbols": "".join(sorted(k_sym.elements())),
            "eng_special_symbols": "".join(sorted(e_sym.elements())),
            "symbol_match_status": status,
            "symbol_differences": json.dumps(diffs, ensure_ascii=False,
                                             sort_keys=True),
        })
    return out


_NO_NUMBERS_RESULT = {
    "number_match_status": "no_numbers", "kor_numbers": "",
    "eng_numbers_after_mapping": "", "num_differences": "{}",
}
_ENG_NUMBERISH_RE = re.compile(r"[\d⁰¹²³⁴⁵⁶⁷⁸⁹]")


def _quality_batch(kors: pd.Series, engs: pd.Series) -> np.ndarray:
    kl = kors.str.lower().str.strip()
    el = engs.str.lower().str.strip()
    empty = (kl == "") & (el == "")
    eq = kl == el
    ws_eq = (kl.str.replace(r"\s+", "", regex=True)
             == el.str.replace(r"\s+", "", regex=True))
    hangul = kl.str.contains(_HANGUL_ANY_RE)
    return np.select(
        [empty.to_numpy(), eq.to_numpy(), ws_eq.to_numpy(),
         ~hangul.to_numpy()],
        ["empty", "all_match", "partial_match", "no_korean_in_kor"],
        default="valid_candidate",
    )


# --- the actor-pool stage --------------------------------------------------

class PairAnalyzer:
    """All five analyzers in one pass; regex/word tables compiled once per
    actor.  Input columns default to the web-pair schema (kr_text/en_text
    normalized).  Output is byte-identical to composing the per-row
    functions (A/B-tested); the hot regex scans run once per batch."""

    def __init__(self, kor_col: str = "kr_text_normalized",
                 eng_col: str = "en_text_normalized"):
        self.kor_col, self.eng_col = kor_col, eng_col
        self.numbers = NumberComparer()

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        kors = batch[self.kor_col].fillna("").astype(str)
        engs = batch[self.eng_col].fillna("").astype(str)
        kl, el = kors.tolist(), engs.tolist()
        punct = _punct_batch(kl, el)
        words = _english_words_batch(kl, el)
        syms = _symbols_batch(kl, el)
        qual = _quality_batch(kors, engs)
        # numbers: batch-level activity scan (ascii digits on the Korean
        # side; digits OR superscripts on the English side), per-row
        # cascade only where active
        k_active = {i for i, hits in enumerate(_collect(_ASCII_DIGIT_RE, kl,
                                                        sep="\x01"))
                    if hits}
        e_active = {i for i, hits in enumerate(_collect(_ENG_NUMBERISH_RE, el,
                                                        sep="\x01"))
                    if hits}
        records = []
        for i in range(len(kl)):
            rec = dict(punct[i])
            if i in k_active or i in e_active:
                rec.update(self.numbers.compare(kl[i], el[i]))
            else:
                rec.update(_NO_NUMBERS_RESULT)
            rec.update(words[i])
            rec.update(syms[i])
            rec["only_eng_korean_sentence"] = qual[i]
            records.append(rec)
        extra = pd.DataFrame(records, index=batch.index)
        return pd.concat([batch, extra], axis=1)
