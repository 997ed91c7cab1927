"""Pure-Python Porter2 (Snowball English) stemmer.

The reference applies the generated Snowball English stemmer after
stopword removal (SRC/org/tartarus/snowball/ext/englishStemmer.java,
driven by GalagoTokenizer.java:158-178 with a 50k-entry memo cache).
No stemmer package ships in this environment, so this is a from-scratch
implementation of the published Porter2 algorithm
(https://snowballstem.org/algorithms/english/stemmer.html).

Used only inside the fidelity pandas UDF (functions/fidelity.py) — the
oracle-checked expression tokenizer does not stem (DuckDB here has no
stemmer to mirror it).
"""

from __future__ import annotations

from functools import lru_cache

VOWELS = set("aeiouy")
DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
LI_VALID = set("cdeghkmnrt")

_EXCEPTIONS = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}

_EXCEPTIONS_1A = {"inning", "outing", "canning", "herring", "earring",
                  "proceed", "exceed", "succeed"}


def _regions(word: str) -> tuple[int, int]:
    """(r1, r2) start indices. Special prefixes per the spec."""
    r1 = len(word)
    for pre in ("gener", "commun", "arsen"):
        if word.startswith(pre):
            r1 = len(pre)
            break
    else:
        for i in range(1, len(word)):
            if word[i] not in "aeiouy" and word[i - 1] in "aeiouy":
                r1 = i + 1
                break
    r2 = len(word)
    for i in range(r1 + 1, len(word)):
        if word[i] not in "aeiouy" and word[i - 1] in "aeiouy":
            r2 = i + 1
            break
    return r1, r2


def _short_syllable_at_end(word: str) -> bool:
    """word ends in a short syllable: (c)vc with final c not w/x/Y, or a
    word-initial vc."""
    if len(word) >= 3:
        a, b, c = word[-3], word[-2], word[-1]
        if b in "aeiouy" and c not in "aeiouy" and c not in "wxY" and a not in "aeiouy":
            return True
    if len(word) == 2 and word[0] in "aeiouy" and word[1] not in "aeiouy":
        return True
    return False


def _is_short(word: str, r1: int) -> bool:
    return r1 >= len(word) and _short_syllable_at_end(word)


def _contains_vowel(s: str) -> bool:
    return any(ch in "aeiouy" for ch in s)


@lru_cache(maxsize=50_000)  # mirrors the reference's memo cache size
def stem(word: str) -> str:
    if len(word) <= 2:
        return word
    w = word.lower()
    if w in _EXCEPTIONS:
        return _EXCEPTIONS[w]

    if w.startswith("'"):
        w = w[1:]
    # mark consonant-y with Y
    if w.startswith("y"):
        w = "Y" + w[1:]
    w = "".join(
        "Y" if ch == "y" and i > 0 and w[i - 1] in "aeiou" else ch
        for i, ch in enumerate(w)
    )

    r1, r2 = _regions(w)

    # Step 0: trailing apostrophe forms
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        w = w[:-3] + ("i" if len(w) > 4 else "ie")
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s") and _contains_vowel(w[:-2]):
        w = w[:-1]

    if w.replace("Y", "y") in _EXCEPTIONS_1A:
        return w.replace("Y", "y")

    # Step 1b
    if w.endswith(("eedly", "eed")):
        suf = "eedly" if w.endswith("eedly") else "eed"
        if len(w) - len(suf) >= r1:
            w = w[: -len(suf)] + "ee"
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf):
                stem_part = w[: -len(suf)]
                if _contains_vowel(stem_part):
                    w = stem_part
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w.endswith(DOUBLES):
                        w = w[:-1]
                    elif _is_short(w, r1):
                        w += "e"
                break

    # Step 1c
    if (
        len(w) > 2
        and w[-1] in "yY"
        and w[-2] not in "aeiouy"
    ):
        w = w[:-1] + "i"

    # Step 2 (longest suffix, act if in R1)
    step2 = [
        ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
        ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
        ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
        ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
        ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
        ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
        ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
        ("bli", "ble"), ("ogi", "og"), ("li", ""),
    ]
    for suf, rep in step2:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ogi":
                    if len(w) > 3 and w[-4] == "l":
                        w = w[:-3] + rep
                elif suf == "li":
                    if len(w) > 2 and w[-3] in LI_VALID:
                        w = w[:-2]
                else:
                    w = w[: -len(suf)] + rep
            break

    # Step 3 (in R1; 'ative' needs R2)
    step3 = [
        ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
        ("icate", "ic"), ("iciti", "ic"), ("ative", ""),
        ("ical", "ic"), ("ness", ""), ("ful", ""),
    ]
    for suf, rep in step3:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ative":
                    if len(w) - len(suf) >= r2:
                        w = w[: -len(suf)]
                else:
                    w = w[: -len(suf)] + rep
            break

    # Step 4 (in R2)
    step4 = [
        "ement", "ance", "ence", "able", "ible", "ment",
        "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
        "ion", "al", "er", "ic",
    ]
    for suf in step4:
        if w.endswith(suf):
            if len(w) - len(suf) >= r2:
                if suf == "ion":
                    if len(w) > 3 and w[-4] in "st":
                        w = w[:-3]
                else:
                    w = w[: -len(suf)]
            break

    # Step 5
    if w.endswith("e"):
        if len(w) - 1 >= r2 or (
            len(w) - 1 >= r1 and not _short_syllable_at_end(w[:-1])
        ):
            w = w[:-1]
    elif w.endswith("l") and len(w) - 1 >= r2 and len(w) > 1 and w[-2] == "l":
        w = w[:-1]

    return w.replace("Y", "y")
