"""Porter stemmer, replicating the reference's exact variant.

The reference (SRC/utils/Stemmer.scala:8-90) implements Porter via a rule DSL.
Its behavior deviates from textbook Porter in ways pinned by its own golden
tests (src/test/.../StemmerTests.scala:10-79):

* Step 1b checks ``(v)ed`` / ``(v)ing`` *before* ``(m>0)eed`` — textbook Porter
  checks ``eed`` first. Hence ``feed`` → ``fe`` and ``agreed`` → ``agr``.
* Rule lists are scanned in order and the first rule whose *suffix matches and
  condition holds* fires; a suffix match with a failing condition falls through
  to later rules (textbook implementations stop at the longest suffix match).
* ``*o`` (ends cvc) excludes w/x/y at the *vowel* position (``word(len-2)``),
  not the final consonant as in textbook Porter.

This is a clean-room Python implementation of those semantics (pure functions,
no DSL), validated against the reference's 50 golden pairs.
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = frozenset("aeiou")


def _is_consonant(word: str, i: int) -> bool:
    if i < 0 or i >= len(word):
        return False
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y" and _is_consonant(word, i - 1):
        return False  # 'y' after a consonant acts as a vowel
    return True


def _is_vowel(word: str, i: int) -> bool:
    return 0 <= i < len(word) and not _is_consonant(word, i)


def _measure(word: str) -> int:
    # Number of vowel→consonant transitions == Porter's m.
    return sum(
        1
        for i in range(len(word))
        if _is_vowel(word, i) and _is_consonant(word, i + 1)
    )


def _contains_vowel(word: str) -> bool:
    return any(_is_vowel(word, i) for i in range(len(word)))


def _ends_cc(word: str) -> bool:
    return (
        len(word) > 1
        and word[-1] == word[-2]
        and _is_consonant(word, len(word) - 1)
    )


def _ends_cvc(word: str) -> bool:
    return (
        len(word) > 2
        and _is_consonant(word, len(word) - 1)
        and _is_vowel(word, len(word) - 2)
        and _is_consonant(word, len(word) - 3)
        and word[-2] not in "wxy"  # reference checks the *vowel* slot
    )


_SINGLE = object()  # sentinel: trim one trailing letter instead of appending


def _apply(word: str, rules) -> str:
    """First rule whose suffix matches AND condition holds on the trimmed stem
    fires; others fall through. ``repl`` is appended to the trimmed stem
    (``_SINGLE`` trims one more character)."""
    for suffix, cond, repl in rules:
        if not word.endswith(suffix):
            continue
        stem = word[: len(word) - len(suffix)] if suffix else word
        if cond is not None and not cond(stem):
            continue
        if repl is _SINGLE:
            return stem[:-1]
        return stem + repl
    return word


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]

_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]

_STEP4_PLAIN = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent",
]
_STEP4_TAIL = ["ou", "ism", "ate", "iti", "ous", "ive", "ize"]


@lru_cache(maxsize=65536)
def stem(word: str) -> str:
    """Stem one word with the reference's Porter variant."""
    w = word.lower()

    # Step 1a — plurals.
    w = _apply(w, [("sses", None, "ss"), ("ies", None, "i"),
                   ("ss", None, "ss"), ("s", None, "")])

    # Step 1b — reference order: (v)ed/(v)ing first, (m>0)eed only otherwise.
    matched_ed = w.endswith("ed") and _contains_vowel(w[:-2])
    matched_ing = w.endswith("ing") and _contains_vowel(w[:-3])
    if matched_ed or matched_ing:
        w = _apply(w, [("ed", _contains_vowel, ""),
                       ("ing", _contains_vowel, "")])
        w = _apply(w, [
            ("at", None, "ate"),
            ("bl", None, "ble"),
            ("iz", None, "ize"),
            ("", lambda s: _ends_cc(s) and s[-1] not in "lsz", _SINGLE),
            ("", lambda s: _measure(s) == 1 and _ends_cvc(s), "e"),
        ])
    else:
        w = _apply(w, [("eed", lambda s: _measure(s) > 0, "ee")])

    # Step 1c — y → i when the stem has a vowel.
    w = _apply(w, [("y", _contains_vowel, "i")])

    # Step 2 (m > 0).
    w = _apply(w, [(sfx, lambda s: _measure(s) > 0, rep) for sfx, rep in _STEP2])

    # Step 3 (m > 0).
    w = _apply(w, [(sfx, lambda s: _measure(s) > 0, rep) for sfx, rep in _STEP3])

    # Step 4 (m > 1); "ion" additionally requires the stem to end in s/t.
    m1 = lambda s: _measure(s) > 1  # noqa: E731
    rules4 = [(sfx, m1, "") for sfx in _STEP4_PLAIN]
    rules4.append(("ion", lambda s: _measure(s) > 1 and s[-1:] in ("s", "t"), ""))
    rules4.extend((sfx, m1, "") for sfx in _STEP4_TAIL)
    w = _apply(w, rules4)

    # Step 5a — drop trailing e.
    w = _apply(w, [
        ("e", lambda s: _measure(s) > 1, ""),
        ("e", lambda s: _measure(s) == 1 and not _ends_cvc(s), ""),
    ])

    # Step 5b — ll → l when m > 1.
    w = _apply(w, [("", lambda s: _measure(s) > 1 and _ends_cc(s)
                    and s.endswith("l"), _SINGLE)])

    return w


def stem_tokens(text: str) -> str:
    """Stem every space-separated token (SRC/utils/Helper.scala:99-101)."""
    return " ".join(stem(t) for t in text.split(" "))
