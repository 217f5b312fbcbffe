"""Golden tests from the reference's WordListTests.scala:11-29 and
EmojiTests.scala:9-27, plus edit-distance goldens from HelperTests.scala:7-55
(we use Spark's built-in levenshtein at query time; this pins the Python
helper used in driver-side code)."""

import pytest

from spark_sentiment_spark.functions.lexicon import (
    emoji_dict,
    raw_lexicon_dict,
    stemmed_lexicon_dict,
    word_value,
)


def test_wordlist_positive():
    assert word_value("nice") == 1
    assert word_value("happy") == 1


def test_wordlist_negative():
    assert word_value("bad") == -1
    assert word_value("badly") == -1


def test_wordlist_unknown_is_zero():
    assert word_value("qzqzqz") == 0.0


def test_elongated_word_dedup():
    # "noooo" → distinct chars "no" — in the negative list.
    assert word_value("noooo") == -1


def test_lexicon_sizes():
    # 3,491 positive + 7,603 negative entries (reference resources).
    rows = raw_lexicon_dict()
    assert len(rows) > 10_000
    assert len(stemmed_lexicon_dict()) > 5_000


def test_emoji_map():
    d = emoji_dict()
    assert d[":)"] == "happy"
    assert d[":D"] == "happy"
    assert d[":("] == "sad"
    assert d[":-("] == "sad"
    assert len(d) > 900


# --- Levenshtein goldens (HelperTests.scala) --------------------------------

def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


@pytest.mark.parametrize("a,b,d", [
    ("", "", 0), ("a", "", 1), ("", "a", 1), ("abc", "", 3), ("", "abc", 3),
    ("a", "a", 0), ("abc", "abc", 0),
    ("a", "ab", 1), ("b", "ab", 1), ("ac", "abc", 1),
    ("abcdefg", "xabxcdxxefxgx", 6),
    ("ab", "a", 1), ("ab", "b", 1), ("abc", "ac", 1),
    ("xabxcdxxefxgx", "abcdefg", 6),
    ("a", "b", 1), ("ab", "ac", 1), ("ac", "bc", 1), ("abc", "axc", 1),
    ("xabxcdxxefxgx", "1ab2cd34ef5g6", 6),
    ("example", "samples", 3), ("sturgeon", "urgently", 6),
    ("distance", "difference", 5),
    ("noooo", "no", 3), ("great", "gr8t", 2), ("n00b", "noob", 2),
])
def test_levenshtein_golden(a, b, d):
    assert _lev(a, b) == d
