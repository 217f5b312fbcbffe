"""Golden-pair tests for the Porter variant, ported from the reference's
StemmerTests.scala:10-79 (50 word→stem pairs)."""

import pytest

from spark_sentiment_spark.functions.stemmer import stem, stem_tokens

PLURALS = {
    "caresses": "caress", "caress": "caress", "tonies": "toni",
    "pies": "pi", "dogs": "dog",
}

PARTICIPLES = {
    "feed": "fe", "agreed": "agr", "plastered": "plaster", "bled": "bled",
    "motoring": "motor", "hissing": "hiss", "fizzed": "fizz",
    "failing": "fail", "filing": "file", "happy": "happi", "sky": "sky",
}

SUFFIXES = {
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic", "differentli": "differ",
    "vileli": "vile", "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "hopeful": "hope",
    "goodness": "good", "revival": "reviv", "allowance": "allow",
    "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust", "dependent": "depend",
    "adoption": "adopt", "homologou": "homolog", "communism": "commun",
    "activate": "activ", "angulariti": "angular", "homologous": "homolog",
    "effective": "effect", "roll": "roll",
}

ALL = {**PLURALS, **PARTICIPLES, **SUFFIXES}


@pytest.mark.parametrize("word,expected", sorted(ALL.items()))
def test_golden_stem(word, expected):
    assert stem(word) == expected


def test_stem_tokens():
    assert stem_tokens("caresses dogs motoring") == "caress dog motor"


def test_empty_and_short():
    assert stem("") == ""
    assert stem("a") == "a"
    assert stem("be") == "be"
