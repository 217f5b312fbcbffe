"""Tweet tokenizer behavior tests (representative tweets; semantics from
SRC/utils/TweetTokenizer.scala)."""

from spark_sentiment_spark.functions.tokenizer import (
    squeeze_whitespace,
    tokenize,
    tokenize_to_string,
)


def test_squeeze_whitespace():
    assert squeeze_whitespace("  a \t b\n c  ") == "a b c"


def test_protects_url():
    toks = tokenize("check http://example.com/x now")
    assert "http://example.com/x" in toks


def test_protects_emoticons():
    toks = tokenize("so happy :) yay")
    assert ":)" in toks
    toks = tokenize("sad day :-( really")
    assert ":-(" in toks


def test_protects_hashtag_and_mention():
    toks = tokenize("hello @user_1 #Topic42 bye")
    assert "@user_1" in toks
    assert "#Topic42" in toks


def test_protects_heart():
    assert "<3" in tokenize("i <3 this")


def test_entities_normalized():
    assert tokenize_to_string("a &amp; b") == "a & b"
    assert "<" in tokenize_to_string("x &lt; y").split(" ")


def test_edge_punctuation_split():
    toks = tokenize('"quoted" word')
    assert "quoted" in toks


def test_time_and_decimal_protected():
    toks = tokenize("at 12:30 pay 3.50 total")
    assert "12:30" in toks
    assert "3.50" in toks


def test_punctuation_sequence_separated():
    toks = tokenize("wow!!! nice")
    assert "!!!" in toks
    assert "wow" in toks


def test_plain_words():
    assert tokenize("just some plain words") == ["just", "some", "plain", "words"]


def test_empty_and_spaces():
    assert tokenize("") == []
    assert tokenize("   ") == []
