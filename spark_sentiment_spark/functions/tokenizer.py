"""Tweet-aware tokenizer — a Python port of the TweetMotif tokenizer as used
by the reference (SRC/utils/TweetTokenizer.scala:14-122; TweetMotif is
Apache-2.0, O'Connor/Krieger/Ahn 2009-2010).

Protected patterns (URLs, emoticons, hearts/arrows, emails, HTML entities,
times, decimals, comma-numbers, punctuation runs, abbreviations, separators,
decorations, embedded apostrophes, hashtags, @mentions) are kept intact; the
spans between them split on spaces; edge punctuation is detached first.

Java→Python regex dialect deviations (documented; behavior-equivalent):
* variable-width lookbehinds ``(?<=( |^))`` / ``(?<=(\\W|^|$))`` become
  ``(?:^|(?<= ))`` / ``(?:^|(?<=\\W))`` (Python requires fixed-width).
* ``(?iu)`` inline flags dropped where the class contains no letters.

Exposed to Spark as an Arrow pandas UDF — the interacting regex set is not
expressible as Column ops; this is the designated slow path and is only used
in the tweet-parity cleaning pipeline.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def _or(*parts: str) -> str:
    return "(" + "|".join(parts) + ")"


_PUNCT = "['“\".?!,:;]"
_PUNCT_SEQ = _PUNCT + "+"
_ENTITY = "&(amp|lt|gt|quot);"

_URL_START1 = r"(https?://|www\.)"
_COMMON_TLDS = r"(com|co\.uk|org|net|info|ca|ly|mp|edu|gov)"
_URL_START2 = r"[A-Za-z0-9\.-]+?\." + _COMMON_TLDS + r"(?=[/ \W])"
_URL_BODY = r"[^ \t\r\n<>]*?"
_URL_EXTRA_BEFORE_END = "(" + _PUNCT + "|" + _ENTITY + ")+?"
_URL_END = r"(\.\.+|[<>]|\s|$)"
_URL = (r"\b(" + _URL_START1 + "|" + _URL_START2 + ")" + _URL_BODY
        + "(?=(" + _URL_EXTRA_BEFORE_END + ")?" + _URL_END + ")")

_TIME_LIKE = r"\d+:\d+"
_NUM_NUM = r"\d+\.\d+"
_NUM_COMMAS = r"(\d+,)+?\d{3}" + r"(?=([^,]|$))"

_BOUNDARY_NOT_DOT = "($|\\s|[“\"?!,:;]|" + _ENTITY + ")"
_AA1 = r"([A-Za-z]\.){2,}(?=" + _BOUNDARY_NOT_DOT + ")"
_AA2 = r"[^A-Za-z]([A-Za-z]\.){1,}[A-Za-z](?=" + _BOUNDARY_NOT_DOT + ")"
_STD_ABBREV = r"\b([Mm]r|[Mm]rs|[Mm]s|[Dd]r|[Ss]r|[Jj]r|[Rr]ep|[Ss]en|[Ss]t)\."
_ARBITRARY_ABBREV = "(" + _AA1 + "|" + _AA2 + "|" + _STD_ABBREV + ")"

_SEPARATORS = "(--+|―)"
_DECORATIONS = "[♫]+"
_SPLIT_CHARS = r"[^\s\.,]"
_EMBEDDED_APOSTROPHE = _SPLIT_CHARS + "+'" + _SPLIT_CHARS + "+"

_NORMAL_EYES = "[:=]"
_WINK = "[;]"
_NOSE_AREA = "(|o|O|-|[^a-zA-Z0-9 ])"
_HAPPY_MOUTHS = r"[D\)\]]+"
_SAD_MOUTHS = r"[\(\[]+"
_TONGUE = "[pP]"
_OTHER_MOUTHS = r"[doO/\\]+"

_EMOTICON = _or(
    _or(_NORMAL_EYES, _WINK) + _NOSE_AREA
    + _or(_TONGUE, _OTHER_MOUTHS, _SAD_MOUTHS, _HAPPY_MOUTHS),
    "(?:^|(?<= ))" + _or(_SAD_MOUTHS, _HAPPY_MOUTHS, _OTHER_MOUTHS)
    + _NOSE_AREA + _or(_NORMAL_EYES, _WINK),
)


def _allow_entities(pat: str) -> str:
    return pat.replace("<", "(<|&lt;)").replace(">", "(>|&gt;)")


_HEARTS = _allow_entities("(<+/?3+)")
_ARROWS = _allow_entities("(<*[-=]*>+|<+[-=]*>*)")
_HASHTAG = "#[a-zA-Z0-9_]+"
_AT_MENTION = "@[a-zA-Z0-9_]+"
_EMAIL = (r"(?:^|(?<=\W))[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,4}"
          r"(?=(\W|^|$))")

PROTECTED = re.compile(_or(
    _HEARTS, _ARROWS, _EMOTICON, _URL, _EMAIL, _ENTITY, _TIME_LIKE, _NUM_NUM,
    _NUM_COMMAS, _PUNCT_SEQ, _ARBITRARY_ABBREV, _SEPARATORS, _DECORATIONS,
    _EMBEDDED_APOSTROPHE, _HASHTAG, _AT_MENTION,
))

_EDGE_PUNCT = "['\"“”‘’«»{}\\(\\)\\[\\]\\*]"
_NOT_EDGE = "[a-zA-Z0-9]"
_OFF_EDGE = r"(^|$|:|;|\s)"
_EDGE_LEFT = re.compile(_OFF_EDGE + "(" + _EDGE_PUNCT + "+)(" + _NOT_EDGE + ")")
_EDGE_RIGHT = re.compile("(" + _NOT_EDGE + ")(" + _EDGE_PUNCT + "+)" + _OFF_EDGE)

_WS = re.compile(r"\s+")


def _split_edge_punctuation(text: str) -> str:
    s = _EDGE_LEFT.sub(r"\1\2 \3", text)
    s = _EDGE_RIGHT.sub(r"\1 \2\3", s)
    return s


def squeeze_whitespace(text: str) -> str:
    return _WS.sub(" ", text).strip()


def simple_tokenize(text: str) -> list[str]:
    """Interleave space-split spans with protected spans
    (SRC/utils/TweetTokenizer.scala:83-104)."""
    s = _split_edge_punctuation(text)
    spans = [(m.start(), m.end()) for m in PROTECTED.finditer(s)]
    # indices of the unprotected ("good") spans between protected ones
    bounds = [0]
    for a, b in spans:
        bounds.extend((a, b))
    bounds.append(len(s))
    goods = [s[bounds[i]:bounds[i + 1]] for i in range(0, len(bounds), 2)]
    split_goods = [g.strip().split(" ") for g in goods]
    out: list[str] = []
    for i, (a, b) in enumerate(spans):
        out.extend(split_goods[i])
        out.append(s[a:b])
    out.extend(split_goods[-1])
    return [t.strip() for t in out if t.strip()]


def tokenize(text: str) -> list[str]:
    return simple_tokenize(squeeze_whitespace(text))


def normalize_entities(text: str) -> str:
    return (text.replace("&lt;", "<").replace("&gt;", ">")
            .replace("&amp;", "&"))


def tokenize_for_tagger(text: str) -> list[str]:
    return [normalize_entities(t) for t in tokenize(text)]


def tokenize_to_string(text: str) -> str:
    """The reference's UDF contract: text → space-joined tokens
    (SRC/utils/TweetTokenizer.scala:122)."""
    return " ".join(tokenize_for_tagger(text))


def tokenize_to_string_col(col: Column | str) -> Column:
    """Arrow pandas UDF wrapper for DataFrame pipelines."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _tok(series: pd.Series) -> pd.Series:
        return series.map(
            lambda t: tokenize_to_string(t) if t is not None else None
        )

    return _tok(F.col(col) if isinstance(col, str) else col)
