"""Markup rewrite pipeline: doctests + Spark-vs-local parity + ordering."""

from __future__ import annotations

import doctest

import pytest

from jimmy_spark.functions import markup


def test_doctests():
    results = doctest.testmod(markup)
    assert results.failed == 0 and results.attempted >= 6


CASES = [
    ("====== Big ======\nbody", "# Big\nbody"),
    ("[ ] a\n[*] b", "- [ ] a\n- [x] b"),
    ("//em// and ''//code//''", "*em* and `//code//`"),
    ("[[target|label]] x [[bare]]", "[label](target) x [bare](bare)"),
    ("{{shot.png}}", "![](shot.png)"),
    ("plain text stays", "plain text stays"),
]


@pytest.mark.parametrize("src,expected", CASES)
def test_cases(src, expected):
    assert markup.wiki_to_md(src) == expected


def test_spark_udf_matches_local(spark):
    df = spark.createDataFrame([(i, s) for i, (s, _) in enumerate(CASES)], "i int, t string")
    got = {
        r.i: r.md
        for r in df.select("i", markup.wiki_to_md_udf()(df.t).alias("md")).collect()
    }
    for i, (src, expected) in enumerate(CASES):
        assert got[i] == expected == markup.wiki_to_md(src)


def test_rule_order_matters():
    """Verbatim shielding must win over italic (the ordered-pipeline
    property the reference encodes in md_lib/convert.py:80-95)."""
    s = "''//x//''"
    assert markup.wiki_to_md(s) == "`//x//`"


TIDDLY_CASES = [
    ("!!! Deep", "### Deep"),
    ("# a\n## b\n* c\n** d", "1. a\n  1. b\n- c\n  - d"),
    ("''b'' //i// __u__", "**b** *i* <u>u</u>"),
    ("[[Label|tgt]] [[Bare]]", "[Label](tgt) [Bare](Bare)"),
    ("|h1|h2|h\n|x|y|\n|z|w|", "| h1 | h2 |\n| --- | --- |\n| x | y |\n| z | w |"),
    ("|first|row|\n|x|y|", "| first | row |\n| --- | --- |\n| x | y |"),
    ("keep {{{''raw''}}} safe", "keep `''raw''` safe"),
]


@pytest.mark.parametrize("src,expected", TIDDLY_CASES)
def test_tiddly_cases(src, expected):
    assert markup.tiddly_to_md(src) == expected


def test_tiddly_spark_udf_matches_local(spark):
    df = spark.createDataFrame(
        [(i, s) for i, (s, _) in enumerate(TIDDLY_CASES)], "i int, t string"
    )
    got = {
        r.i: r.md
        for r in df.select("i", markup.tiddly_to_md_udf()(df.t).alias("md")).collect()
    }
    for i, (src, expected) in enumerate(TIDDLY_CASES):
        assert got[i] == expected == markup.tiddly_to_md(src)


def test_tiddly_code_shield_beats_table():
    assert markup.tiddly_to_md("{{{|a|b|}}}") == "`|a|b|`"
