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


ROAM_CASES = [
    ("- {{[[TODO]]}} task", "- [ ] task"),
    ("- {{[[DONE]]}} task", "- [x] task"),
    ("{{[[embed]]: ((b1))}}", "![[b1]]"),
    ("{{[[query]]: {and: [[p]]}}}", "`query: {and: [[p]]}`"),
    ("ref ((b2)) ^^hi^^", "ref [[b2]] ==hi=="),
    ("Status:: open", "**Status**: open"),
]

BB_CASES = [
    ("[h3]T[/h3]", "### T"),
    ("[list]\n[*] a\n[*] b\n[/list]", "- a\n- b\n"),
    ("[b]x[/b] [i]y[/i] [s]z[/s] [u]w[/u]", "**x** *y* ~~z~~ <u>w</u>"),
    ("[url=http://a]L[/url] [url]http://b[/url]", "[L](http://a) <http://b>"),
    ("[img]p.png[/img] [code]c[/code] [q]quote[/q]", "![](p.png) `c` > quote"),
]


@pytest.mark.parametrize("src,expected", ROAM_CASES)
def test_roam_cases(src, expected):
    assert markup.roam_to_md(src) == expected


@pytest.mark.parametrize("src,expected", BB_CASES)
def test_bbcode_cases(src, expected):
    assert markup.bbcode_to_md(src) == expected


HTML_CASES = [
    ("<h3>T</h3>", "### T"),
    ("<p><b>a</b><br/><em>b</em></p>", "**a**\n*b*"),
    ('<a href="u">t</a> <img src="p.png" alt="alt"/>', "[t](u) ![alt](p.png)"),
    ("<ul><li>one</li><li>two</li></ul>", "- one\n- two"),
    ("<table><tr><th>h1</th><th>h2</th></tr><tr><td>a</td><td>b</td></tr></table>",
     "| h1 | h2 |\n| a | b |"),
    ("x &lt;tag&gt; &amp; y", "x <tag> & y"),
    ("<pre><code>keep <b>raw</b></code></pre>", "```\nkeep <b>raw</b>\n```"),
    ("<!-- hidden --><span>kept</span>", "kept"),
]


@pytest.mark.parametrize("src,expected", HTML_CASES)
def test_html_cases(src, expected):
    assert markup.html_to_md(src) == expected


ENML_CASES = [
    ("<en-note><h3>T</h3></en-note>", "### T"),
    ("<en-note><div><b>a</b> <i>b</i> <code>c</code></div></en-note>",
     "**a** *b* `c`"),
    ('<en-note><en-todo checked="true"/>x<en-todo/>y</en-note>',
     "- [x] x\n- [ ] y"),
    ("<en-note><ul><li>a</li><li>b</li><ol><li>c</li></ol></ul></en-note>",
     "- a\n- b\n  1. c"),
    ('<en-note><a href="u">lbl</a> <en-media hash="h1" type="image/png"/></en-note>',
     "[lbl](u) ![](h1)"),
    ("<en-note><table><tr><th>k</th><th>v</th></tr><tr><td>a</td><td>1</td></tr></table></en-note>",
     "| k | v |\n| --- | --- |\n| a | 1 |"),
    ("<en-note>plain &amp; entities &lt;ok&gt;</en-note>",
     "plain & entities <ok>"),
    # empty cells survive; pretty-printing whitespace mints no columns
    ("<en-note><table><tr><td></td><td>b</td></tr></table></en-note>",
     "|  | b |\n| --- | --- |"),
    ("<en-note><table>\n  <tr>\n    <td>a</td>\n    <td>b</td>\n  </tr>\n</table></en-note>",
     "| a | b |\n| --- | --- |"),
    # <br> inside a cell becomes a space; block ends stay inside the cell
    ("<en-note><table><tr><td>a<br/>b</td><td>c</td></tr></table></en-note>",
     "| a b | c |\n| --- | --- |"),
]


@pytest.mark.parametrize("src,expected", ENML_CASES)
def test_enml_cases(src, expected):
    assert markup.enml_to_md(src) == expected


def test_colornote_and_cherrytree(spark):
    cn = "[V] done task\n[ ] open task\nplain line"
    assert markup.colornote_to_md(cn) == "- [x] done task\n- [ ] open task\nplain line"
    ct = "• a\n◦ b\n▪ c\nplain"
    assert markup.cherrytree_to_md(ct) == "- a\n  - b\n    - c\nplain"
    df = spark.createDataFrame([(cn, ct)], "cn string, ct string")
    row = df.select(
        markup.colornote_to_md_udf()(df.cn).alias("cn"),
        markup.cherrytree_to_md_udf()(df.ct).alias("ct"),
    ).first()
    assert row.cn == markup.colornote_to_md(cn)
    assert row.ct == markup.cherrytree_to_md(ct)


def test_enml_udf_matches_local(spark):
    df = spark.createDataFrame(
        [(i, s) for i, (s, _) in enumerate(ENML_CASES)], "i int, t string"
    )
    got = {
        r.i: r.md
        for r in df.select("i", markup.enml_to_md_udf()(df.t).alias("md")).collect()
    }
    for i, (src, expected) in enumerate(ENML_CASES):
        assert got[i] == expected == markup.enml_to_md(src)


def test_roam_bbcode_udfs_match_local(spark):
    cases = [(i, s) for i, (s, _) in enumerate(ROAM_CASES)]
    df = spark.createDataFrame(cases, "i int, t string")
    got = {
        r.i: r.md
        for r in df.select("i", markup.roam_to_md_udf()(df.t).alias("md")).collect()
    }
    for i, (src, expected) in enumerate(ROAM_CASES):
        assert got[i] == expected == markup.roam_to_md(src)
    cases = [(i, s) for i, (s, _) in enumerate(BB_CASES)]
    df = spark.createDataFrame(cases, "i int, t string")
    got = {
        r.i: r.md
        for r in df.select("i", markup.bbcode_to_md_udf()(df.t).alias("md")).collect()
    }
    for i, (src, expected) in enumerate(BB_CASES):
        assert got[i] == expected == markup.bbcode_to_md(src)
