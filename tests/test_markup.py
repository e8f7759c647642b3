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
    ("{{shot.png}}", "![shot.png](shot.png)"),
    ("plain text stays", "plain text stays"),
]

# Independent anchors: input/output pairs taken VERBATIM from the
# reference's published doctests (/root/reference/src/jimmy/md_lib/
# zim.py:21-51), so the grammar is checked against the reference's
# documented semantics, not against its own golden twin.
ZIM_REF_CASES = [
    ("''monospace'' **bold**", "`monospace` **bold**"),
    ("super^{script}, sub_{script}", "super^script^, sub~script~"),
    ("====== heading 1 ======", "# heading 1"),
    ("== heading5 ==", "##### heading5"),
    ("**__highlighted and bold__**", "**==highlighted and bold==**"),
    ("'''\nsome code\nblock\n'''", "```\nsome code\nblock\n```"),
    ("[ ] unchecked\n[x] not done", "- [ ] unchecked\n- [x] not done"),
    (
        "[ ] u\n    [>] np\n    [*] nd\n[x] nd",
        "- [ ] u\n    - [ ] np\n    - [x] nd\n- [x] nd",
    ),
    (
        "* lvl1\n\t* lvl2\n\t* lvl2\n* lvl1",
        "* lvl1\n    * lvl2\n    * lvl2\n* lvl1",
    ),
    ("{{./image.png}}", "![image.png](image.png)"),
    ("{{./image.png?width=600}}", "![image.png](image.png)"),
    ("[[#heading3|heading3]]", "[heading3](#heading3)"),
    (
        "[[https://www.bvb.de/|TITLE ''monospace'']]",
        "[TITLE `monospace`](https://www.bvb.de/)",
    ),
    ("[[./0.mp3]]", "[./0.mp3](0.mp3)"),
]


@pytest.mark.parametrize("src,expected", ZIM_REF_CASES)
def test_zim_reference_doctest_anchors(src, expected):
    assert markup.wiki_to_md(src) == expected


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
    ("# a\n## b\n* c\n** d", "1. a\n    1. b\n* c\n    * d"),
    ("''b'' //i// __u__", "**b** *i* ++u++"),
    (
        "[[Label|tgt]] [[Bare]]",
        "[Label](tiddlywiki://tgt) [Bare](tiddlywiki://Bare)",
    ),
    ("|h1|h2|h\n|x|y|\n|z|w|", "| h1 | h2 |\n| --- | --- |\n| x | y |\n| z | w |"),
    ("|first|row|\n|x|y|", "| first | row |\n| --- | --- |\n| x | y |"),
    ("keep {{{''raw''}}} safe", "keep `''raw''` safe"),
]

# Anchors verbatim from the reference's published doctests
# (/root/reference/src/jimmy/md_lib/tiddlywiki.py:210-294).
TIDDLY_REF_CASES = [
    (
        "Double single quotes are used for ''bold'' text",
        "Double single quotes are used for **bold** text",
    ),
    ("!! //italic heading//", "## *italic heading*"),
    (
        "''only bold text followed by: //bold and italic text//''",
        "**only bold text followed by: *bold and italic text***",
    ),
    ("//italic text://", "*italic text:*"),
    (
        "from http://127.0.0.1/MyApp to default http://127.0.0.1/.",
        "from http://127.0.0.1/MyApp to default http://127.0.0.1/.",
    ),
    (
        "! level 1 heading!\n!!!!!! level 6! heading",
        "# level 1 heading!\n###### level 6! heading",
    ),
    (
        "<<<\nThis is a block quoted paragraph\nwritten in English\n<<<",
        "\n> This is a block quoted paragraph\n> written in English",
    ),
    (
        "<<<\nComputers are like a bicycle for our minds\n<<< S. Jobs",
        "\n> Computers are like a bicycle for our minds\n> *S. Jobs*",
    ),
    (
        "> Quoted text\n> Another line of quoted text",
        "> Quoted text\n> Another line of quoted text",
    ),
    (
        "* -- n-dash\n* --- m-dash --- example\n----",
        "* – n-dash\n* — m-dash — example\n---",
    ),
    ("----\n---", "---\n---"),
    ("[img[Motovun Jack.jpg]]", "![Motovun Jack.jpg](Motovun Jack.jpg)"),
    (
        "[img[https://tiddlywiki.com/favicon.ico]]",
        "![https://tiddlywiki.com/favicon.ico](https://tiddlywiki.com/favicon.ico)",
    ),
    (
        "[img[An explanatory tooltip|Motovun Jack.jpg]]",
        "![An explanatory tooltip](Motovun Jack.jpg)",
    ),
    ("abc [img[a|b.jpg]] def", "abc ![a](b.jpg) def"),
    (
        "[img width=32 class='tc-image' [Motovun Jack.jpg]]",
        "![Motovun Jack.jpg](Motovun Jack.jpg)",
    ),
    (
        "link to [[Tiddler Title]]",
        "link to [Tiddler Title](tiddlywiki://Tiddler Title)",
    ),
    (
        "[[Displayed Link Title|Tiddler Title]]",
        "[Displayed Link Title](tiddlywiki://Tiddler Title)",
    ),
    ("abc [[TW5|https://tiddlywiki.com/]]", "abc [TW5](https://tiddlywiki.com/)"),
    ("[[Mail me|mailto:me@where.net]] def", "[Mail me](mailto:me@where.net) def"),
    (
        "[[mailto:me@where.net]] def",
        "[mailto:me@where.net](mailto:me@where.net) def",
    ),
    (
        "[[Open file|file:///c:/users/me/index.html]]",
        "[Open file](file:///c:/users/me/index.html)",
    ),
    ("[ext[Open file|index.html]]", "[Open file](index.html)"),
    ("abc [ext[Open file|./index.html]]", "abc [Open file](./index.html)"),
    ("[ext[Open file|../README.md]] def", "[Open file](../README.md) def"),
    (
        "[ext[Open file|../README Space.md]] def",
        "[Open file](<../README Space.md>) def",
    ),
    (
        "[ext[Open file|c:\\users\\me\\index.html]]",
        "[Open file](<c:\\users\\me\\index.html>)",
    ),
    ("[ext[https://www.bvb.de/]]", "[https://www.bvb.de/](https://www.bvb.de/)"),
    (
        "text1 [[title 1|link 1]] text2 [[link2]] text3",
        "text1 [title 1](tiddlywiki://link 1) text2 "
        "[link2](tiddlywiki://link2) text3",
    ),
    (
        "`[]`, [[Links|Links]], [[Filters|Filters]]",
        "`[]`, [Links](tiddlywiki://Links), [Filters](tiddlywiki://Filters)",
    ),
    (
        "* First item\n* Second item\n** Subitem\n* Third list item",
        "* First item\n* Second item\n    * Subitem\n* Third list item",
    ),
    (
        "# Step 1\n# Step 2\n## Step2.1\n# Step 3",
        "1. Step 1\n1. Step 2\n    1. Step2.1\n1. Step 3",
    ),
    (
        "* Do today\n*# Eat\n* To do\n*# This\n*# That\n*## Other",
        "* Do today\n    1. Eat\n* To do\n    1. This\n    1. That\n        1. Other",
    ),
    (
        "* One\n** Two\n**> A quote\n**> Another quote\n* List Three",
        "* One\n    * Two\n        > A quote\n        > Another quote\n* List Three",
    ),
    (
        "|!Cell1 |!Cell2 |\n|Cell3 |Cell4 |\n",
        "| Cell1 | Cell2 |\n| --- | --- |\n| Cell3 | Cell4 |\n",
    ),
    (
        "- ''modifier''\n- __underlined__",
        "- **modifier**\n- ++underlined++",
    ),
    ("|C1 |''modifier''|\n", "| C1 | **modifier** |\n| --- | --- |\n"),
]


@pytest.mark.parametrize("src,expected", TIDDLY_REF_CASES)
def test_tiddly_reference_doctest_anchors(src, expected):
    assert markup.tiddly_to_md(src) == expected


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
     "| h1 | h2 |\n| --- | --- |\n| a | b |"),
    # streamline_tables semantics (html_filter.py:568): wrappers unwrapped,
    # headings demoted to bold, cell line breaks -> spaces
    ("<table><tr><td><div><h3>K</h3></div></td><td>v</td></tr>"
     "<tr><td>a<br/>b</td><td><span>c</span></td></tr></table>",
     "| **K** | v |\n| --- | --- |\n| a b | c |"),
    # div_checklists semantics (html_filter.py:48)
    ('<div class="checklist"><div class="checked">done it</div>'
     '<div class="unchecked">todo it</div></div>',
     "- [x] done it\n- [ ] todo it"),
    # merge_consecutive_formatting semantics (html_filter.py:142)
    ("<b>split</b><b> bold</b> and <i>it</i><i>al</i>",
     "**split bold** and *ital*"),
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


def _enc0_blob(plain: bytes, password: bytes, iters: int = 1000) -> bytes:
    """Build an ENC0 blob with the from-scratch encryptor (datagen/aes.py)
    — the decrypt side in the ENML handler is the independent inverse."""
    import hashlib
    import hmac as hm

    from jimmy_spark.datagen.aes import aes128_cbc_encrypt

    salt, h_salt, iv = b"s" * 16, b"h" * 16, b"i" * 16
    key = hashlib.pbkdf2_hmac("sha256", password, salt, iters, 16)
    ct = aes128_cbc_encrypt(key, iv, plain)
    msg = b"ENC0" + salt + h_salt + iv + ct
    h_key = hashlib.pbkdf2_hmac("sha256", password, h_salt, iters, 16)
    return msg + hm.new(h_key, msg, hashlib.sha256).digest()


def test_enml_en_crypt_recursive_reparse():
    """<en-crypt> blocks decrypt and re-parse recursively (the reference's
    md_lib/evernote.py:441-474 shape); no/wrong password degrades to a
    deterministic placeholder, never garbage."""
    import base64

    pw = b"hunter2"
    blob = _enc0_blob(b"<b>secret</b> plan", pw)
    src = (
        "<en-note>before <en-crypt cipher=\"AES\" length=\"128\">"
        + base64.b64encode(blob).decode()
        + "</en-crypt> after</en-note>"
    )
    assert markup.enml_to_md(src, password=pw) == "before **secret** plan after"
    assert markup.enml_to_md(src) == "before [encrypted] after"
    assert markup.enml_to_md(src, password=b"wrong") == "before [encrypted] after"
    # malformed payload is error-isolated too
    bad = "<en-note><en-crypt>!!notbase64!!</en-crypt></en-note>"
    assert markup.enml_to_md(bad, password=pw) == "[encrypted]"
    # a self-closing <en-crypt/> must not swallow the rest of the note
    assert (
        markup.enml_to_md("<en-note>a <en-crypt/> b</en-note>", password=pw)
        == "a [encrypted] b"
    )


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


# ---------------------------------------------------------------------------
# App-specific HTML passes (round-4): behaviors anchored on the reference's
# documented filters (html_filter.py:101 link_internal_headings, :197
# merge_single_element_lists, :231-383 nimbus, :386-397 notion, :490-562
# synology, :749-787 upnote — the upnote case is the reference's verbatim
# doctest input).


@pytest.mark.parametrize(
    ("html", "md"),
    [
        # upnote checklist — reference doctest input (html_filter.py:774-777)
        ('<ul><li data-checked="false"><div>Budget?</div></li></ul>',
         "- [ ] Budget?"),
        ('<ul><li data-checked="true"><span>Done it</span></li></ul>',
         "- [x] Done it"),
        # notion to-do list (html_filter.py:386-397)
        ('<ul class="to-do-list">'
         '<li><div class="checkbox checkbox-on"></div>Plan</li>'
         '<li><div class="checkbox checkbox-off"></div>Ship</li></ul>',
         "- [x] Plan\n- [ ] Ship"),
        # nimbus spreadsheet chrome stripped: tfoot, letter row, first two
        # columns (html_filter.py:347-376)
        ("<table><tr><td></td><td></td><td>A</td><td>B</td></tr>"
         "<tr><td>1</td><td></td><td>x</td><td>y</td></tr>"
         "<tr><td>2</td><td></td><td>u</td><td>v</td></tr>"
         "<tfoot><tr><td>sum</td></tr></tfoot></table>",
         "| x | y |\n| --- | --- |\n| u | v |"),
        # old-editor table: sanity check fails -> untouched streamlining
        ("<table><tr><td>id</td><td>src</td></tr></table>",
         "| id | src |\n| --- | --- |"),
        # nimbus flat list: type + indent in the class attr
        # (html_filter.py:268-345)
        ('<ul><li class="list-item-bullet indent-0">a</li>'
         '<li class="list-item-number indent-1">b</li>'
         '<li class="list-item-checkbox indent-1" data-checked="true">c</li>'
         "</ul>",
         "- a\n    1. b\n    - [x] c"),
        # nimbus highlight + note mention (html_filter.py:231-266)
        ('<span class="nn-marker">hot</span> '
         '<span class="mention-link" data-mention-type="note" '
         'data-mention-name="My Note">My Note</span>',
         "==hot== [My Note](nimbusnote://My%20Note)"),
        ('<div data-highlight="transparent">no</div>', "no"),
        # single-item lists merge into the previous same-kind list
        # (html_filter.py:197-210)
        ("<ul><li>a</li></ul><ul><li>b</li></ul><ul><li>c</li></ul>",
         "- a\n- b\n- c"),
        # internal link ids rewritten to markdown header ids
        # (html_filter.py:101-120)
        ('<h2 id="x1">My Heading</h2><a href="#x1">jump</a>',
         "## My Heading\n[jump](#my-heading)"),
        # non-heading target: href untouched, heading attrs stripped anyway
        ('<h2 id="h">T</h2><a href="#nope">jump</a>',
         "## T\n[jump](#nope)"),
        # synology checklist divs: padding-left -> level, -checked class ->
        # state (html_filter.py:490-551)
        ('<div style="padding-left: 0px;">'
         '<input class="syno-notestation-editor-checkbox-checked"/>top</div>'
         '<div style="padding-left: 30px;">'
         '<input class="syno-notestation-editor-checkbox"/>sub</div>',
         "- [x] top\n    - [ ] sub"),
        # synology image ref -> src (html_filter.py:554-562)
        ('<img class="syno-notestation-image-object" '
         'src="webman/3rdparty/NoteStation/images/transparent.gif" '
         'ref="real.png">',
         "![](real.png)"),
    ],
)
def test_app_specific_html_passes(html, md):
    from jimmy_spark.functions.markup import html_to_md

    assert html_to_md(html) == md
