"""Input-side frontmatter parsing (functions/frontmatter.py,
sources/markdown.py) — the reference's frontmatter.parse-on-read
discipline (converter.py:275-294, obsidian.py:59-74) plus the
serialize -> parse -> identity round trip."""

from __future__ import annotations

import pytest

from jimmy_spark.functions.frontmatter import (
    get_inline_tags,
    parse_frontmatter,
)


class TestMiniYaml:
    def test_no_frontmatter_identity(self):
        assert parse_frontmatter("plain body\n---\nnot frontmatter") == (
            {},
            "plain body\n---\nnot frontmatter",
        )

    def test_scalars_and_types(self):
        meta, body = parse_frontmatter(
            "---\ntitle: My Note\nauthor: 'A. B.'\ncreated: 1700000000\n"
            "pinned: true\nlatitude: 52.5\n---\nbody here"
        )
        assert meta == {
            "title": "My Note",
            "author": "A. B.",
            "created": 1700000000,
            "pinned": True,
            "latitude": 52.5,
        }
        assert body == "body here"

    def test_inline_and_block_lists(self):
        meta, _ = parse_frontmatter(
            "---\ntags: [a, b, c]\naliases:\n- one\n- two\n---\nx"
        )
        assert meta == {"tags": ["a", "b", "c"], "aliases": ["one", "two"]}

    def test_dashes_inside_body_stay_in_body(self):
        meta, body = parse_frontmatter("---\nk: v\n---\nabove\n---\nbelow")
        assert meta == {"k": "v"} and body == "above\n---\nbelow"

    def test_frontmatter_closed_at_eof(self):
        meta, body = parse_frontmatter("---\nk: v\n---")
        assert meta == {"k": "v"} and body == ""

    # reference doctest anchors (md_lib/tags.py:4-27)
    @pytest.mark.parametrize(
        "text,markers,expected",
        [
            ("# header", ["#"], []),
            ("### h3", ["#"], []),
            ("#tag", ["#"], ["tag"]),
            ("#tag abc", ["#"], ["tag"]),
            ("#tag @abc", ["#", "@"], ["abc", "tag"]),
        ],
    )
    def test_inline_tags_reference_anchors(self, text, markers, expected):
        assert sorted(get_inline_tags(text, markers)) == expected


class TestMarkdownSource:
    def test_folder_scan_typed_and_custom_metadata(self, spark, tmp_path):
        (tmp_path / "a.md").write_text(
            "---\ntitle: Alpha\nauthor: me\ncreated: 1700000000\n"
            "tags: [x, y]\nmood: good\n---\nhello #zeta world"
        )
        (tmp_path / "b.md").write_text("no frontmatter at all")
        from jimmy_spark.sources.markdown import read_markdown

        rows = {
            r.name: r for r in read_markdown(spark, str(tmp_path)).collect()
        }
        a = rows["a"]
        assert a.ok and a.title == "Alpha" and a.author == "me"
        assert a.created == 1700000000
        assert a.body == "hello #zeta world"
        # frontmatter tags + inline tags, merged + sorted
        assert a.tags == ["x", "y", "zeta"]
        assert dict(a.meta) == {"mood": "good"}
        b = rows["b"]
        assert b.ok and b.title == "b" and b.body == "no frontmatter at all"
        assert b.tags == [] and dict(b.meta) == {}

    def test_nested_folders_and_alt_suffixes_scanned(self, spark, tmp_path):
        """Vaults keep notes in subfolders and the reference accepts
        .mdown/.markdown too (common.py:61, convert_folder recursion)."""
        (tmp_path / "sub" / "deep").mkdir(parents=True)
        (tmp_path / "top.md").write_text("t")
        (tmp_path / "sub" / "nested.md").write_text("n")
        (tmp_path / "sub" / "deep" / "alt.markdown").write_text("a")
        (tmp_path / "sub" / "other.mdown").write_text("o")
        from jimmy_spark.sources.markdown import read_markdown

        names = sorted(r.name for r in read_markdown(spark, str(tmp_path)).collect())
        assert names == ["alt", "nested", "other", "top"]

    def test_empty_frontmatter_values_fall_back(self, spark, tmp_path):
        """'title:'/'author:' left blank (obsidian property templates)
        must behave as absent — stem title, null author — not the
        python-literal string '[]'."""
        (tmp_path / "blank.md").write_text("---\ntitle:\nauthor:\n---\nbody")
        from jimmy_spark.sources.markdown import read_markdown

        r = read_markdown(spark, str(tmp_path)).first()
        assert r.title == "blank" and r.author is None and r.body == "body"

    def test_iso_created_parses_to_epoch(self, spark, tmp_path):
        (tmp_path / "c.md").write_text(
            "---\ncreated: 2023-11-14T22:13:20Z\n---\nx"
        )
        from jimmy_spark.sources.markdown import read_markdown

        r = read_markdown(spark, str(tmp_path)).first()
        assert r.created == 1700000000

    def test_lifecycle_roundtrip_write_then_read(self, spark, tmp_path):
        """run_conversion writes frontmatter; the markdown source must
        recover title/author/created and the body byte-for-byte — the
        serialize -> parse -> identity gate."""
        from jimmy_spark.plans import convert

        notes = spark.createDataFrame(
            [
                ("n1", "First Note", "body one\nline two", "au", 111),
                ("n2", "Second", "body two", None, None),
            ],
            "note_id string, title string, body string, author string, ts long",
        )
        out = tmp_path / "md"
        convert.write_notes(
            convert.determine_paths(notes), str(out)
        ).count()

        back = {
            r.title: r
            for r in convert.notes_from_markdown(spark, str(out)).collect()
        }
        assert back["First Note"].author == "au"
        assert back["First Note"].ts == 111
        assert back["First Note"].body == "body one\nline two"
        # empty author/ts serialize as '' -> parse back as absent-ish
        assert back["Second"].body == "body two"

    def test_obsidian_style_link_resolution(self, spark, tmp_path):
        """The markdown lifecycle resolves wikilinks and .md links by
        filename stem (obsidian.py:15-42 + writer.py:214-266): rendered
        standard links point at the target's written path, fragments
        header-normalize, text falls back to the target stem, web links
        and image embeds stay untouched, missing targets degrade to
        [text](broken-link id)."""
        from jimmy_spark.plans import convert

        src = tmp_path / "vault"
        src.mkdir()
        (src / "Other Note.md").write_text("---\ntitle: Other\n---\ntarget")
        (src / "main.md").write_text(
            "see [[Other Note]] and [lbl](Other%20Note.md#My_Sec) "
            "plus [web](https://x.y) ![[img.png]] [gone](Missing.md) "
            "embed ![[Other Note#Part]] "
            "and fenced ```\n[[Fence Only]]\n```"
        )
        stats = convert.run_conversion(
            spark, "markdown", str(src), str(tmp_path / "out")
        )
        assert stats["errors"] == 0 and stats["written"] == 2
        # titles: 'Other' (frontmatter) and 'main' (stem)
        body = (tmp_path / "out" / "main.md").read_text()
        # wikilink -> standard link to the written path, text = stem
        assert "[Other](./Other.md)" in body
        # quoted .md link with fragment -> header-id-normalized fragment
        assert "[lbl](./Other.md#my-sec)" in body
        # untouched: web link, image embed, fence-only wikilink (never
        # extracted, so never rewritten — a fence-only ref has no
        # replacement row)
        assert "[web](https://x.y)" in body
        assert "![[img.png]]" in body
        assert "```\n[[Fence Only]]\n```" in body
        # broken target
        assert "[gone](broken-link Missing)" in body
        # embedded note transclusion is a NOTE link by suffix
        # (obsidian.py:24-35) — rewritten to a standard link
        assert "embed [Other](./Other.md#part)" in body

    def test_nested_vault_hierarchy_preserved(self, spark, tmp_path):
        """The reference writes the notebook tree as nested directories
        (writer.py:106-109 determine_paths recursion + :268-271 mkdir
        tree) and links notes RELATIVE to the referencing note's folder
        (get_quoted_relative_path, writer.py:16-34: common prefix
        dropped, ../ walk-up, ./ prefix, angle brackets when quoting
        would alter the URL). Same-stem notes in different folders are
        distinct notes; wikilinks resolve to the first sorted match.
        Resources live at the output root (global_resource_folder='.'
        mode) and nested notes walk up to them."""
        from jimmy_spark.plans import convert

        src = tmp_path / "vault"
        (src / "sub" / "deep").mkdir(parents=True)
        (src / "b").mkdir()
        (src / "Root Note.md").write_text("root [[Nested]] dup [[Dup]]")
        (src / "sub" / "Nested.md").write_text(
            "up [[Root Note]] sib [[Deep]] pic ![p](pic.png)"
        )
        (src / "sub" / "deep" / "Deep.md").write_text("leaf")
        # same stem in two folders: both survive, no suffix needed
        (src / "sub" / "Dup.md").write_text("one")
        (src / "b" / "Dup.md").write_text("two")
        (src / "pic.png").write_bytes(b"PIX")
        stats = convert.run_conversion(
            spark, "markdown", str(src), str(tmp_path / "out")
        )
        assert stats["errors"] == 0 and stats["written"] == 5
        out = tmp_path / "out"
        # the output tree mirrors the vault tree
        assert (out / "Root Note.md").exists()
        assert (out / "sub" / "Nested.md").exists()
        assert (out / "sub" / "deep" / "Deep.md").exists()
        assert (out / "sub" / "Dup.md").exists()
        assert (out / "b" / "Dup.md").exists()
        # root -> nested: plain ./ descent
        assert "[Nested](./sub/Nested.md)" in (out / "Root Note.md").read_text()
        nested = (out / "sub" / "Nested.md").read_text()
        # nested -> root: ../ walk-up; space forces angle brackets
        assert "[Root Note](<../Root Note.md>)" in nested
        # nested -> deeper sibling dir: ./ descent from sub/
        assert "[Deep](./deep/Deep.md)" in nested
        # resource copied to the root, nested note walks up to it
        assert (out / "pic.png").read_bytes() == b"PIX"
        assert "![p](../pic.png)" in nested
        # wikilink to a duplicated stem: first sorted out_path wins
        # (b/Dup.md < sub/Dup.md)
        assert "[Dup](./b/Dup.md)" in (out / "Root Note.md").read_text()

    def test_tags_roundtrip_through_lifecycle(self, spark, tmp_path):
        """Tags survive convert: frontmatter tags (merged with inline
        #tags) serialize back out as the inline-list line the parser
        reads, so vault -> convert -> read-back is tag-lossless."""
        from jimmy_spark.plans import convert

        src = tmp_path / "v"
        src.mkdir()
        (src / "a.md").write_text(
            "---\ntitle: A\ntags: [x, y]\n---\nbody #inline done"
        )
        out = tmp_path / "o"
        convert.run_conversion(spark, "markdown", str(src), str(out))
        text = (out / "A.md").read_text()
        assert "\ntags: [inline, x, y]\n" in text
        back = convert.notes_from_markdown(spark, str(out)).first()
        assert back.tags == ["inline", "x", "y"]

    def test_vault_resources_copied_and_links_rewritten(self, spark, tmp_path):
        """Resource lane (obsidian.py:36-41 + writer.py:139-213): vault
        attachments referenced by notes are matched rglob-style (relpath
        suffix, first sorted match), copied into the output tree with
        collision-free names, and their links rebuilt — image embeds as
        ![..](./name), space-carrying names angle-bracketed, basename
        collisions suffixed, unmatched refs untouched."""
        from jimmy_spark.plans import convert

        src = tmp_path / "vault"
        (src / "attachments").mkdir(parents=True)
        (src / "files").mkdir()
        (src / "attachments" / "img.png").write_bytes(b"PNG-A")
        (src / "files" / "img.png").write_bytes(b"PNG-B")
        (src / "files" / "im age.png").write_bytes(b"PNG-SP")
        (src / "files" / "report.pdf").write_bytes(b"PDF")
        (src / "main.md").write_text(
            "e ![[img.png]] "                      # first sorted match
            "p ![pic](files/img.png) "             # path-qualified match
            "s ![scan](im%20age.png) "             # quoted name w/ space
            "d [doc](files/report.pdf) "
            "m ![ghost](missing.png)"
        )
        stats = convert.run_conversion(
            spark, "markdown", str(src), str(tmp_path / "out")
        )
        assert stats["errors"] == 0
        assert stats["resources"] == 4  # img.png x2, im age.png, report.pdf
        out = tmp_path / "out"
        body = (out / "main.md").read_text()
        # rglob first-sorted-match: bare img.png -> attachments/img.png
        # (sorts before files/img.png); it keeps the plain name, the
        # files/ one gets the collision suffix
        assert (out / "img.png").read_bytes() == b"PNG-A"
        assert (out / "img-0001.png").read_bytes() == b"PNG-B"
        assert (out / "im age.png").read_bytes() == b"PNG-SP"
        assert (out / "report.pdf").read_bytes() == b"PDF"
        assert "![img.png](./img.png)" in body          # embed, text<-fname
        assert "![pic](./img-0001.png)" in body
        assert "![scan](<./im age.png>)" in body        # bracket quoting
        assert "[doc](./report.pdf)" in body
        assert "![ghost](missing.png)" in body          # unmatched: kept

    def test_resource_identical_bytes_deduplicate(self, spark, tmp_path):
        """get_unique_path's byte rule (common.py:170-183): a filename
        collision only earns a suffix when the CONTENT differs —
        identical bytes under the same name collapse to one output file
        that every referencing link targets."""
        from jimmy_spark.plans import convert

        src = tmp_path / "vault"
        for d in ("a", "b", "c"):
            (src / d).mkdir(parents=True)
        (src / "a" / "logo.png").write_bytes(b"SAME")
        (src / "b" / "logo.png").write_bytes(b"SAME")     # dup bytes
        (src / "c" / "logo.png").write_bytes(b"OTHER")    # real collision
        (src / "n1.md").write_text("x ![l](a/logo.png) y ![m](b/logo.png)")
        (src / "n2.md").write_text("z ![n](c/logo.png)")
        stats = convert.run_conversion(
            spark, "markdown", str(src), str(tmp_path / "out")
        )
        assert stats["errors"] == 0
        # two distinct contents -> two files copied, not three
        assert stats["resources"] == 2
        out = tmp_path / "out"
        assert (out / "logo.png").read_bytes() == b"SAME"
        assert (out / "logo-0001.png").read_bytes() == b"OTHER"
        assert not (out / "logo-0002.png").exists()
        b1 = (out / "n1.md").read_text()
        b2 = (out / "n2.md").read_text()
        # both identical-bytes refs target the ONE deduplicated file
        assert b1.count("(./logo.png)") == 2
        assert "![n](./logo-0001.png)" in b2

    def test_full_lifecycle_from_markdown_source(self, spark, tmp_path):
        """markdown is a first-class SOURCES entry: folder -> lifecycle ->
        folder, lossless."""
        from jimmy_spark.plans import convert

        src = tmp_path / "src"
        src.mkdir()
        for i in range(6):
            (src / f"note{i}.md").write_text(
                f"---\ntitle: Note {i}\ntags: [t{i}]\n---\nsee note://note{(i + 1) % 6}"
            )
        stats = convert.run_conversion(
            spark, "markdown", str(src), str(tmp_path / "out")
        )
        assert stats["errors"] == 0 and stats["lossless"]
        assert stats["written"] == 6
        texts = {
            p.name: p.read_text()
            for p in (tmp_path / "out").glob("*.md")
        }
        assert len(texts) == 6
        # links resolved through the id->path map
        assert any("Note_1.md" in t or "Note 1" in t for t in texts.values())