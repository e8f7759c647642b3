"""End-to-end conversion lifecycle (plans/convert.py + jobs/convert_job.py)
— the reference CLI's scan -> filter -> two-pass write path, verified the
way the reference verifies it: the output tree is BYTE-EQUAL across runs
(test/test_convert.py:70-113 assert_dir_trees_equal), links resolve
through the id->path map with the broken-link fallback, filters and the
stats triple behave like main.py:112-188."""

from __future__ import annotations

import hashlib
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from jimmy_spark.plans import convert


def _tree_digest(d: Path) -> dict[str, str]:
    return {
        str(p.relative_to(d)): hashlib.md5(p.read_bytes()).hexdigest()
        for p in sorted(d.rglob("*"))
        if p.is_file()
    }


@pytest.fixture(scope="module")
def eml_dir():
    from jimmy_spark.datagen import ensure_exports

    return f"{ensure_exports('t2')}/eml"


def test_eml_conversion_byte_stable(spark, eml_dir, tmp_path):
    out1, out2 = tmp_path / "run1", tmp_path / "run2"
    s1 = convert.run_conversion(spark, "eml", eml_dir, str(out1))
    s2 = convert.run_conversion(spark, "eml", eml_dir, str(out2))
    assert s1 == s2
    assert s1["errors"] == 0
    assert s1["written"] == s1["filtered"] == s1["parsed"]
    assert s1["lossless"]
    d1, d2 = _tree_digest(out1), _tree_digest(out2)
    assert d1 and d1 == d2  # byte-equal trees, the reference's e2e gate
    # frontmatter render: title/author/created lines present
    sample = next(iter(sorted(d1)))
    text = (out1 / sample).read_text()
    assert text.startswith("---\ntitle: ")
    assert "\nauthor: u-" in text and "\n---\n" in text


def test_eml_attachments_become_unlinked_resources(spark, eml_dir):
    """Attachments are resources with no body link — the writer appends
    them under '## Unlinked Resources' (append_resource_links,
    writer.py:175-196); targets are content-address resource://<md5>
    (bytes never leave the executor, sources/eml.py policy)."""
    notes = convert.notes_from_eml(spark, eml_dir)
    withatt = notes.filter(F.col("body").contains("## Unlinked Resources"))
    rows = withatt.limit(5).collect()
    assert rows, "eml fixtures carry attachments"
    import re

    for r in rows:
        links = re.findall(
            r"- \[([^\]]+)\]\(resource://([0-9a-f]{32})\)", r.body
        )
        assert links, r.body[-200:]


def test_filters_and_stats(spark, eml_dir, tmp_path):
    s = convert.run_conversion(
        spark, "eml", eml_dir, str(tmp_path / "o"),
        include_like="note img_0000000000%",
    )
    assert 0 < s["filtered"] < s["parsed"]
    assert s["written"] == s["filtered"]


def test_tag_filters_and_precedence(spark):
    """select_notes tag branches (filters.py:22-37) + the reference's
    elif precedence: exclude-by-title beats every other configured
    filter; tag patterns match ANY of a note's tags; null-tag notes
    never match an include-tags filter but survive an exclude-tags."""
    notes = spark.createDataFrame(
        [
            ("a", "Alpha", "x", ["work", "urgent"]),
            ("b", "Beta", "y", ["home"]),
            ("c", "Gamma", "z", None),
        ],
        "note_id string, title string, body string, tags array<string>",
    )
    ids = lambda df: sorted(r.note_id for r in df.collect())  # noqa: E731
    assert ids(convert.select_notes(notes, include_tags_like="work")) == ["a"]
    assert ids(convert.select_notes(notes, include_tags_like="%o%")) == ["a", "b"]
    assert ids(convert.select_notes(notes, exclude_tags_like="urgent")) == ["b", "c"]
    # precedence: exclude-by-title wins; the tag filter is not applied
    assert ids(
        convert.select_notes(notes, exclude_like="Alpha", include_tags_like="home")
    ) == ["b", "c"]


def test_unique_paths_suffix_collisions(spark):
    notes = spark.createDataFrame(
        [("a", "Same Title", "x"), ("b", "Same Title", "y"), ("c", "Other", "z")],
        "note_id string, title string, body string",
    )
    got = {
        r.note_id: r.out_path
        for r in convert.determine_paths(notes).collect()
    }
    assert got["a"].endswith(".md") and got["b"].endswith("-0001.md")
    assert got["a"] != got["b"] != got["c"]


def test_link_resolution_and_broken_fallback(spark):
    notes = spark.createDataFrame(
        [
            ("n1", "One", "see note://n2 and note://ghost"),
            ("n2", "Two", "plain"),
        ],
        "note_id string, title string, body string",
    )
    out = convert.resolve_links(convert.determine_paths(notes))
    bodies = {r.note_id: r.body for r in out.collect()}
    assert "Two.md" in bodies["n1"]          # resolved through the id map
    assert "broken-link" in bodies["n1"]     # missing target coalesces
    assert "note://" not in bodies["n1"]
    assert bodies["n2"] == "plain"


def test_link_resolution_ignores_code_regions(spark):
    """Reference parity (get_markdown_links, links.py:244-250): a
    note:// ref inside a fenced block or inline code is NOT a link — the
    rewrite must leave such bodies byte-identical, while still resolving
    refs outside code in the same note."""
    notes = spark.createDataFrame(
        [
            ("n1", "Target", "plain"),
            ("n2", "FencedOnly", "```\nsee note://n1\n```"),
            ("n3", "InlineOnly", "use `note://n1` here"),
            ("n4", "Mixed", "real note://n1 and ```\nnote://n1\n```"),
        ],
        "note_id string, title string, body string",
    )
    out = convert.resolve_links(convert.determine_paths(notes))
    bodies = {r.note_id: r.body for r in out.collect()}
    assert bodies["n2"] == "```\nsee note://n1\n```"      # untouched
    assert bodies["n3"] == "use `note://n1` here"          # untouched
    # extracted outside code -> rewritten everywhere it appears (the
    # reference's str.replace-per-found-link discipline)
    assert bodies["n4"] == "real Target.md and ```\nTarget.md\n```"


def test_link_resolution_fragments_header_normalized(spark):
    """note://id#Fragment rewrites to <path>#<header_id(fragment)> — the
    writer's to_markdown_header_id discipline (writer.py:232-266); broken
    targets drop the fragment with the whole link; a fragment link and a
    bare link to the same target coexist in one body."""
    notes = spark.createDataFrame(
        [
            ("n1", "Target Note", "# Intro_Part\nplain"),
            ("src", "Src",
             "a note://n1#Intro_Part b note://n1 c note://ghost#Sec"),
        ],
        "note_id string, title string, body string",
    )
    out = convert.resolve_links(convert.determine_paths(notes))
    body = {r.note_id: r.body for r in out.collect()}["src"]
    assert body == (
        "a Target Note.md#intro-part b Target Note.md c broken-link"
    )


def test_link_resolution_prefix_ids_not_corrupted(spark):
    """When one note id is a prefix of another (n1 vs n10), the longer
    link must never be mangled by the shorter replacement — the fold
    applies replacements longest-id-first, deterministically."""
    notes = spark.createDataFrame(
        [
            ("n1", "Alpha", "plain"),
            ("n10", "Beta", "plain"),
            ("n100", "Gamma", "plain"),
            ("src", "Src", "a note://n1 b note://n10 c note://n100"),
        ],
        "note_id string, title string, body string",
    )
    out = convert.resolve_links(convert.determine_paths(notes))
    body = {r.note_id: r.body for r in out.collect()}["src"]
    assert body == "a Alpha.md b Beta.md c Gamma.md"
    # byte-stable across reruns (collect_list order must not leak through)
    body2 = {
        r.note_id: r.body
        for r in convert.resolve_links(convert.determine_paths(notes)).collect()
    }["src"]
    assert body == body2


def test_write_error_isolation(spark, tmp_path):
    """A note whose path cannot be written yields a manifest error row —
    the task (and the other notes) survive. (Missing directories are NOT
    an error anymore — write_notes mkdirs the tree for the folder-walking
    sources — so the failure here is a path component that is an existing
    regular FILE, which makedirs cannot create through.)"""
    out = tmp_path / "w"
    out.mkdir()
    (out / "blocked").write_text("a file, not a directory")
    notes = spark.createDataFrame(
        [("n1", "ok-note", "x"), ("n2", "bad", "y")],
        "note_id string, title string, body string",
    ).withColumn(
        "out_path",
        F.when(F.col("note_id") == "n2", F.lit("blocked/f.md"))
        .otherwise(F.lit("fine.md")),
    ).withColumn("author", F.lit(None).cast("string")) \
     .withColumn("ts", F.lit(None).cast("long"))
    manifest = convert.write_notes(notes, str(out)).collect()
    by_path = {r.out_path: r for r in manifest}
    assert by_path["fine.md"].written
    assert not by_path["blocked/f.md"].written
    assert by_path["blocked/f.md"].error


def test_convert_job_cli_exit_codes(eml_dir, tmp_path, monkeypatch):
    """The job's argv surface + exit-code contract (jimmy_cli.py:194-198),
    in-process (the spark-submit deployment path is exercised for jobs in
    test_spark_submit.py)."""
    import sys

    import jobs.convert_job as job

    monkeypatch.setattr(
        sys, "argv",
        ["convert_job.py", "--format", "eml", "--input", eml_dir,
         "--output", str(tmp_path / "cli_out"), "--no-frontmatter"],
    )
    assert job.main() == 0
    files = list((tmp_path / "cli_out").glob("*.md"))
    assert files
    # --no-frontmatter: body only
    assert not files[0].read_text().startswith("---")


def test_streaming_conversion_incremental(spark, eml_dir, tmp_path):
    """Incremental conversion (§2.9): files arriving across micro-batches
    convert exactly once with key-derived (coordination-free) naming, and
    the final tree is byte-identical to converting everything at once."""
    import shutil

    src = sorted(Path(eml_dir).glob("*.eml"))[:24]
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    for p in src[:10]:
        shutil.copy(p, inbox / p.name)

    out_s = tmp_path / "stream_out"
    q = convert.run_conversion_stream(
        spark, str(inbox), str(out_s), str(tmp_path / "cp")
    )
    try:
        q.processAllAvailable()
        n_first = len(list(out_s.glob("*.md")))
        assert n_first == 10
        for p in src[10:]:
            shutil.copy(p, inbox / p.name)
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(list(out_s.glob("*.md"))) == 24

    # batch twin over the same 24 inputs with the same key-derived naming
    out_b = tmp_path / "batch_out"
    notes = convert.notes_from_eml(spark, str(inbox)).filter("ok").drop(
        "ok", "error"
    )
    convert.write_notes(convert.key_paths(notes), str(out_b)).count()
    assert _tree_digest(out_s) == _tree_digest(out_b)  # stream == batch, bytes


def test_key_paths_code_aware_and_safe_names(spark):
    """The incremental lane shares the batch path's link discipline:
    code-region refs are never extracted, extracted refs rewrite
    everywhere (bug-compatible with the reference's str.replace), and the
    rewrite targets the SAME safe_filename the writer uses — a ref to a
    reserved-name note must point at the file actually written."""
    notes = spark.createDataFrame(
        [
            ("a", "A", "go note://b and fenced ```\nnote://zzz\n```"),
            ("b", "B", "inline `note://zzz` only"),
            ("CON", "C", "self note://CON"),
        ],
        "note_id string, title string, body string",
    )
    rows = {r.note_id: r for r in convert.key_paths(notes).collect()}
    assert rows["a"].body == "go b.md and fenced ```\nnote://zzz\n```"
    assert rows["b"].body == "inline `note://zzz` only"
    # reserved-name id: path and link rewrite agree on _CON.md
    assert rows["CON"].out_path == "_CON.md"
    assert rows["CON"].body == "self _CON.md"


def test_stream_sink_drops_parse_failures(spark):
    """The streaming sink's projection must gate on the ok flag: a
    parse-failure row carries a NON-null msg_id (the path literal), so an
    isNotNull-only gate would write a bogus, colliding .md per malformed
    input (regression: r4 sink filtered msg_id.isNotNull() only)."""
    from jimmy_spark.sources.eml import EML_SCHEMA

    rows = spark.createDataFrame(
        [
            ("m1", True, None, "Subj", "a@b", 5, "body", "text/plain",
             0, None, None),
            ("stream", False, "boom", None, None, None, None, None,
             0, None, None),
        ],
        EML_SCHEMA,
    )
    good = convert.stream_good_notes(rows).collect()
    assert [r.note_id for r in good] == ["m1"]


@pytest.mark.parametrize("fmt", ["jsonl", "sqlite", "xml", "archive"])
def test_all_source_formats_convert(spark, tmp_path, fmt):
    """Every registered source format runs the full lifecycle losslessly
    (scan shape differences end at the NOTE schema)."""
    from jimmy_spark.datagen import ensure_archives, ensure_exports

    exp = str(ensure_exports("t2"))
    inputs = {
        "jsonl": f"{exp}/jsonl",
        "sqlite": f"{exp}/notes.sqlite",
        "xml": f"{exp}/xml",
        "archive": str(ensure_archives("t2")),
    }
    s = convert.run_conversion(spark, fmt, inputs[fmt], str(tmp_path / fmt))
    assert s["errors"] == 0 and s["lossless"]
    assert s["written"] == s["parsed"] == 2000
    assert len(list((tmp_path / fmt).glob("*.md"))) == 2000
