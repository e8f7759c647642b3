"""The reference's end-to-end conversion lifecycle, distributed.

jimmy's primary surface is `jimmy cli <inputs> --format X [filters...]`
(SURVEY §3.1): scan -> intermediate format -> filters -> two-pass write
(pass 1 determines unique output paths and builds the note-id map,
main.py:148-150; pass 2 writes notes with links rewritten through that
map, writer.py:214-266) -> parsed/filtered/written stats with a loss
warning (main.py:162-175) and exit code 1 on input errors
(jimmy_cli.py:194-198).

Spark-native shape — every stage is a DataFrame -> DataFrame function,
composed into ONE logical plan until the write:

- scan:   each supported container (eml / jsonl / sqlite / xml / archive)
          normalizes to the NOTE intermediate schema — the engine's
          `imf.Note` analogue — with per-record error isolation;
- filter: glob-style include/exclude predicates (filters.py:8-41);
- paths:  `row_number` over (title) — get_unique_name semantics
          (day_one.py:93-111) — then safe_filename, giving every note a
          deterministic collision-free relative path;
- links:  `note://<id>` references resolve through the id->path map with
          a broken-link fallback, entirely JVM-side: extract refs
          (regexp_extract_all + explode), left-join the map, fold the
          replacements back over the body with `F.aggregate` — the
          writer's two-pass join, no Python in the loop;
- write:  an Arrow-batched `mapInPandas` writes one .md file per note
          from the EXECUTORS (a real deployment points this at shared
          storage) and yields a manifest row per file — the written
          manifest is itself a DataFrame, so the parsed/filtered/written
          stats triple is one aggregation, and reruns are byte-stable
          (content is a pure function of the input).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jimmy_spark.functions import strings

NOTE_SCHEMA = (
    "note_id string, title string, body string, author string, "
    "ts long, ok boolean, error string, tags array<string>"
)

def _no_tags():
    return F.lit(None).cast("array<string>")


# --------------------------------------------------------------------------
# scan: container -> NOTE intermediate schema


def _eml_att_section():
    """Unlinked-Resources markdown block over the EML frame's attachment
    columns — shared by the batch source and the streaming sink so both
    lanes render byte-identical bodies."""
    items = F.zip_with(
        F.split(F.col("att_names"), "\x1f"),
        F.split(F.col("att_md5"), "\x1f"),
        lambda n, m: F.concat(
            F.lit("- ["), n, F.lit("](resource://"), m, F.lit(")")
        ),
    )
    return F.when(
        F.col("n_attachments") > 0,
        F.concat(
            F.lit("\n\n## Unlinked Resources\n\n"), F.array_join(items, "\n")
        ),
    ).otherwise(F.lit(""))


def notes_from_eml(spark: SparkSession, eml_dir: str) -> DataFrame:
    """EML scan + the writer's Unlinked-Resources discipline
    (append_resource_links, writer.py:175-196): attachments arrive as
    resources with no body link, so each becomes a ``- [name](...)``
    bullet under a ``## Unlinked Resources`` heading. Attachment BYTES
    never leave the executor (sources/eml.py policy) — the link target
    is the content-address ``resource://<md5>``, the key a real
    deployment's object-store sink files the payload under."""
    from jimmy_spark.sources import eml

    raw = eml.read_eml(spark, eml_dir)
    return raw.select(
        F.col("msg_id").alias("note_id"),
        F.coalesce(F.col("subject"), F.col("msg_id")).alias("title"),
        F.concat(
            F.coalesce(F.col("body"), F.lit("")), _eml_att_section()
        ).alias("body"),
        "author",
        F.col("date_ts").alias("ts"),
        "ok",
        "error",
        _no_tags().alias("tags"),
    )


def notes_from_jsonl(spark: SparkSession, jsonl_dir: str) -> DataFrame:
    notes = spark.read.schema(
        "content string, id string, lastModified long, tags array<string>"
    ).json(jsonl_dir)
    return notes.select(
        F.col("id").alias("note_id"),
        F.substring("content", 1, 80).alias("title"),
        F.col("content").alias("body"),
        F.lit(None).cast("string").alias("author"),
        F.col("lastModified").alias("ts"),
        F.lit(True).alias("ok"),
        F.lit(None).cast("string").alias("error"),
        "tags",
    )


def notes_from_sqlite(spark: SparkSession, db_path: str) -> DataFrame:
    from jimmy_spark.sources import sqlite as sq

    raw = sq.read_sqlite(
        spark,
        db_path,
        "notes",
        ["id", "guid", "mid", "mtime", "tags", "flds"],
        "id long, guid string, mid long, mtime long, tags string, flds string",
    )
    return raw.select(
        F.col("guid").alias("note_id"),
        F.substring("flds", 1, 80).alias("title"),
        F.col("flds").alias("body"),
        F.lit(None).cast("string").alias("author"),
        F.col("mtime").alias("ts"),
        F.lit(True).alias("ok"),
        F.lit(None).cast("string").alias("error"),
        # anki keeps tags space-separated in one column
        F.when(
            F.trim(F.col("tags")) == "", _no_tags()
        ).otherwise(F.split(F.trim(F.col("tags")), r"\s+")).alias("tags"),
    )


def notes_from_xml(spark: SparkSession, xml_dir: str) -> DataFrame:
    items = (
        spark.read.format("xml")
        .option("rowTag", "item")
        .schema("fmt string, height long, post_id string, title string, width long")
        .load(xml_dir)
    )
    return items.select(
        F.col("post_id").alias("note_id"),
        F.substring("title", 1, 80).alias("title"),
        F.col("title").alias("body"),
        F.lit(None).cast("string").alias("author"),
        F.lit(None).cast("long").alias("ts"),
        F.lit(True).alias("ok"),
        F.lit(None).cast("string").alias("error"),
        _no_tags().alias("tags"),
    )


def notes_from_archive(spark: SparkSession, archive_dir: str) -> DataFrame:
    """zip/tgz export archives (the reference's prepare_input families):
    the executor-side extractor yields image+caption records; captions
    become the note bodies."""
    from jimmy_spark.sources import archives

    rows = archives.read_image_archives(spark, archive_dir)
    return rows.select(
        F.col("image_id").alias("note_id"),
        F.substring("caption", 1, 80).alias("title"),
        F.col("caption").alias("body"),
        F.lit(None).cast("string").alias("author"),
        F.col("phash").alias("ts"),
        F.lit(True).alias("ok"),
        F.lit(None).cast("string").alias("error"),
        _no_tags().alias("tags"),
    )


def _tree_cols(root_dir: str):
    """(folder, stem) columns for the tree-walking sources: ``folder`` is
    the file's directory relative to the scan root with every component
    sanitized (the reference safe_path's each notebook title,
    writer.py:106-109), '' at root; ``stem`` is the filename stem the
    wikilink/rglob matchers key on. The per-file relpath also makes a
    collision-free note key — filename stems repeat across vault
    subfolders."""
    prefix = "file:" + os.path.abspath(root_dir).rstrip("/") + "/"
    relpath = F.replace(F.col("path"), F.lit(prefix), F.lit(""))
    reldir = F.when(
        relpath.contains("/"),
        F.regexp_extract(relpath, r"^(.*)/[^/]*$", 1),
    ).otherwise(F.lit(""))
    folder = F.array_join(
        F.transform(
            F.filter(F.split(reldir, "/"), lambda x: x != F.lit("")),
            strings.safe_filename,
        ),
        "/",
    )
    return relpath, folder


def notes_from_markdown(spark: SparkSession, md_dir: str) -> DataFrame:
    """Markdown-folder source (DefaultConverter family, converter.py:275):
    YAML frontmatter parsed on READ — title falls back to the filename
    stem, created becomes the note timestamp; tags/custom metadata ride
    in the richer sources.markdown frame for callers that need them.
    ``folder`` preserves the vault subtree (output mirrors it) and
    ``stem`` is the wikilink-resolution key; ``note_id`` is the relpath,
    the only per-file key that stays unique across subfolders."""
    from jimmy_spark.sources import markdown as md

    raw = md.read_markdown(spark, md_dir)
    relpath, folder = _tree_cols(md_dir)
    return raw.select(
        relpath.alias("note_id"),
        "title",
        F.coalesce(F.col("body"), F.lit("")).alias("body"),
        "author",
        F.col("created").alias("ts"),
        "ok",
        "error",
        "tags",
        folder.alias("folder"),
        F.col("name").alias("stem"),
    )


def notes_from_folder(spark: SparkSession, root_dir: str) -> DataFrame:
    """DefaultConverter filesystem-walk source (converter.py:239-382):
    one binaryFile scan + per-extension dispatch (docx/odt via the stdlib
    container parsers, adoc subset, fountain code-fence wrap, txt,
    mht/mhtml MIME, frontmatter-parsed md) with images and extension-less
    files skipped and per-record error isolation — the reference's
    catch-all folder import as one distributed plan."""
    from jimmy_spark.sources import folder

    raw = folder.read_folder(spark, root_dir)
    relpath, fol = _tree_cols(root_dir)
    return raw.select(
        relpath.alias("note_id"),
        "title",
        F.coalesce(F.col("body"), F.lit("")).alias("body"),
        F.lit(None).cast("string").alias("author"),
        "ts",
        "ok",
        "error",
        "tags",
        fol.alias("folder"),
        F.col("name").alias("stem"),
    )


SOURCES = {
    "eml": notes_from_eml,
    "markdown": notes_from_markdown,
    "jsonl": notes_from_jsonl,
    "sqlite": notes_from_sqlite,
    "xml": notes_from_xml,
    "archive": notes_from_archive,
    "folder": notes_from_folder,
}


# --------------------------------------------------------------------------
# filters (filters.py:8-41 select_notes)


def select_notes(
    notes: DataFrame,
    include_like: str | None = None,
    exclude_like: str | None = None,
    include_tags_like: str | None = None,
    exclude_tags_like: str | None = None,
) -> DataFrame:
    """Note selection (filters.py:8-41): by title pattern or by tag
    pattern, with the reference's precedence — exclude-by-title wins
    over include-by-title over exclude-by-tag over include-by-tag (the
    reference's elif chain applies exactly one configured branch).
    Patterns are SQL LIKE (the reference uses fnmatch globs; '*' -> '%'
    is the caller's one-character translation)."""

    def has_tag(pat: str):
        return F.exists(
            F.coalesce(F.col("tags"), F.array().cast("array<string>")),
            lambda t: t.like(pat),
        )

    if exclude_like:
        return notes.filter(~F.col("title").like(exclude_like))
    if include_like:
        return notes.filter(F.col("title").like(include_like))
    if exclude_tags_like:
        return notes.filter(~has_tag(exclude_tags_like))
    if include_tags_like:
        return notes.filter(has_tag(include_tags_like))
    return notes


# --------------------------------------------------------------------------
# pass 1: unique output paths (PathDeterminer, writer.py:37-109)


def determine_paths(notes: DataFrame) -> DataFrame:
    """Deterministic, collision-free relative paths: safe filename from
    the title, duplicate titles suffixed by (title, note_id) rank — the
    get_unique_name discipline. One shuffle on the title (the key is
    near-unique, so no skew concern).

    Sources that carry a ``folder`` column (the markdown/folder walks —
    the reference preserves the notebook tree as output directories,
    writer.py:106-109 + 268-271) keep their notes under it: uniqueness
    probes per directory like get_unique_path, and ``out_path`` becomes
    ``<folder>/<unique name>``. Flat sources are unchanged."""
    has_folder = "folder" in notes.columns
    fol = (
        F.coalesce(F.col("folder"), F.lit("")) if has_folder else F.lit("")
    )
    safe = strings.safe_filename(strings.split_title(F.col("title")))
    parts = ([fol] if has_folder else []) + [safe]
    w = Window.partitionBy(*parts).orderBy("note_id")
    rn = F.row_number().over(w)
    rel = F.when(rn == 1, F.concat(safe, F.lit(".md"))).otherwise(
        F.concat(safe, F.lit("-"), F.lpad((rn - 1).cast("string"), 4, "0"),
                 F.lit(".md"))
    )
    if has_folder:
        rel = F.when(fol == "", rel).otherwise(F.concat(fol, F.lit("/"), rel))
    return notes.withColumn("out_path", rel)


def relative_url(folder: "F.Column", target: "F.Column", frag: "F.Column"):
    """``get_quoted_relative_path`` (writer.py:16-34) + make_link's
    fragment placement (links.py:16-27) as one JVM expression: the link
    URL from a note living in directory ``folder`` ('' = root) to the
    output file at root-relative ``target`` — common prefix dropped,
    ``../`` per remaining source level, ``./`` prefixed when no walk-up
    (Obsidian compatibility), and the whole URL angle-bracketed (with
    the fragment INSIDE the brackets) when percent-quoting would alter
    it."""
    src = F.filter(F.split(folder, "/"), lambda x: x != F.lit(""))
    dst = F.split(target, "/")
    n_dst_dirs = F.size(dst) - 1
    # leading shared directory components (zip pads the shorter side
    # with null; eqNullSafe makes the pad compare unequal)
    pairs = F.zip_with(
        src, F.slice(dst, F.lit(1), n_dst_dirs), lambda a, b: a.eqNullSafe(b)
    )
    ncommon = F.aggregate(
        pairs,
        F.struct(F.lit(True).alias("go"), F.lit(0).alias("n")),
        lambda acc, x: F.struct(
            (acc["go"] & x).alias("go"),
            F.when(acc["go"] & x, acc["n"] + 1).otherwise(acc["n"]).alias("n"),
        ),
    )["n"]
    ups = F.size(src) - ncommon
    tail = F.array_join(
        F.slice(dst, ncommon + F.lit(1), F.size(dst) - ncommon), "/"
    )
    rel = F.concat(F.repeat(F.lit("../"), ups), tail)
    rel = F.when(ups == 0, F.concat(F.lit("./"), rel)).otherwise(rel)
    frag_part = F.when(frag == "", F.lit("")).otherwise(
        F.concat(F.lit("#"), frag)
    )
    return F.when(
        rel.rlike("^[A-Za-z0-9_.~/-]*$"), F.concat(rel, frag_part)
    ).otherwise(F.concat(F.lit("<"), rel, frag_part, F.lit(">")))


# --------------------------------------------------------------------------
# pass 2 prep: link resolution through the id->path map (writer.py:214-266)

def resolve_links(notes_with_paths: DataFrame) -> DataFrame:
    """Rewrite ``note://<id>`` references to the target's relative path
    (broken links fall back to the literal ``broken-link``, the
    reference's coalesce discipline). All JVM: refs explode out, the
    id->path map joins in (Catalyst/AQE broadcasts when small), and
    ``F.aggregate`` folds the replacements back over the body.

    Ref extraction is CODE-AWARE (functions/mdlinks.py): a ``note://x``
    inside a fenced block or inline code span is not a link — the
    reference's AST-based get_markdown_links (links.py:234-310) never
    yields it, so its rewrite loop never touches it. A note whose only
    refs sit in code gets no replacement row and its body passes through
    byte-identical. (Like the reference's ``str.replace``-per-found-link
    discipline, a ref that appears BOTH outside and inside code is
    rewritten in both places once extracted — bug-compatible by design.)

    FRAGMENTS: ``note://id#Some_Heading`` rewrites to
    ``<path>#<header_id(fragment)>`` — the writer normalizes the link
    fragment to the markdown header id the target heading rendered to
    (writer.py:232-266 via to_markdown_header_id); a broken target drops
    the fragment with the whole link, like the reference's fallback.
    """
    from jimmy_spark.functions import mdlinks, strings

    # inner explode: linkless notes contribute no ref rows (an outer
    # explode would fold a NULL target and null the whole body)
    src_folder = (
        F.coalesce(F.col("folder"), F.lit(""))
        if "folder" in notes_with_paths.columns
        else F.lit("")
    )
    refs = notes_with_paths.select(
        F.col("note_id").alias("src_id"),
        src_folder.alias("src_folder"),
        F.explode(
            mdlinks.note_ref_tokens_col(F.col("body"))
        ).alias("tok"),
    ).select(
        "src_id",
        "src_folder",
        "tok",
        F.regexp_extract("tok", mdlinks.NOTE_REF_RE, 1).alias("target_id"),
        F.regexp_extract("tok", r"#([A-Za-z0-9_\-]+)$", 1).alias("frag"),
    )
    id_map = notes_with_paths.select(
        F.col("note_id").alias("target_id"), F.col("out_path").alias("target_path")
    )
    frag_part = F.when(
        F.col("frag") == "", F.lit("")
    ).otherwise(F.concat(F.lit("#"), strings.header_id(F.col("frag"))))
    # flat sources keep the root-relative token rewrite; a note living in
    # a subfolder (the tree-walking sources) walks up to its target
    rel_path = F.when(
        F.col("src_folder") == "", F.concat(F.col("target_path"), frag_part)
    ).otherwise(
        relative_url(
            F.col("src_folder"), F.col("target_path"),
            F.when(F.col("frag") == "", F.lit("")).otherwise(
                strings.header_id(F.col("frag"))
            ),
        )
    )
    repl = F.when(
        F.col("target_path").isNull(), F.lit("broken-link")
    ).otherwise(rel_path)
    resolved = (
        refs.join(id_map, "target_id", "left")
        .groupBy("src_id")
        .agg(
            F.collect_list(
                F.struct(F.col("tok").alias("t"), repl.alias("p"))
            ).alias("repls")
        )
    )
    joined = notes_with_paths.join(
        resolved, notes_with_paths.note_id == resolved.src_id, "left"
    ).drop("src_id")
    return joined.withColumn("body", _folded_body()).drop("repls")


def _folded_body() -> "F.Column":
    """Replacement fold over a collected ``repls`` array<struct<t,p>>:
    longest token first — collect_list order is nondeterministic, and
    when one token is a prefix of another (note://n1 vs note://n10, or
    note://n1 vs note://n1#sec) replacing the shorter first would
    corrupt the longer link. Sorting (length desc, token desc) makes the
    fold both prefix-safe and byte-stable across reruns."""
    ordered = F.array_sort(
        F.coalesce(F.col("repls"), F.array()),
        lambda l, r: F.when(F.length(l["t"]) > F.length(r["t"]), F.lit(-1))
        .when(F.length(l["t"]) < F.length(r["t"]), F.lit(1))
        .when(l["t"] > r["t"], F.lit(-1))
        .when(l["t"] < r["t"], F.lit(1))
        .otherwise(F.lit(0)),
    )
    return F.aggregate(
        ordered,
        F.col("body"),
        lambda acc, r: F.replace(acc, r["t"], r["p"]),
    )


def scan_vault_resources(spark: SparkSession, md_dir: str) -> DataFrame:
    """Paths-only recursive listing of the vault's NON-markdown files —
    the candidate set find_file_recursively globs over
    (common.py:506-522). Bytes are not read here (the content column is
    pruned out of the binaryFile scan): content hashes for the writer's
    identical-bytes dedup are computed later, for the DISTINCT matched
    files only (_hash_files) — a vault can carry terabytes of
    never-referenced attachments, and this plan never opens them. The
    copy stage re-opens matched files executor-side, so resource bytes
    never cross a shuffle."""
    prefix = "file:" + os.path.abspath(md_dir).rstrip("/") + "/"
    files = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(md_dir)
        .select("path")
        .filter(
            ~F.col("path").endswith(".md")
            & ~F.col("path").endswith(".mdown")
            & ~F.col("path").endswith(".markdown")
        )
    )
    return files.select(
        "path",
        F.replace(F.col("path"), F.lit(prefix), F.lit("")).alias("relpath"),
        F.regexp_extract("path", r"([^/]+)$", 1).alias("fname"),
    )


def _hash_files(files: DataFrame) -> DataFrame:
    """(fname, src_rel, src_path) -> + md5 of the file bytes, computed
    executor-side over the matched files only (the identical-bytes probe
    of get_unique_path, common.py:170-183). An unreadable file degrades
    to a unique per-file sentinel, so it can never content-merge with
    anything — the copy stage will surface the real error."""
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            md5s = []
            for path, rel in zip(pdf["src_path"], pdf["src_rel"]):
                try:
                    with open(path.removeprefix("file:"), "rb") as f:
                        md5s.append(hashlib.md5(f.read()).hexdigest())
                except Exception:  # noqa: BLE001 — per-file isolation
                    md5s.append("unreadable:" + rel)
            out = pdf[["fname", "src_rel", "src_path"]].copy()
            out["md5"] = md5s
            yield out

    return files.mapInPandas(
        gen, "fname string, src_rel string, src_path string, md5 string"
    )


def resolve_md_resources(
    notes_with_paths: DataFrame, resources_meta: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Resource lane of the markdown lifecycle (obsidian.py:36-41 +
    writer.py:139-213): each non-markdown link matches a vault file by
    rglob semantics — relpath equals the unquoted url or ends with
    '/<url>', first sorted match wins — gets a collision-free output
    name (same name + same bytes deduplicate to ONE file, per
    get_unique_path common.py:170-183), and rewrites to the reference's
    make_link shape
    (``[title](./name)`` / ``![...]``, angle-bracketed when URL-quoting
    would alter the path; link text falls back to the filename). An
    unmatched resource link stays untouched, like the reference's
    find-no-match skip.

    Returns (repls, copy_plan): per-note replacement structs to merge
    into the link fold, and the distinct (src path, dest name) frame the
    copy stage executes."""
    from jimmy_spark.functions import mdlinks

    src_folder = (
        F.coalesce(F.col("folder"), F.lit(""))
        if "folder" in notes_with_paths.columns
        else F.lit("")
    )
    refs = notes_with_paths.select(
        F.col("note_id").alias("src_id"),
        src_folder.alias("src_folder"),
        F.explode(mdlinks.resource_links_col(F.col("body"))).alias("r"),
    ).select(
        "src_id",
        "src_folder",
        F.col("r.orig").alias("orig"),
        F.col("r.url").alias("url"),
        F.col("r.fname").alias("fname"),
        F.col("r.text").alias("text"),
        F.col("r.is_image").alias("is_image"),
    )
    cand = refs.join(resources_meta, "fname").filter(
        (F.col("relpath") == F.col("url"))
        | F.col("relpath").endswith(F.concat(F.lit("/"), F.col("url")))
    )
    best = cand.groupBy(
        "src_id", "src_folder", "orig", "url", "fname", "text", "is_image"
    ).agg(
        F.min("relpath").alias("src_rel"), F.min("path").alias("src_path")
    )
    # collision-free output names over the DISTINCT matched files, with
    # the reference's identical-bytes rule (get_unique_path,
    # common.py:170-183): same filename + same bytes -> ONE output file
    # (every matching source reuses it); only files whose CONTENT
    # differs earn a collision suffix. Content groups within a filename
    # order by their first (min) relpath, so naming stays deterministic.
    # Hashing runs over the distinct MATCHED files only (_hash_files) —
    # unreferenced vault bytes are never opened.
    stem = F.regexp_extract("fname", r"^(.*?)(\.[^.]*)?$", 1)
    ext = F.regexp_extract("fname", r"(\.[^.]*)$", 1)
    files = _hash_files(best.select("fname", "src_rel", "src_path").distinct())
    wg = Window.partitionBy("fname").orderBy("grp_rel")
    groups = (
        files.groupBy("fname", "md5")
        .agg(F.min("src_rel").alias("grp_rel"))
        .withColumn("_rn", F.row_number().over(wg))
        .withColumn(
            "dest_rel",
            F.when(F.col("_rn") == 1, F.col("fname")).otherwise(
                F.concat(
                    stem, F.lit("-"),
                    F.lpad((F.col("_rn") - 1).cast("string"), 4, "0"), ext,
                )
            ),
        )
        .select("fname", "md5", "dest_rel")
    )
    dests = files.join(groups, ["fname", "md5"]).select(
        "fname", "src_rel", "src_path", "dest_rel"
    )
    matched = best.join(dests, ["fname", "src_rel", "src_path"])
    # resources land at the output ROOT (the reference's
    # global_resource_folder='.' mode, writer.py:81-83); a note in a
    # subfolder walks up to them — relative_url applies the full
    # get_quoted_relative_path discipline (./ prefix, ../ walk-up,
    # angle brackets when quoting would change the URL)
    quoted = relative_url(F.col("src_folder"), F.col("dest_rel"), F.lit(""))
    title = F.when(F.col("text") != "", F.col("text")).otherwise(F.col("fname"))
    repl = F.concat(
        F.when(F.col("is_image"), F.lit("!")).otherwise(F.lit("")),
        F.lit("["), title, F.lit("]("), quoted, F.lit(")"),
    )
    repls = matched.select(
        "src_id", F.struct(F.col("orig").alias("t"), repl.alias("p")).alias("repl")
    )
    # identical-content sources share a dest — copy each dest ONCE from
    # its deterministic representative
    copy_plan = matched.groupBy("dest_rel").agg(
        F.min("src_path").alias("src_path")
    )
    return repls, copy_plan


COPY_SCHEMA = "dest_rel string, n_bytes long, copied boolean, error string"


def copy_resources(copy_plan: DataFrame, out_dir: str) -> DataFrame:
    """Executor-side resource copy (write_resource, writer.py:198-213):
    each matched file is read at its source path and written under
    ``out_dir`` — on a cluster both sides are shared storage, so bytes
    move executor-local, never through the driver or a shuffle."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        os.makedirs(out_dir, exist_ok=True)
        for pdf in batches:
            rows = []
            for src, dest in zip(pdf["src_path"], pdf["dest_rel"]):
                try:
                    local = src.removeprefix("file:")
                    with open(local, "rb") as f:
                        data = f.read()
                    with open(os.path.join(out_dir, dest), "wb") as f:
                        f.write(data)
                    rows.append((dest, len(data), True, None))
                except Exception as e:  # noqa: BLE001 — per-file isolation
                    rows.append((dest, 0, False, str(e)))
            yield pd.DataFrame(
                rows, columns=["dest_rel", "n_bytes", "copied", "error"]
            )

    return copy_plan.mapInPandas(gen, COPY_SCHEMA)


def resolve_md_links(
    notes_with_paths: DataFrame, extra_repls: DataFrame | None = None
) -> DataFrame:
    """Obsidian-family link resolution for the markdown-folder source
    (obsidian.py:15-42 handle_links + writer.py:214-266
    update_note_links): INTERNAL links — standard ``[text](Other
    Note.md)`` (possibly %-quoted) and wikilinks ``[[Other Note]]`` /
    ``[[Note#Sec|label]]`` — resolve by the target's filename stem
    through the id->path map; web/mail links, images/embeds and
    non-markdown resource links are untouched. The replacement is the
    reference's make_link rebuild: link text falls back to the resolved
    path's stem (else the raw id), the fragment normalizes through the
    header-id kernel, and a missing target degrades to
    ``[text](broken-link <id>)``. Extraction is the full AST-equivalent
    scanner (one Arrow crossing); everything after it is JVM."""
    from jimmy_spark.functions import mdlinks, strings

    src_folder = (
        F.coalesce(F.col("folder"), F.lit(""))
        if "folder" in notes_with_paths.columns
        else F.lit("")
    )
    refs = notes_with_paths.select(
        F.col("note_id").alias("src_id"),
        src_folder.alias("src_folder"),
        F.explode(mdlinks.note_links_col(F.col("body"))).alias("l"),
    ).select(
        "src_id",
        "src_folder",
        F.col("l.orig").alias("orig"),
        F.col("l.target_id").alias("target_id"),
        F.col("l.text").alias("text"),
        F.col("l.frag").alias("frag"),
        F.col("l.title").alias("title"),
    )
    # wikilinks/.md links address notes by filename STEM; stems repeat
    # across vault subfolders, so the map takes the first sorted match
    # per stem (find_file_recursively's rglob discipline, deterministic)
    if "stem" in notes_with_paths.columns:
        id_map = notes_with_paths.groupBy(
            F.col("stem").alias("target_id")
        ).agg(F.min("out_path").alias("target_path"))
    else:
        # note_id is unique by construction — a groupBy here would add a
        # shuffle on the map frame for nothing
        id_map = notes_with_paths.select(
            F.col("note_id").alias("target_id"),
            F.col("out_path").alias("target_path"),
        )
    joined_refs = refs.join(id_map, "target_id", "left")
    # link text falls back to the target FILENAME stem (new_path.stem,
    # writer.py:228), never the directory part
    stem = F.regexp_replace(
        F.regexp_extract(F.col("target_path"), r"([^/]+)$", 1),
        r"\.md$", "",
    )
    best_text = F.when(F.col("text") != "", F.col("text")).otherwise(
        F.when(F.col("target_path").isNull(), F.col("target_id")).otherwise(stem)
    )
    frag_norm = F.when(F.col("frag") == "", F.lit("")).otherwise(
        strings.header_id(F.col("frag"))
    )
    title_part = F.when(F.col("title") == "", F.lit("")).otherwise(
        F.concat(F.lit(' "'), F.col("title"), F.lit('"'))
    )
    repl = F.when(
        F.col("target_path").isNull(),
        F.concat(
            F.lit("["), best_text, F.lit("](broken-link "),
            F.col("target_id"), F.lit(")"),
        ),
    ).otherwise(
        F.concat(
            F.lit("["), best_text, F.lit("]("),
            relative_url(F.col("src_folder"), F.col("target_path"), frag_norm),
            title_part, F.lit(")"),
        )
    )
    pairs = joined_refs.select(
        "src_id",
        F.struct(F.col("orig").alias("t"), repl.alias("p")).alias("repl"),
    )
    if extra_repls is not None:
        # resource-lane replacements (resolve_md_resources) merge into
        # the same longest-first fold
        pairs = pairs.unionByName(extra_repls)
    resolved = pairs.groupBy("src_id").agg(
        F.collect_list("repl").alias("repls")
    )
    joined = notes_with_paths.join(
        resolved, notes_with_paths.note_id == resolved.src_id, "left"
    ).drop("src_id")
    return joined.withColumn("body", _folded_body()).drop("repls")


# --------------------------------------------------------------------------
# write: executor-side .md tree + manifest (FilesystemWriter analogue)

MANIFEST_SCHEMA = "out_path string, n_bytes long, written boolean, error string"


def render_note(frontmatter: bool = True, with_tags: bool = False):
    """Rendered document column (NoteFormatter/frontmatter discipline,
    intermediate_format.py:214-287). ``with_tags`` adds the inline-list
    ``tags: [a, b]`` line when the note carries tags — the exact shape
    the input-side parser (functions/frontmatter.py fm_tags) reads back,
    closing the serialize <-> parse loop for tags too."""
    body = F.coalesce(F.col("body"), F.lit(""))
    if not frontmatter:
        return body
    tags_part = (
        F.when(
            F.col("tags").isNotNull() & (F.size("tags") > 0),
            F.concat(
                F.lit("\ntags: ["), F.array_join("tags", ", "), F.lit("]")
            ),
        ).otherwise(F.lit(""))
        if with_tags
        else F.lit("")
    )
    return F.concat(
        F.lit("---\ntitle: "), F.coalesce(F.col("title"), F.lit("")),
        F.lit("\nauthor: "), F.coalesce(F.col("author"), F.lit("")),
        F.lit("\ncreated: "), F.coalesce(F.col("ts").cast("string"), F.lit("")),
        tags_part,
        F.lit("\n---\n"), body,
    )


def write_notes(
    notes: DataFrame, out_dir: str, frontmatter: bool = True
) -> DataFrame:
    """Write one markdown file per note from the executors; returns the
    written MANIFEST as a DataFrame (path, bytes, written, error) — the
    stats triple and loss check aggregate over it. Content is a pure
    function of the input, so reruns are byte-identical (idempotent)."""
    doc = render_note(frontmatter, with_tags="tags" in notes.columns)
    payload = notes.select("out_path", doc.alias("doc"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        os.makedirs(out_dir, exist_ok=True)
        for pdf in batches:
            rows = []
            for rel, docstr in zip(pdf["out_path"], pdf["doc"]):
                try:
                    data = (docstr or "").encode("utf-8")
                    full = os.path.join(out_dir, rel)
                    # tree-walking sources mirror their folder structure
                    # (writer.py:268-271 mkdir tree)
                    os.makedirs(os.path.dirname(full), exist_ok=True)
                    with open(full, "wb") as f:
                        f.write(data)
                    rows.append((rel, len(data), True, None))
                except Exception as e:  # noqa: BLE001 — per-note isolation
                    rows.append((rel, 0, False, str(e)))
            yield pd.DataFrame(
                rows, columns=["out_path", "n_bytes", "written", "error"]
            )

    return payload.mapInPandas(gen, MANIFEST_SCHEMA)


# --------------------------------------------------------------------------
# the composed lifecycle


def run_conversion(
    spark: SparkSession,
    fmt: str,
    input_path: str,
    out_dir: str,
    include_like: str | None = None,
    exclude_like: str | None = None,
    frontmatter: bool = True,
    include_tags_like: str | None = None,
    exclude_tags_like: str | None = None,
) -> dict:
    """scan -> filter -> paths -> links -> write -> stats (main.py:112-188
    run_conversion, distributed). Returns the stats dict; ``n_errors`` > 0
    is the CLI's exit-1 condition.

    The parsed/errors/filtered triple rides the WRITE action as
    ``observe()`` metrics (CollectMetrics nodes at the scan and
    post-filter points of the same plan) — one scan of the source and one
    write, not three counting pre-scans plus a write; at 10^9 notes the
    old shape tripled scan cost for bookkeeping the plan already does."""
    from pyspark.sql import Observation

    notes = SOURCES[fmt](spark, input_path)
    scan_obs = Observation("scan_stats")
    observed = notes.observe(
        scan_obs,
        F.count(F.lit(1)).alias("parsed"),
        F.coalesce(
            F.sum((~F.col("ok")).cast("long")), F.lit(0)
        ).alias("errors"),
    )
    good = observed.filter(F.col("ok"))
    kept = select_notes(
        good, include_like, exclude_like, include_tags_like, exclude_tags_like
    )
    kept_obs = Observation("kept_stats")
    kept = kept.observe(kept_obs, F.count(F.lit(1)).alias("filtered"))
    # the markdown-folder family resolves [[wikilinks]] / [x](y.md) by
    # filename stem (obsidian semantics) and carries its vault resources
    # (attachments) into the output tree; every other source carries
    # explicit note://<id> refs
    with_paths = determine_paths(kept)
    copy_plan = None
    if fmt == "markdown":
        # the note-write and the resource-copy are two actions sharing
        # this expensive prefix (vault scan + YAML parse + pandas-UDF
        # link extraction); persist it so the copy action reuses the
        # computed notes instead of re-running the whole lane
        with_paths = with_paths.persist()
        res_repls, copy_plan = resolve_md_resources(
            with_paths, scan_vault_resources(spark, input_path)
        )
        resolved = resolve_md_links(with_paths, extra_repls=res_repls)
    else:
        resolved = resolve_links(with_paths)
    manifest = write_notes(resolved, out_dir, frontmatter)
    agg = manifest.agg(
        F.count("*").alias("n"),
        F.sum(F.col("written").cast("long")).alias("n_written"),
        F.sum("n_bytes").alias("bytes_written"),
    ).first()
    stats = {
        "parsed": int(scan_obs.get["parsed"]),
        "errors": int(scan_obs.get["errors"]),
        "filtered": int(kept_obs.get["filtered"]),
        "written": int(agg["n_written"] or 0),
        "bytes_written": int(agg["bytes_written"] or 0),
    }
    if copy_plan is not None:
        cagg = copy_resources(copy_plan, out_dir).agg(
            F.sum(F.col("copied").cast("long")).alias("n_copied")
        ).first()
        stats["resources"] = int(cagg["n_copied"] or 0)
        with_paths.unpersist()
    # the reference's parsed-vs-written loss warning (main.py:162-175)
    stats["lossless"] = stats["written"] == stats["filtered"]
    return stats


# --------------------------------------------------------------------------
# incremental conversion (§2.9): new export files convert as they arrive


def key_paths(notes: DataFrame) -> DataFrame:
    """KEY-DERIVED output paths: ``<note_id>.md``. Rank-based unique
    naming (determine_paths) needs a global window — a batch luxury; an
    incremental pipeline must name outputs as a pure function of the
    record key so any micro-batch, restart or replica produces the same
    path without coordination. Links then resolve by pure expression too
    (no id->path join): ``note://X`` -> ``safe_filename(X).md`` — the
    same filename kernel the path column uses, so links always hit the
    file that was actually written (reserved names, length cap).

    Same code-aware discipline as the batch ``resolve_links``: refs are
    extracted from the code-masked body (a ref living only inside a
    fence or inline code is never rewritten), extracted refs fold
    longest-first over the original body (prefix-id safety), and — like
    the batch path — an extracted ref is replaced everywhere it appears.
    """
    from jimmy_spark.functions import mdlinks

    ordered = F.array_sort(
        mdlinks.note_refs_col(F.col("body")),
        lambda l, r: F.when(F.length(l) > F.length(r), F.lit(-1))
        .when(F.length(l) < F.length(r), F.lit(1))
        .when(l > r, F.lit(-1))
        .when(l < r, F.lit(1))
        .otherwise(F.lit(0)),
    )
    body2 = F.aggregate(
        ordered,
        F.col("body"),
        lambda acc, t: F.replace(
            acc,
            F.concat(F.lit("note://"), t),
            F.concat(strings.safe_filename(t), F.lit(".md")),
        ),
    )
    return notes.withColumn(
        "out_path",
        F.concat(strings.safe_filename(F.col("note_id")), F.lit(".md")),
    ).withColumn("body", body2)


def stream_good_notes(notes: DataFrame) -> DataFrame:
    """The stream sink's NOTE projection, ok-gated. Parse-failure rows
    carry a NON-null msg_id (the input path literal), so the drop gate is
    the ``ok`` flag — batch-path parity with ``run_conversion``'s error
    handling — not msg_id nullness; an isNotNull-only gate would write one
    bogus (and colliding) .md per malformed input."""
    return (
        notes.filter(F.col("ok"))
        .select(
            F.col("msg_id").alias("note_id"),
            F.coalesce(F.col("subject"), F.col("msg_id")).alias("title"),
            F.concat(
                F.coalesce(F.col("body"), F.lit("")), _eml_att_section()
            ).alias("body"),
            "author",
            F.col("date_ts").alias("ts"),
        )
        .filter(F.col("note_id").isNotNull())
    )


def run_conversion_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    frontmatter: bool = True,
    query_name: str = "convert_stream",
):
    """Streaming twin of ``run_conversion`` for the eml source: a text
    wholetext file stream watches ``input_dir`` (each new .eml lands as
    one row), micro-batches run scan -> key-derived paths -> write
    through foreachBatch, and the file-source checkpoint gives
    exactly-once-per-input-file across restarts (the engine's incremental
    ingest story, SURVEY §2.9, plus checkpoint.py for bucket-level
    resume inside huge batches). Returns the started StreamingQuery —
    callers drive it with processAllAvailable()/stop()."""
    from jimmy_spark.sources.eml import parse_eml_frame

    stream = (
        spark.readStream.format("text")
        .option("wholetext", "true")
        .option("pathGlobFilter", "*.eml")
        .load(input_dir)
        .select(
            F.lit("stream").alias("path"),
            F.encode(F.col("value"), "UTF-8").alias("content"),
        )
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        good = stream_good_notes(parse_eml_frame(batch_df))
        write_notes(key_paths(good), out_dir, frontmatter).count()

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )
