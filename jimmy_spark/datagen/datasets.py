"""Named deterministic datasets, generated on demand under ``data/``.

The driver's tables live read-only in /root/testdata (TPC-H-ish); the
engine's own image/polygon/query tables are synthesized here (FIXTURES.md:
"no external data"). Generation is idempotent: a marker file records the
recipe; existing data with a matching marker is reused.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent.parent
DATA_ROOT = Path(os.environ.get("JIMMY_SPARK_DATA", str(REPO_ROOT / "data")))

# name -> (n_images, n_polygons, n_queries, skew_frac, corrupt_every)
DATASETS: dict[str, dict] = {
    "t1": dict(n_images=500, n_polygons=30, n_queries=30, skew_frac=0.3, corrupt_every=0),
    "t2": dict(n_images=2000, n_polygons=40, n_queries=60, skew_frac=0.3, corrupt_every=0),
    "t2err": dict(n_images=400, n_polygons=20, n_queries=15, skew_frac=0.3, corrupt_every=50),
    "bench": dict(n_images=4_000_000, n_polygons=60, n_queries=300, skew_frac=0.4, corrupt_every=0, shards=256),
    # curation-ladder bench input: every rejection lane live — corrupt rows
    # (decode), colocated near-dup shots (scene keep-best), plus the normal
    # quality spread for the sharpness/clip gate
    "curate": dict(n_images=1_000_000, n_polygons=40, n_queries=60, skew_frac=0.4, corrupt_every=500, dup_every=5, dup_colocate=True, shards=64),
}
SEED = 42


def dataset_dir(name: str) -> Path:
    return DATA_ROOT / name


def ensure_dataset(name: str) -> Path:
    from jimmy_spark.datagen.images import write_images
    from jimmy_spark.datagen.knn_queries import write_knn_queries
    from jimmy_spark.datagen.polygons import write_polygons

    cfg = DATASETS[name]
    d = dataset_dir(name)
    marker = d / "_MARKER.json"
    recipe = {"seed": SEED, "v": 4, **cfg}
    if marker.exists():
        try:
            if json.loads(marker.read_text()) == recipe:
                return d
        except Exception:
            pass
    d.mkdir(parents=True, exist_ok=True)
    img_kw = {
        k: v
        for k, v in cfg.items()
        if k not in ("n_images", "n_polygons", "n_queries", "shards")
    }
    write_images(
        str(d / "images.parquet"),
        cfg["n_images"],
        SEED,
        shards=cfg.get("shards", 1),
        **img_kw,
    )
    write_polygons(str(d / "polygons.parquet"), cfg["n_polygons"], SEED)
    write_knn_queries(str(d / "knn_queries.parquet"), cfg["n_queries"], SEED)
    marker.write_text(json.dumps(recipe))
    return d


def ensure_tracks(name: str = "t2", n_entities: int = 60, pings_per: int = 160) -> Path:
    """Deterministic moving-object tracks (datagen/tracks.py) for the
    trajectory operators; own marker so adding it never regenerates the
    (possibly multi-GB) base dataset."""
    from jimmy_spark.datagen.tracks import write_tracks

    d = dataset_dir(name)
    marker = d / "_MARKER_TRACKS.json"
    recipe = {"seed": SEED, "v": 1, "n_entities": n_entities, "pings_per": pings_per}
    if marker.exists():
        try:
            if json.loads(marker.read_text()) == recipe:
                return d
        except Exception:
            pass
    d.mkdir(parents=True, exist_ok=True)
    write_tracks(str(d / "tracks.parquet"), n_entities, pings_per, SEED)
    marker.write_text(json.dumps(recipe))
    return d


def ensure_contacts(
    name: str = "t2", n_entities: int = 36, pings_per: int = 120
) -> Path:
    """Deterministic co-moving entity tracks (datagen/contacts.py) for the
    spatio-temporal contact join; own marker like the tracks table."""
    from jimmy_spark.datagen.contacts import write_contacts

    d = dataset_dir(name)
    marker = d / "_MARKER_CONTACTS.json"
    recipe = {"seed": SEED, "v": 1, "n_entities": n_entities, "pings_per": pings_per}
    if marker.exists():
        try:
            if json.loads(marker.read_text()) == recipe:
                return d
        except Exception:
            pass
    d.mkdir(parents=True, exist_ok=True)
    write_contacts(str(d / "contacts.parquet"), n_entities, pings_per, SEED)
    marker.write_text(json.dumps(recipe))
    return d


def ensure_zones(name: str = "t2") -> Path:
    """Deterministic geofence zones (datagen/zones.py) anchored to the
    contacts table's actual track positions; own marker."""
    from jimmy_spark.datagen.zones import write_zones

    d = ensure_contacts(name)
    marker = d / "_MARKER_ZONES.json"
    recipe = {"seed": SEED, "v": 1}
    if marker.exists():
        try:
            if json.loads(marker.read_text()) == recipe:
                return d
        except Exception:
            pass
    write_zones(str(d / "zones.parquet"), str(d / "contacts.parquet"))
    marker.write_text(json.dumps(recipe))
    return d


def ensure_roads(name: str = "t2") -> Path:
    """Deterministic road-segment network (datagen/roads.py) for the
    map-matching operator; own marker like the tracks table."""
    from jimmy_spark.datagen.roads import write_roads

    d = dataset_dir(name)
    marker = d / "_MARKER_ROADS.json"
    recipe = {"seed": SEED, "v": 1}
    if marker.exists():
        try:
            if json.loads(marker.read_text()) == recipe:
                return d
        except Exception:
            pass
    d.mkdir(parents=True, exist_ok=True)
    write_roads(str(d / "roads.parquet"), SEED)
    marker.write_text(json.dumps(recipe))
    return d


def ensure_media(name: str = "t2av", n_rows: int = 400) -> Path:
    """Deterministic audio/video tables (QWAV/QVID fake containers) for
    the multimodal operators; marker-cached like every dataset."""
    from jimmy_spark.datagen.media import write_audios, write_videos

    d = DATA_ROOT / name
    marker = d / "_MARKER.json"
    recipe = {"seed": SEED, "v": 1, "n_rows": n_rows, "kind": "media"}
    if marker.exists():
        try:
            if json.loads(marker.read_text()) == recipe:
                return d
        except Exception:
            pass
    d.mkdir(parents=True, exist_ok=True)
    write_audios(str(d / "audios.parquet"), n_rows, SEED)
    write_videos(str(d / "videos.parquet"), n_rows, SEED)
    marker.write_text(json.dumps(recipe))
    return d


def ensure_exports(name: str) -> Path:
    """Deterministic export-format twins (SQLite db, JSONL shards, XML
    shards) of a dataset's images table — fixtures for the sqlite/json/xml
    source scans (sources/sqlite.py, queries.py). Marker-cached and keyed
    on the SOURCE dataset's marker like ensure_archives."""
    from jimmy_spark.datagen.exports import (
        write_crdt_notes,
        write_eml_notes,
        write_encrypted_notes,
        write_jsonl_notes,
        write_office_notes,
        write_sqlite_notes,
        write_xml_notes,
    )

    d = ensure_dataset(name)
    exp = d / "exports"
    marker = exp / "_MARKER.json"
    recipe = {"v": 6, "src": name,
              "src_recipe": json.loads((d / "_MARKER.json").read_text())}
    if marker.exists():
        try:
            if json.loads(marker.read_text()) == recipe:
                return exp
        except Exception:
            pass
    exp.mkdir(parents=True, exist_ok=True)
    src = str(d / "images.parquet")
    write_sqlite_notes(src, str(exp / "notes.sqlite"))
    write_jsonl_notes(src, str(exp / "jsonl"))
    write_xml_notes(src, str(exp / "xml"))
    write_encrypted_notes(src, str(exp / "enc.parquet"))
    write_crdt_notes(src, str(exp / "crdt.parquet"))
    write_eml_notes(src, str(exp / "eml"))
    write_office_notes(src, str(exp / "office"))
    marker.write_text(json.dumps(recipe))
    return exp


def ensure_archives(name: str, shards: int = 4) -> Path:
    """Deterministic archive twin of a dataset's images table: the same
    rows packed into zip/tgz shard archives (alternating formats) with a
    per-shard manifest.json — the fixture for the executor-side archive
    scan (sources/archives.py). Marker-cached like every dataset."""
    import io
    import tarfile
    import zipfile

    import pandas as pd

    d = ensure_dataset(name)
    arch = d / "archives"
    marker = arch / "_MARKER.json"
    # embed the SOURCE dataset's actual marker so archives regenerate
    # whenever the underlying images regenerate (a {v, shards} marker alone
    # would serve stale archives after a datagen/seed change)
    recipe = {"v": 1, "shards": shards, "src": name,
              "src_recipe": json.loads((d / "_MARKER.json").read_text())}
    if marker.exists():
        try:
            if json.loads(marker.read_text()) == recipe:
                return arch
        except Exception:
            pass
    arch.mkdir(parents=True, exist_ok=True)
    pdf = pd.read_parquet(d / "images.parquet").sort_values("image_id")
    parts = [pdf.iloc[i::shards] for i in range(shards)]
    for si, part in enumerate(parts):
        manifest = {
            r.image_id: {
                "w": int(r.w), "h": int(r.h),
                "caption": r.caption, "phash": int(r.phash),
            }
            for r in part.itertuples()
        }
        mbytes = json.dumps(manifest, sort_keys=True).encode()
        if si % 2 == 0:
            with zipfile.ZipFile(arch / f"shard{si}.zip", "w") as zf:
                zf.writestr("manifest.json", mbytes)
                for r in part.itertuples():
                    zf.writestr(f"{r.image_id}.{r.fmt}", bytes(r.bytes))
        else:
            with tarfile.open(arch / f"shard{si}.tgz", "w:gz") as tf:

                def add(tname: str, data: bytes) -> None:
                    info = tarfile.TarInfo(tname)
                    info.size = len(data)
                    tf.addfile(info, io.BytesIO(data))

                add("manifest.json", mbytes)
                for r in part.itertuples():
                    add(f"{r.image_id}.{r.fmt}", bytes(r.bytes))
    marker.write_text(json.dumps(recipe))
    return arch
