"""CRDT text-document fold: binary op-log blobs -> converged text.

The reference ingests AFFiNE stores by folding CRDT block documents with
``pycrdt`` (/root/reference/src/jimmy/formats/affine.py:2-5) — the only
scan family whose decode is a *merge* rather than a parse. No CRDT
library exists in this container, so this module implements the kernel
from scratch on public CRDT theory (RGA/YATA replicated sequences):

- every inserted element carries a globally-unique id ``(client, clock)``
  and the id of its LEFT ORIGIN (the element it was typed after);
- concurrent inserts at the same origin are ordered by descending id —
  any consistent total order works; this one is fixed;
- deletes are tombstones by target id;
- integration buffers causally-early ops until their origin exists, so
  **applying the op log in ANY order converges to the same document** —
  the defining CRDT property, and the thing tests/test_sources.py
  verifies by integrating seeded shuffles of the same log.

STUB NOTICE (wire format): blobs use the self-describing QCRD1 layout
below (varint-framed), NOT Yjs/pycrdt bytes — byte-level Yjs parity is
unverifiable offline. The merge semantics, causal buffering, tombstones
and the Spark plumbing (binary column -> mapInPandas decode -> per-row
error isolation) are the real, tested content; swapping the frame parser
for a Yjs reader changes only ``_parse_ops``.

Scale notes: one document folds inside one task (documents are the unit
of parallelism, like archives); op logs stream through Arrow batches and
a malformed blob degrades to ok=false without failing the task.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

MAGIC = b"QCRD1"

FOLD_SCHEMA = "doc_id string, ok boolean, text string, n_ops int, error string"


# --- varint frame ---------------------------------------------------------


def _write_varint(n: int, out: bytearray) -> None:
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    n = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7


START = (-1, -1)  # sentinel origin: beginning of document


def encode_ops(ops: list[tuple]) -> bytes:
    """ops: ("ins", (client, clock), origin_id_or_START, text) |
    ("del", (client, clock), target_id)."""
    out = bytearray(MAGIC)
    _write_varint(len(ops), out)
    for op in ops:
        if op[0] == "ins":
            _, (c, k), origin, text = op
            out.append(0)
            _write_varint(c, out)
            _write_varint(k, out)
            if origin == START:
                out.append(0)
            else:
                out.append(1)
                _write_varint(origin[0], out)
                _write_varint(origin[1], out)
            data = text.encode("utf-8")
            _write_varint(len(data), out)
            out += data
        else:
            _, (c, k), (tc, tk) = op
            out.append(1)
            _write_varint(c, out)
            _write_varint(k, out)
            _write_varint(tc, out)
            _write_varint(tk, out)
    return bytes(out)


def _parse_ops(blob: bytes) -> list[tuple]:
    if blob[: len(MAGIC)] != MAGIC:
        raise ValueError("bad magic")
    n, pos = _read_varint(blob, len(MAGIC))
    ops = []
    for _ in range(n):
        kind = blob[pos]
        pos += 1
        c, pos = _read_varint(blob, pos)
        k, pos = _read_varint(blob, pos)
        if kind == 0:
            has_origin = blob[pos]
            pos += 1
            origin = START
            if has_origin:
                oc, pos = _read_varint(blob, pos)
                ok_, pos = _read_varint(blob, pos)
                origin = (oc, ok_)
            ln, pos = _read_varint(blob, pos)
            text = blob[pos : pos + ln].decode("utf-8")
            pos += ln
            ops.append(("ins", (c, k), origin, text))
        elif kind == 1:
            tc, pos = _read_varint(blob, pos)
            tk, pos = _read_varint(blob, pos)
            ops.append(("del", (c, k), (tc, tk)))
        else:
            raise ValueError(f"bad op kind {kind}")
    return ops


# --- RGA integration ------------------------------------------------------


def fold_ops(ops: list[tuple]) -> str:
    """Integrate an op log into the converged document text.

    Document order is the depth-first walk of the origin tree with
    same-origin siblings sorted by DESCENDING id (so a later edit at the
    same spot lands before an earlier concurrent one — any fixed total
    order works; this one is pinned). The fold is a pure function of the
    op SET: arrival order cannot matter by construction, duplicate
    delivery is idempotent, and an op log whose origins never arrive (or
    deletes whose targets don't exist) raises instead of silently
    producing a partial document.

    >>> a = ("ins", (0, 0), START, "h")
    >>> b = ("ins", (0, 1), (0, 0), "i")
    >>> c = ("ins", (1, 0), START, "X")   # concurrent with a at start
    >>> d = ("del", (1, 1), (1, 0))
    >>> fold_ops([a, b, c, d])
    'hi'
    >>> fold_ops([d, c, b, a])  # any order converges
    'hi'
    >>> fold_ops([a, b, c])     # decoy X survives, ordered before 'hi'
    'Xhi'
    """
    nodes: dict[tuple, tuple] = {}  # id -> (text, origin)
    deleted: set[tuple] = set()
    for op in ops:
        if op[0] == "ins":
            oid = op[1]
            if oid in nodes and nodes[oid] != (op[3], op[2]):
                raise ValueError(f"conflicting redefinition of {oid}")
            nodes[oid] = (op[3], op[2])
        else:
            deleted.add(op[2])
    missing_targets = deleted - nodes.keys()
    if missing_targets:
        raise ValueError(f"deletes target unknown ids: {sorted(missing_targets)[:3]}")
    children: dict[tuple, list[tuple]] = {}
    for oid, (_, origin) in nodes.items():
        children.setdefault(origin, []).append(oid)
    for v in children.values():
        v.sort(reverse=True)
    out: list[str] = []
    seen = 0
    stack = list(children.get(START, []))
    stack.reverse()  # visit descending-id siblings left to right
    while stack:
        oid = stack.pop()
        seen += 1
        if oid not in deleted:
            out.append(nodes[oid][0])
        kids = children.get(oid, [])
        # push this node's subtree ABOVE its remaining siblings
        stack.extend(reversed(kids))
    if seen != len(nodes):
        raise ValueError(
            f"{len(nodes) - seen} ops unreachable (missing origins)"
        )
    return "".join(out)


def fold_documents(blobs: DataFrame) -> DataFrame:
    """(doc_id string, ops binary) -> FOLD_SCHEMA rows, error-isolated."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["ops"]):
                try:
                    ops = _parse_ops(bytes(blob))
                    rows.append((doc_id, True, fold_ops(ops), len(ops), None))
                except Exception as e:  # noqa: BLE001 — per-doc isolation
                    rows.append((doc_id, False, None, 0, str(e)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "ok", "text", "n_ops", "error"]
            )

    return blobs.select("doc_id", "ops").mapInPandas(gen, FOLD_SCHEMA)
