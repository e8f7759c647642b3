"""Property-based tests (hypothesis) for the pure-NumPy kernels.

The reference's test strategy has no property tests (SURVEY §5); these
harden the engine's kernels beyond the fixture corpus: arbitrary image
shapes, the full int64 phash domain, adversarial polygon/point geometry.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from jimmy_spark.codecs import decode_image, encode_image
from jimmy_spark.datagen.core import splitmix64
from jimmy_spark.functions import georef, hexgrid, s2, tiles
from jimmy_spark.functions.raycast import inside_ring

settings.register_profile("ci", max_examples=40, deadline=None)
settings.load_profile("ci")


@given(
    w=st.integers(1, 48),
    h=st.integers(1, 48),
    seed=st.integers(0, 2**31),
    fmt=st.sampled_from(["png", "bmp", "jpeg"]),
)
def test_codec_roundtrip_any_shape(w, h, seed, fmt):
    arr = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    out = decode_image(encode_image(arr, fmt), fmt)
    assert out.shape == (h, w, 3)
    if fmt in ("png", "bmp"):
        np.testing.assert_array_equal(out, arr)
    else:
        mse = ((arr.astype(float) - out.astype(float)) ** 2).mean()
        assert mse == 0 or 10 * np.log10(255.0**2 / mse) >= 40.0


@given(st.lists(st.integers(-(2**63), 2**63 - 1), min_size=1, max_size=200))
def test_georef_total_function_in_bounds(phashes):
    ph = np.array(phashes, dtype=np.int64)
    lat, lon = georef.latlon_e7_np(ph)
    assert (np.abs(lat) <= georef.LAT_MAX_E7).all()
    assert (np.abs(lon) <= georef.LON_MAX_E7).all()
    # deterministic
    lat2, lon2 = georef.latlon_e7_np(ph)
    np.testing.assert_array_equal(lat, lat2)
    np.testing.assert_array_equal(lon, lon2)


@given(
    lat=st.lists(st.integers(-850511287, 850511287), min_size=1, max_size=100),
    lon=st.lists(st.integers(-(1800000000), 1800000000), min_size=1, max_size=100),
    res=st.sampled_from([7, 8, 9]),
)
def test_hex_encode_containment(lat, lon, res):
    n = min(len(lat), len(lon))
    la = np.array(lat[:n], dtype=np.int64)
    lo = np.array(lon[:n], dtype=np.int64)
    cell = hexgrid.encode(la, lo, res)
    r2, q, r = hexgrid.unpack(cell)
    assert (r2 == res).all()
    np.testing.assert_array_equal(hexgrid.pack(res, q, r), cell)
    cy, cx = hexgrid.center(cell)
    d = np.hypot(cy - la, cx - lo)
    # every point lies within the circumradius of its cell center
    assert (d <= hexgrid.SIZES[res] * (1 + 1e-9)).all()


@given(
    lat=st.integers(-850511287, 850511287),
    lon=st.integers(-1800000000, 1800000000),
)
def test_s2_hierarchy_and_tiles_range(lat, lon):
    la = np.array([lat], dtype=np.int64)
    lo = np.array([lon], dtype=np.int64)
    c12 = s2.encode(la, lo, 12)
    c16 = s2.encode(la, lo, 16)
    assert s2.level_of(c12)[0] == 12 and s2.level_of(c16)[0] == 16
    assert s2.parent(c16, 12)[0] == c12[0]
    for z in tiles.ZOOMS:
        x, y = tiles.xy_np(la, lo, z)
        assert 0 <= x[0] < (1 << z) and 0 <= y[0] < (1 << z)


@given(
    cx=st.integers(-10**9, 10**9),
    cy=st.integers(-8 * 10**8, 8 * 10**8),
    r=st.integers(1000, 10**6),
    k=st.integers(3, 12),
    frac=st.floats(0.01, 0.95),
    ang=st.floats(0, 2 * np.pi),
)
def test_raycast_convex_geometry(cx, cy, r, k, frac, ang):
    """Points strictly inside a convex ring are inside; points far outside
    are outside; every vertex is inside (on-edge = inside)."""
    th = 2 * np.pi * np.arange(k) / k
    ring_x = (cx + r * np.cos(th)).astype(np.int64)
    ring_y = (cy + r * np.sin(th)).astype(np.int64)
    # interior point: centroid-ward at frac of the inradius
    inr = r * np.cos(np.pi / k) * frac * 0.9
    px = np.array([int(cx + inr * np.cos(ang))], dtype=np.int64)
    py = np.array([int(cy + inr * np.sin(ang))], dtype=np.int64)
    assert inside_ring(px, py, ring_x, ring_y)[0]
    far = np.array([int(cx + 3 * r)], dtype=np.int64)
    assert not inside_ring(far, np.array([cy], dtype=np.int64), ring_x, ring_y)[0]
    assert inside_ring(ring_x, ring_y, ring_x, ring_y).all()  # vertices


@given(st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=50))
def test_splitmix_deterministic_and_diffuse(xs):
    a = splitmix64(np.array(xs, dtype=np.uint64))
    b = splitmix64(np.array(xs, dtype=np.uint64))
    np.testing.assert_array_equal(a, b)
    if len(set(xs)) == len(xs):
        assert len(set(a.tolist())) == len(xs)  # injective on small sets


class TestMarkupProperties:
    """Property tests for the rewrite grammars: total functions over
    arbitrary text (never raise), deterministic, and no control bytes
    leak from the shielding placeholders."""

    from hypothesis import given, settings, strategies as st

    _text = st.text(
        alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFF),
        max_size=400,
    )

    @given(_text)
    @settings(max_examples=120, deadline=None)
    def test_grammars_total_and_deterministic(self, s):
        from jimmy_spark.functions import markup

        for fn in (
            markup.wiki_to_md, markup.tiddly_to_md, markup.roam_to_md,
            markup.bbcode_to_md, markup.html_to_md, markup.enml_to_md,
            markup.colornote_to_md, markup.cherrytree_to_md,
        ):
            a = fn(s)
            assert a == fn(s)  # deterministic
            assert isinstance(a, str)
            assert "\x00" not in a  # shield placeholders never leak

    @given(_text)
    @settings(max_examples=60, deadline=None)
    def test_plain_prose_passes_through_zim(self, s):
        """Text with no grammar tokens is untouched by the zim pipeline."""
        from hypothesis import assume

        from jimmy_spark.functions import markup

        assume(not any(t in s for t in (
            "''", "//", "[[", "{{", "[ ]", "[*]", "[x]", "[>]", "[<]",
            "__", "^{", "_{", "\t",
        )))
        assume("=" not in s and "\x00" not in s)
        assert markup.wiki_to_md(s) == s


class TestTwoStageArithmetic:
    """Pure-Python mirrors of the two-stage formulations (operators/
    ranks.py, queries._two_stage_pack): the bucket/shard decomposition
    must reproduce the naive global computation on ANY input."""

    @given(
        st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 10_000)),
            min_size=1, max_size=200, unique=True,
        ),
        st.integers(1, 64),
    )
    @settings(max_examples=80, deadline=None)
    def test_bucketed_rank_equals_global_rank(self, rows, width):
        # rows: (group, order_key) unique pairs
        naive = {}
        for g in {g for g, _ in rows}:
            for i, (_, k) in enumerate(
                sorted(((gg, kk) for gg, kk in rows if gg == g),
                       key=lambda t: t[1])
            ):
                naive[(g, k)] = i + 1
        # two-stage: bucket = k // width (order-preserving), local rank
        # within (g, bucket) + base = count of earlier buckets
        two = {}
        for g in {g for g, _ in rows}:
            ks = sorted(k for gg, k in rows if gg == g)
            from collections import defaultdict

            buckets = defaultdict(list)
            for k in ks:
                buckets[k // width].append(k)
            base = 0
            for b in sorted(buckets):
                for i, k in enumerate(sorted(buckets[b])):
                    two[(g, k)] = base + i + 1
                base += len(buckets[b])
        assert two == naive

    @given(
        st.lists(
            st.tuples(st.integers(0, 7), st.integers(1, 5000)),
            min_size=1, max_size=120,
        ),
        st.integers(1, 4096),
    )
    @settings(max_examples=80, deadline=None)
    def test_sharded_packing_seq_ids_disjoint_and_dense(self, docs, budget):
        """Per-shard packing with ceil-based bases: global seq ids within
        a group are exactly 0..total_seqs-1 with no overlap between
        shards, and every doc's (seq_id, offset) is consistent with its
        shard-local prefix sum."""
        from collections import defaultdict

        shards = defaultdict(list)  # shard -> [n_toks]
        for sh, n in docs:
            shards[sh].append(n)
        bases, seen = {}, 0
        for sh in sorted(shards):
            bases[sh] = seen
            total = sum(shards[sh])
            seen += -(-total // budget)  # ceil
        all_seq = []
        for sh in sorted(shards):
            start = 0
            for n in shards[sh]:
                seq = bases[sh] + start // budget
                off = start % budget
                assert 0 <= off < budget
                all_seq.append(seq)
                start += n
            # shard's max seq stays below the next shard's base
            if shards[sh]:
                assert max(
                    bases[sh] + s // budget
                    for s in _prefix_starts(shards[sh])
                ) < bases[sh] + -(-sum(shards[sh]) // budget)
        assert max(all_seq) < seen


def _prefix_starts(ns):
    s, out = 0, []
    for n in ns:
        out.append(s)
        s += n
    return out


class TestRingsIntersectProperties:
    """polyjoin.rings_intersect (pure numpy, the verify kernel) against
    the Fraction-exact oracle from test_polyjoin — adversarial small
    integer geometry where touch/collinear cases are dense."""

    from hypothesis import given, settings, strategies as st

    @staticmethod
    def _ring(rng_ints):
        """Star-shaped simple ring from hypothesis integers: center +
        sorted-angle offsets (guarantees a valid non-self-intersecting
        ring for the semantics under test)."""
        import math

        cx, cy, r, k, seed = rng_ints
        rnd = np.random.default_rng(seed)
        angles = np.sort(rnd.uniform(0, 2 * math.pi, size=k))
        return [
            (int(cx + max(1, rnd.uniform(0.3, 1.0) * r) * math.cos(a)),
             int(cy + max(1, rnd.uniform(0.3, 1.0) * r) * math.sin(a)))
            for a in angles
        ]

    @given(
        a=st.tuples(st.integers(-40, 40), st.integers(-40, 40),
                    st.integers(2, 30), st.integers(3, 8), st.integers(0, 2**20)),
        b=st.tuples(st.integers(-40, 40), st.integers(-40, 40),
                    st.integers(2, 30), st.integers(3, 8), st.integers(0, 2**20)),
    )
    @settings(max_examples=150, deadline=None)
    def test_matches_fraction_oracle(self, a, b):
        from jimmy_spark.operators import polyjoin
        from tests.test_polyjoin import _oracle_intersects

        ring_a = self._ring(a)
        ring_b = self._ring(b)
        ax = np.array([x for x, _ in ring_a], dtype=np.int64)
        ay = np.array([y for _, y in ring_a], dtype=np.int64)
        bx = np.array([x for x, _ in ring_b], dtype=np.int64)
        by = np.array([y for _, y in ring_b], dtype=np.int64)
        got = polyjoin.rings_intersect(ax, ay, bx, by)
        assert got == _oracle_intersects(ring_a, ring_b)
