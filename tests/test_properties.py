"""Property-based tests (hypothesis): operator invariants checked against
independent Python reference implementations on generated corpora.
Each example batch runs as ONE Spark job (rows generated together), so
the suite stays fast despite per-example JVM round-trips."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from sparkstreaming_realtime_project_spark.functions.text import text_match
from sparkstreaming_realtime_project_spark.operators import dedup as dd

# small alphabet -> forced token collisions between docs and queries
WORD = st.sampled_from(
    ["spark", "join", "data", "the", "ab", "x1", "Δδ", "小米", "小米11手机", "手机"]
)
TEXT = st.lists(WORD, min_size=0, max_size=12).map(" ".join)

SETTINGS = dict(max_examples=8, deadline=None)


def _py_tokens(s: str) -> list[str]:
    return [t for t in re.split(r"\s+", s.lower()) if t]


def _py_analyze(s: str) -> list[str]:
    """Independent CJK-aware reference: per-character tokens for Han/
    kana (char-by-char walk, no regex — deliberately a different
    mechanism than the engine's regexp_replace space-padding)."""
    out: list[str] = []
    for tok in s.lower().split():
        buf = ""
        for ch in tok:
            if (
                "\u4e00" <= ch <= "\u9fff"
                or "\u3400" <= ch <= "\u4dbf"
                or "\u3040" <= ch <= "\u30ff"
            ):
                if buf:
                    out.append(buf)
                    buf = ""
                out.append(ch)
            else:
                buf += ch
        if buf:
            out.append(buf)
    return out


def _py_shingles(s: str, n: int) -> list[str]:
    t = _py_tokens(s)
    if len(t) < n:
        return [" ".join(t)]
    seen, out = set(), []
    for i in range(len(t) - n + 1):
        g = " ".join(t[i : i + n])
        if g not in seen:
            seen.add(g)
            out.append(g)
    return out


@given(texts=st.lists(TEXT, min_size=1, max_size=20), query=TEXT)
@settings(**SETTINGS)
def test_text_match_equals_python_reference(spark, texts, query):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id int, text string")
    got = {
        r["id"]: r["m"]
        for r in df.select("id", text_match(F.col("text"), query).alias("m")).collect()
    }
    qtoks = set(_py_analyze(query))
    for i, t in enumerate(texts):
        expected = qtoks <= set(_py_analyze(t))
        assert got[i] == expected, (t, query)


@given(texts=st.lists(TEXT, min_size=1, max_size=20), n=st.integers(2, 4))
@settings(**SETTINGS)
def test_shingles_equal_python_reference(spark, texts, n):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id int, text string")
    sh = dd.with_shingles(df, "text", "id", n)
    got = {r["id"]: list(r["shingles"]) for r in sh.collect()}
    for i, t in enumerate(texts):
        assert got[i] == _py_shingles(t, n), (t, n)


@given(texts=st.lists(TEXT, min_size=1, max_size=25))
@settings(**SETTINGS)
def test_exact_dedup_partitions_corpus(spark, texts):
    """dedup_exact groups are a partition of the corpus: copies sum to the
    row count, one keeper per group, keeper is the min id of its group."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id int, text string")
    rows = dd.dedup_exact(df, "text", "id").collect()
    assert sum(r["n_copies"] for r in rows) == len(texts)
    by_text: dict[str, list[int]] = {}
    for i, t in enumerate(texts):
        by_text.setdefault(t, []).append(i)
    keepers = {min(ids) for ids in by_text.values()}
    assert {r["keeper_id"] for r in rows} == keepers


@given(texts=st.lists(TEXT, min_size=2, max_size=15))
@settings(**SETTINGS)
def test_jaccard_pairs_bounded_and_symmetric_ground(spark, texts):
    """Every reported pair: 0 < jaccard <= 1, doc_a < doc_b, and the value
    equals the Python set-Jaccard of the two shingle sets."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id int, text string")
    sh = dd.with_shingles(df, "text", "id", 2)
    pairs = dd.jaccard_pairs(sh, threshold=0.0).collect()
    pysh = {i: set(_py_shingles(t, 2)) for i, t in enumerate(texts)}
    for r in pairs:
        a, b = r["doc_a"], r["doc_b"]
        assert a < b
        inter = len(pysh[a] & pysh[b])
        union = len(pysh[a] | pysh[b])
        assert inter > 0  # only sharing pairs are candidates
        assert abs(r["jaccard"] - round(inter / union, 4)) < 1e-9


@given(texts=st.lists(TEXT, min_size=1, max_size=15))
@settings(**SETTINGS)
def test_simhash_signature_shape_and_identity(spark, texts):
    """Signatures are 16-char bitstrings; identical texts hash identically
    (hamming 0), so near-pair generation can never miss exact dups."""
    rows = [(i, t) for i, t in enumerate(texts)] + [
        (1000 + i, t) for i, t in enumerate(texts)  # exact copies
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    sigs = {
        r["id"]: r["sig"]
        for r in df.select(
            "id", dd.simhash_expr(F.col("text"), 16).alias("sig")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert len(sigs[i]) == 16 and set(sigs[i]) <= {"0", "1"}
        assert sigs[i] == sigs[1000 + i]


# --- as-of join vs a pure-Python point-in-time reference ---

ASOF_KEY = st.sampled_from(["a", "b", "c"])
ASOF_ROWS = st.lists(
    st.tuples(ASOF_KEY, st.integers(min_value=0, max_value=40)),
    min_size=1,
    max_size=25,
)


def _py_asof(left, right, strict):
    """For each left (k, ts): value of the right row with greatest
    (ts, ver) such that r_ts <= ts (or < when strict)."""
    out = []
    for k, ts in left:
        best = None  # (r_ts, ver)
        for j, (rk, r_ts) in enumerate(right):
            if rk != k:
                continue
            if (r_ts < ts) or (not strict and r_ts == ts):
                if best is None or (r_ts, j) > best:
                    best = (r_ts, j)
        out.append((k, ts, None if best is None else f"v{best[1]}"))
    return out


@given(left=ASOF_ROWS, right=ASOF_ROWS, strict=st.booleans())
@settings(**SETTINGS)
def test_asof_join_equals_python_reference(spark, left, right, strict):
    from sparkstreaming_realtime_project_spark.operators.joins import asof_join

    ldf = spark.createDataFrame(
        [(k, ts, i) for i, (k, ts) in enumerate(left)], "k string, ts long, lid int"
    )
    rdf = spark.createDataFrame(
        [(k, ts, i, f"v{i}") for i, (k, ts) in enumerate(right)],
        "k string, ts long, ver int, val string",
    )
    got = asof_join(
        ldf, rdf, on=["k"], left_ts="ts", right_ts="ts",
        value_cols=["val"], strict=strict, tiebreak=["ver"],
    )
    got_map = {r["lid"]: r["val"] for r in got.collect()}
    for (k, ts, want), (_, _, lid) in zip(
        _py_asof(left, right, strict),
        [(k, ts, i) for i, (k, ts) in enumerate(left)],
    ):
        assert got_map[lid] == want, (k, ts, strict)


def _py_lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


# strings built from a tiny alphabet with random point mutations so
# near-duplicate pairs (the interesting case) actually occur
_BASE = st.text(alphabet="abcx ", min_size=0, max_size=24)


@st.composite
def _mutated_corpus(draw):
    base = draw(st.lists(_BASE, min_size=2, max_size=8))
    out = list(base)
    for s in base:
        if draw(st.booleans()) and s:
            i = draw(st.integers(0, len(s) - 1))
            op = draw(st.sampled_from(["del", "sub", "ins"]))
            if op == "del":
                out.append(s[:i] + s[i + 1 :])
            elif op == "sub":
                out.append(s[:i] + "z" + s[i + 1 :])
            else:
                out.append(s[:i] + "z" + s[i:])
    return out


@given(texts=_mutated_corpus(), max_dist=st.integers(1, 2))
@settings(**SETTINGS)
def test_edit_distance_pairs_equal_brute_force(spark, texts, max_dist):
    """The ED-Join symmetric prefix filter is EXACT: the bucketed plan's
    pair set must equal brute-force all-pairs Levenshtein — no recall
    loss from prefix selection, length filter, or gram join."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["doc_a"], r["doc_b"], r["dist"])
        for r in dd.edit_distance_pairs(
            df, "text", "doc_id", max_dist=max_dist, q=2, key_len=30
        ).collect()
    }
    keys = [t.lower()[:30] for t in texts]
    want = set()
    for a in range(len(keys)):
        for b in range(a + 1, len(keys)):
            d = _py_lev(keys[a], keys[b])
            if d <= max_dist:
                want.add((a, b, d))
    assert got == want


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)),
        min_size=0,
        max_size=40,
    ),
)
@settings(max_examples=6, deadline=None)
def test_connected_components_equal_union_find(spark, edges):
    """Both CC implementations (hash-min propagation and large-star/
    small-star contraction) must agree with a pure-Python union-find on
    arbitrary random graphs — including self-loops, duplicate edges,
    isolated nodes, and long chains."""
    n_nodes = 26
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node id in component
    comp: dict[int, list[int]] = {}
    for v in range(n_nodes):
        comp.setdefault(find(v), []).append(v)
    truth = {v: min(members) for r, members in comp.items() for v in members}

    pairs = spark.createDataFrame(
        edges or [(0, 0)], "doc_a long, doc_b long"
    )
    if not edges:
        pairs = pairs.limit(0)
    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], "doc_id long")
    hm = {
        r["doc_id"]: r["cluster_id"]
        for r in dd.connected_components(pairs, nodes, max_iters=30).collect()
    }
    star = {
        r["doc_id"]: r["cluster_id"]
        for r in dd.connected_components_star(pairs, nodes).collect()
    }
    spark.catalog.clearCache()
    assert hm == truth
    assert star == truth


@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-100, max_value=100,
                allow_nan=False, allow_infinity=False, width=32,
            ),
            min_size=4, max_size=4,
        ),
        min_size=2, max_size=12,
    )
)
@settings(**SETTINGS)
def test_sq8_quantization_error_bound(spark, vecs):
    """SQ8's reconstruction error is bounded by half a quantization step
    per dimension: |v - q*s/127| <= s/254 (+ float eps) with s the
    per-dim max-abs scale — the accuracy contract behind the 1-byte/dim
    claim. Also: codes are always within [-127, 127]."""
    from sparkstreaming_realtime_project_spark.operators import similarity as sim

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id int, embedding array<double>",
    )
    scales = sim.sq8_scales(df)
    srow = scales.collect()[0]["__scales"]
    qz = df.crossJoin(F.broadcast(scales)).select(
        "vec_id",
        sim._sq8_quantize(sim.as_double_vec("embedding"), F.col("__scales")).alias("q"),
    )
    got = {r["vec_id"]: r["q"] for r in qz.collect()}
    for i, v in enumerate(vecs):
        for d, x in enumerate(v):
            q, s = got[i][d], srow[d]
            assert -127 <= q <= 127
            if s > 0:
                assert abs(float(x) - q * s / 127.0) <= s / 254.0 + 1e-9 * s
            else:
                assert q == 0


# PNG codec properties (no Spark needed: pure functions) ------------------


@given(
    w=st.integers(min_value=1, max_value=23),
    h=st.integers(min_value=1, max_value=17),
    color_type=st.sampled_from([0, 2]),
    data=st.data(),
)
@settings(max_examples=30, deadline=None)
def test_png_roundtrip_property(w, h, color_type, data):
    """encode -> decode is the identity for any 8-bit pixel buffer, and
    encoding is deterministic."""
    from sparkstreaming_realtime_project_spark.functions import png as pngc

    ch = 1 if color_type == 0 else 3
    px = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * ch, max_size=w * h * ch
            )
        )
    )
    enc = pngc.encode_png(px, w, h, color_type)
    dw, dh, dch, out = pngc.decode_png(enc)
    assert (dw, dh, dch) == (w, h, ch)
    assert bytes(out) == px
    assert pngc.encode_png(px, w, h, color_type) == enc


@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=12),
    nw=st.integers(min_value=1, max_value=12),
    nh=st.integers(min_value=1, max_value=12),
    data=st.data(),
)
@settings(max_examples=20, deadline=None)
def test_png_resize_nearest_property(w, h, nw, nh, data):
    """Nearest-neighbor resize: every output pixel equals the floor-mapped
    source pixel (checked against the direct index formula)."""
    from sparkstreaming_realtime_project_spark.functions import png as pngc

    px = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=w * h, max_size=w * h))
    )
    out = pngc.resize_nearest(w, h, 1, bytearray(px), nw, nh)
    assert len(out) == nw * nh
    for y in range(nh):
        for x in range(nw):
            assert out[y * nw + x] == px[(y * h // nh) * w + (x * w // nw)]


@given(
    ref=st.lists(st.integers(0, 50), min_size=2, max_size=8),
    cur=st.lists(st.integers(0, 50), min_size=2, max_size=8),
)
@settings(max_examples=10, deadline=None)
def test_psi_nonnegative_and_zero_iff_same_mix(spark, ref, cur):
    """PSI properties on arbitrary histograms: every (pa-pb)ln(pa/pb)
    term is nonnegative (sign(pa-pb) == sign(ln(pa/pb)), including the
    eps-substituted zero bins), so psi >= 0 always; and psi == 0 exactly
    when the two sides have identical bin proportions."""
    from sparkstreaming_realtime_project_spark.operators.validate import (
        psi_from_counts,
    )

    n = max(len(ref), len(cur))
    ref = (ref + [0] * n)[:n]
    cur = (cur + [0] * n)[:n]
    if sum(ref) == 0 or sum(cur) == 0:
        return  # a side with no rows is not a drift comparison
    rows = [("f", str(i), ref[i], cur[i]) for i in range(n)]
    counts = spark.createDataFrame(
        rows, "feature string, bin string, n_ref_bin long, n_cur_bin long"
    )
    out = psi_from_counts(counts).collect()
    assert len(out) == 1
    psi = out[0]["psi"]
    assert psi >= 0.0
    tr, tc = sum(ref), sum(cur)
    same_mix = all(
        ref[i] * tc == cur[i] * tr for i in range(n)
    )  # integer cross-multiplication: exact proportion equality
    if same_mix:
        assert psi == 0.0
    # the reverse implication is only true up to the 1e-4 output
    # rounding (a mix differing by one count in 400 has true PSI ~4e-5
    # -> rounds to 0.0), so check against a Python mirror of the exact
    # score instead of asserting psi==0 implies same_mix
    import math

    def prop(c, total):
        return c / total if c else 1e-6

    true_psi = sum(
        (prop(ref[i], tr) - prop(cur[i], tc))
        * math.log(prop(ref[i], tr) / prop(cur[i], tc))
        for i in range(n)
    )
    assert abs(psi - true_psi) <= 5e-5 + 1e-9  # within the rounding quantum


@given(texts=st.lists(TEXT, min_size=2, max_size=10), n=st.integers(2, 3),
       w=st.integers(2, 4))
@settings(**SETTINGS)
def test_winnow_guarantee_property(spark, texts, n, w):
    """The Schleimer et al. theorem as a hypothesis property: for ANY
    doc set and (n, w), every pair of docs sharing a positional token
    run of length >= w + n - 1 shares at least one winnowing
    fingerprint. (The small shared WORD alphabet makes shared runs
    common.)"""
    run_len = w + n - 1
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    fps = {
        r["id"]: set(r["fps"])
        for r in dd.winnow_fingerprints(
            docs, "text", "doc_id", n=n, w=w
        ).collect()
    }
    toks = [_py_tokens(t) for t in texts]
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            runs_i = {
                tuple(toks[i][a : a + run_len])
                for a in range(len(toks[i]) - run_len + 1)
            }
            runs_j = {
                tuple(toks[j][a : a + run_len])
                for a in range(len(toks[j]) - run_len + 1)
            }
            if runs_i & runs_j:
                assert fps[i] & fps[j], (i, j, n, w, texts[i], texts[j])


@given(
    n=st.integers(min_value=1, max_value=200),
    k=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=1, max_value=10**6),
)
@settings(**SETTINGS)
def test_ntile_exact_equals_python_ntile(spark, n, k, seed):
    """ntile_exact must reproduce SQL ntile semantics (first n%k tiles
    get ceil(n/k) rows) for arbitrary n, k — checked against a direct
    Python reference over a scrambled unique key order."""
    from sparkstreaming_realtime_project_spark.operators.distributed import (
        ntile_exact,
    )

    rows = [((i * seed) % (3 * n), i) for i in range(n)]
    df = spark.createDataFrame(rows, "v long, id long").repartition(5)
    got = {
        r["id"]: r["b"] for r in ntile_exact(df, ["v", "id"], k, "b").collect()
    }
    order = sorted(rows)  # (v, id) total order
    q, m = divmod(n, k)
    want = {}
    for r0, (_, i) in enumerate(order):
        r = r0 + 1
        if r <= m * (q + 1):
            want[i] = (r - 1) // (q + 1) + 1
        else:
            want[i] = m + (r - m * (q + 1) - 1) // max(q, 1) + 1
    assert got == want
    spark.catalog.clearCache()


@given(
    n=st.integers(min_value=1, max_value=300),
    seed=st.integers(min_value=1, max_value=10**6),
    neg=st.booleans(),
)
@settings(**SETTINGS)
def test_prefix_sums_equals_python_cumsum(spark, n, seed, neg):
    """prefix_sums must equal a direct Python cumulative sum over the
    sorted unique keys — including NEGATIVE values (the per-partition
    totals must come from true sums, not running-max shortcuts)."""
    from sparkstreaming_realtime_project_spark.operators.distributed import (
        prefix_sums,
    )

    rows = [
        ((i * seed) % (5 * n), (i % 9) - (4 if neg else 0))
        for i in range(n)
    ]
    # unique keys required: collapse duplicates by summing their values
    agg = {}
    for k, x in rows:
        agg[k] = agg.get(k, 0) + x
    df = spark.createDataFrame(
        list(agg.items()), "k long, x long"
    ).repartition(7)
    got = {
        r["k"]: r["x_cum"] for r in prefix_sums(df, ["k"], ["x"]).collect()
    }
    want, run = {}, 0
    for k in sorted(agg):
        run += agg[k]
        want[k] = run
    assert got == want
    spark.catalog.clearCache()


@given(texts=st.lists(TEXT, min_size=1, max_size=15))
@settings(**SETTINGS)
def test_stutter_trim_equals_python_reference(spark, texts):
    from sparkstreaming_realtime_project_spark.operators.textstats import (
        stutter_trim,
    )

    def py_trim(s: str):
        toks = s.split(" ")
        kept = [t for i, t in enumerate(toks) if i == 0 or t != toks[i - 1]]
        return len(toks), len(toks) - len(kept), " ".join(kept)

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string"
    )
    got = {
        r["id"]: (r["n_tokens"], r["n_stutter"], r["text_trimmed"])
        for r in stutter_trim(df, "text", "id").collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == py_trim(t), (t,)


URLISH = st.builds(
    lambda scheme, www, host, path, slash, q, frag: (
        scheme + www + host + "/" + path + slash + q + frag
    ),
    scheme=st.sampled_from(["http://", "https://", ""]),
    www=st.sampled_from(["www.", ""]),
    host=st.sampled_from(["Example.COM", "example.com", "a-b.org"]),
    path=st.from_regex(r"[a-z0-9/]{0,8}", fullmatch=True),
    slash=st.sampled_from(["/", ""]),
    q=st.sampled_from(["", "?utm_source=x", "?page=2", "?utm_campaign=a"]),
    frag=st.sampled_from(["", "#s1", "#x"]),
)


@given(urls=st.lists(URLISH, min_size=1, max_size=20))
@settings(**SETTINGS)
def test_canonical_url_idempotent_and_variant_insensitive(spark, urls):
    """canonical(canonical(u)) == canonical(u) (a canonical form must be
    a fixed point), and the canonical form never retains scheme, www,
    fragment or utm query."""
    from sparkstreaming_realtime_project_spark.operators.urls import (
        canonical_url,
    )

    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "id int, url string"
    )
    out = {
        r["id"]: (r["c1"], r["c2"])
        for r in df.select(
            "id",
            canonical_url(F.col("url")).alias("c1"),
            canonical_url(canonical_url(F.col("url"))).alias("c2"),
        ).collect()
    }
    for i, u in enumerate(urls):
        c1, c2 = out[i]
        assert c1 == c2, (u, c1, c2)
        assert not c1.startswith(("http://", "https://", "www."))
        assert "#" not in c1 and "utm_" not in c1
        assert not c1.endswith("/")


@given(texts=st.lists(TEXT, min_size=1, max_size=15), query=TEXT)
@settings(**SETTINGS)
def test_match_implies_highlight_marks(spark, texts, query):
    """Coherence of F9/F10: every row text_match accepts gets at least
    one <em> tag from highlight with the same query (each accepted row
    contains every analyzed query token, so the highlighter must hit),
    and highlight never changes a row's tag-stripped content."""
    import re as _re

    from sparkstreaming_realtime_project_spark.functions.text import (
        analyze_query,
        highlight,
        text_match,
    )

    if not analyze_query(query):
        return  # empty query matches everything and highlights nothing
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string"
    )
    rows = df.select(
        "id",
        "text",
        text_match(F.col("text"), query).alias("m"),
        highlight(F.col("text"), query).alias("h"),
    ).collect()
    for r in rows:
        if r["m"]:
            assert "<em>" in r["h"], (r["text"], query)
        assert _re.sub(r"</?em>", "", r["h"]) == r["text"]


# ------------------------------------------------------------------ r10 cont.
# Survival, graph and feature-engineering operators vs independent
# Python references.

DURS = st.lists(
    st.tuples(st.integers(0, 10), st.integers(0, 1)),
    min_size=1,
    max_size=30,
)


def _py_km(durs: list[tuple[int, int]]) -> dict[int, tuple[int, int, float]]:
    """Textbook KM by direct product of fractions (a different mechanism
    than the engine's scaled-integer ln prefix sum)."""
    n = len(durs)
    out = {}
    s = 1.0
    seen = 0
    for t in sorted({d for d, _ in durs}):
        c = sum(1 for d, _ in durs if d == t)
        dd = sum(1 for d, e in durs if d == t and e == 1)
        n_risk = n - seen
        seen += c
        if dd == 0:
            continue
        s = s * (1.0 - dd / n_risk) if dd < n_risk else 0.0
        out[t] = (n_risk, dd, s)
    return out


@given(durs=DURS)
@settings(max_examples=6, deadline=None)
def test_kaplan_meier_equals_python_reference(spark, durs):
    from sparkstreaming_realtime_project_spark.operators.survival import (
        kaplan_meier,
    )

    df = spark.createDataFrame(durs, "dur int, event int")
    got = {r.t: (r.n_risk, r.d_events, r.survival)
           for r in kaplan_meier(df).collect()}
    want = _py_km(durs)
    assert set(got) == set(want)
    for t, (n_risk, dd, s) in want.items():
        assert got[t][0] == n_risk and got[t][1] == dd, t
        # the engine's 1e9-scaled ln accumulation bounds the drift far
        # inside 1e-5 of the direct product
        assert abs(got[t][2] - s) < 1e-5, (t, got[t][2], s)


EDGE_NODES = st.sampled_from(list("abcdefg"))
EDGES = st.lists(
    st.tuples(EDGE_NODES, EDGE_NODES), min_size=1, max_size=20
).filter(lambda es: any(a != b for a, b in es))


@given(edges=EDGES, n_src=st.integers(1, 3), hops=st.integers(1, 4))
@settings(max_examples=8, deadline=None)
def test_bfs_hops_equals_python_reference(spark, edges, n_src, hops):
    from sparkstreaming_realtime_project_spark.operators.graph import bfs_hops

    und = edges + [(b, a) for a, b in edges]
    nodes = sorted({x for e in und for x in e})
    srcs = nodes[:n_src]
    # python BFS
    adj: dict = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
    want = {s: 0 for s in srcs}
    frontier = set(srcs)
    for h in range(1, hops + 1):
        frontier = {
            v for u in frontier for v in adj.get(u, ())
        } - set(want)
        for v in frontier:
            want[v] = h
        if not frontier:
            break
    edf = spark.createDataFrame(und, "src string, dst string")
    sdf = spark.createDataFrame([(s,) for s in srcs], "node string")
    out = bfs_hops(edf, sdf, max_hops=hops)
    got = {r.node: r.hops for r in out.collect()}
    out.unpersist()
    assert got == want


def _py_lpa(und: list[tuple[str, str]], iters: int) -> dict[str, str]:
    nodes = sorted({x for e in und for x in e})
    lbl = {v: v for v in nodes}
    for _ in range(iters):
        votes: dict = {v: {} for v in nodes}
        for a, b in und:  # directed vote a -> b
            votes[b][lbl[a]] = votes[b].get(lbl[a], 0) + 1
        for v in nodes:  # self-vote
            votes[v][lbl[v]] = votes[v].get(lbl[v], 0) + 1
        lbl = {
            v: min(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            for v, c in votes.items()
        }
    return lbl


@given(edges=EDGES, iters=st.integers(1, 3))
@settings(max_examples=8, deadline=None)
def test_label_propagation_equals_python_reference(spark, edges, iters):
    from sparkstreaming_realtime_project_spark.operators.graph import (
        label_propagation,
    )

    und = sorted({e for e in edges + [(b, a) for a, b in edges]})
    edf = spark.createDataFrame(und, "src string, dst string")
    out = label_propagation(edf, iters=iters)
    got = {r.node: r.community for r in out.collect()}
    out.unpersist()
    assert got == _py_lpa(und, iters)


MI_ROWS = st.lists(
    st.tuples(st.sampled_from("ab"), st.sampled_from("uvw")),
    min_size=1,
    max_size=40,
)


@given(rows=MI_ROWS)
@settings(max_examples=8, deadline=None)
def test_mutual_information_symmetric_and_nonnegative(spark, rows):
    from sparkstreaming_realtime_project_spark.operators.mlprep import (
        mutual_information,
    )

    df = spark.createDataFrame(rows, "x string, y string")
    a = mutual_information(df, "x", "y").collect()[0]
    b = mutual_information(df, "y", "x").collect()[0]
    # symmetry is exact: identical counts feed identical integer sums
    assert a.mi == b.mi
    assert a.h_x == b.h_y and a.h_y == b.h_x
    assert a.nmi == b.nmi
    # MI >= 0 up to the 1e-9-scaled ln rounding
    assert a.mi >= -1e-6
    # and bounded by each entropy (information can't exceed the source)
    if a.h_x is not None and a.h_y is not None:
        assert a.mi <= min(a.h_x, a.h_y) + 1e-6


def _py_maximal_common_spans(docs: dict, k: int, min_len: int):
    """Independent reference for suffix_span_pairs: for every doc pair,
    every maximal run of equal tokens a[i+t] == b[j+t] (t = 0..L-1) on
    a diagonal, L >= min_len AND containing at least one full k-window
    (L >= k). Brute-force O(n_a * n_b) diagonal walk — a deliberately
    different mechanism than the engine's gram join."""
    out = set()
    ids = sorted(docs)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = docs[ids[x]], docs[ids[y]]
            # walk each diagonal once: offsets j - i
            for diag in range(-(len(a) - 1), len(b)):
                i = max(0, -diag)
                j = i + diag
                run = 0
                while i <= len(a) and j <= len(b):
                    if i < len(a) and j < len(b) and a[i] == b[j]:
                        run += 1
                    else:
                        if run >= max(min_len, k):
                            out.add(
                                (ids[x], ids[y],
                                 i - run + 1, i,            # a 1-based incl
                                 j - run + 1, j, run)
                            )
                        run = 0
                    i += 1
                    j += 1
    return out


@given(
    texts=st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=40)
        .map(" ".join),
        min_size=2,
        max_size=5,
    )
)
@settings(**SETTINGS)
def test_suffix_span_pairs_equal_diagonal_walk(spark, texts):
    """suffix_span_pairs (uncapped) must equal the brute-force diagonal
    walk exactly: same pairs, same 1-based inclusive positions, same
    lengths. The 3-letter alphabet forces dense accidental repeats —
    the hard case for run merging (overlapping diagonals, within-pair
    multiple spans)."""
    k, min_len = 3, 4
    docs = {i: _py_tokens(t) for i, t in enumerate(texts)}
    want = _py_maximal_common_spans(docs, k=k, min_len=min_len)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = dd.suffix_span_pairs(
        df, "text", "doc_id", k=k, min_len=min_len, max_df=None
    )
    got = {
        (r.doc_a, r.doc_b, r.a_start, r.a_end, r.b_start, r.b_end, r.span_len)
        for r in out.collect()
    }
    assert got == want


@given(
    texts=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=10)
        .map(" ".join),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=4, deadline=None)
def test_bpe_train_distributed_property(spark, texts):
    """The distributed trainer must equal the single-node reference on
    GENERATED corpora too — small alphabets force dense count ties, the
    hard case for the (count DESC, pair ASC) argmax, and overlapping
    runs ('a a a') exercise the greedy-left recount."""
    from sparkstreaming_realtime_project_spark.functions import bpe

    docs = [_py_tokens(t) for t in texts]
    ref = bpe.train_merges(docs, n_merges=4)
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, t array<string>"
    )
    got = sorted(
        bpe.train_merges_distributed(df, "t", n_merges=4).collect(),
        key=lambda r: r.merge_rank,
    )
    assert [(r.merge_left, r.merge_right) for r in got] == ref


@given(
    texts=st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=30)
        .map(" ".join),
        min_size=2,
        max_size=6,
    ),
    cut=st.integers(1, 5),
)
@settings(**SETTINGS)
def test_streaming_suffix_equals_batch_uncapped(spark, texts, cut):
    """Sequential-ingest decomposition property: with no df-cap and
    id-ordered batches, the union of per-batch streaming span decisions
    (suffix_batch_against_store over an accumulating store) equals
    suffix_span_pairs on the whole corpus — for EVERY split point. The
    3-letter alphabet forces dense cross-batch accidental repeats, the
    hard case for the store-vs-sibling orientation."""
    from sparkstreaming_realtime_project_spark.streaming.incremental import (
        suffix_batch_against_store,
    )

    k, min_len = 3, 4
    cut = min(cut, len(texts) - 1)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    want = {
        tuple(r)
        for r in dd.suffix_span_pairs(
            df, "text", "doc_id", k=k, min_len=min_len, max_df=None
        ).collect()
    }
    store_anchors = store_gramdf = None
    got = set()
    for lo, hi in ((0, cut), (cut, len(texts))):
        batch = df.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        new_anchors = dd.suffix_anchors(batch, "text", "doc_id", k)
        new_gramdf = new_anchors.groupBy("g").agg(
            F.count(F.lit(1)).alias("n")
        )
        if store_anchors is None:
            sa = new_anchors.limit(0)
            sg = new_gramdf.limit(0)
        else:
            sa, sg = store_anchors, store_gramdf
        out = suffix_batch_against_store(
            new_anchors, sa, sg, k=k, min_len=min_len, max_df=None
        )
        got |= {tuple(r) for r in out.collect()}
        store_anchors = (
            new_anchors if store_anchors is None
            else store_anchors.unionByName(new_anchors)
        )
        store_gramdf = (
            new_gramdf if store_gramdf is None
            else store_gramdf.unionByName(new_gramdf)
        )
    assert got == want
