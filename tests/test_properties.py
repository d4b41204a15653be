"""Property-based tests (hypothesis): engine operators vs pure-Python
reference models on generated inputs — catches semantic edge cases the
fixture data never exercises (same-timestamp ties, all-delete keys,
empty sessions)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

# each example runs a Spark job — keep the count tight, the generated
# batches rich
_SETTINGS = dict(max_examples=8, deadline=None)

_OPS = ["c", "u", "d"]


@st.composite
def changelogs(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    rows = []
    for _ in range(n):
        rows.append(
            (
                draw(st.integers(min_value=0, max_value=5)),  # key (few → collisions)
                _OPS[draw(st.integers(min_value=0, max_value=2))],
                float(draw(st.integers(min_value=0, max_value=999))),
                draw(st.sampled_from(["F", "O", "P"])),
                draw(st.integers(min_value=0, max_value=10)),  # ts_ms (ties likely)
            )
        )
    return rows


def _reference_latest(rows):
    """Pure-python model of latest_per_key: max by (ts_ms, precedence)."""
    prec = {"c": 0, "u": 1, "d": 2}
    best = {}
    for key, op, price, status, ts in rows:
        rank = (ts, prec[op], price if price is not None else -1.0, status or "")
        if key not in best or rank > best[key][0]:
            best[key] = (rank, op, price, status, ts)
    return {
        (k, v[1], v[2], v[3], v[4]) for k, v in best.items() if v[1] != "d"
    }


@given(changelogs())
@settings(**_SETTINGS)
def test_latest_per_key_matches_reference(spark, rows):
    import pyspark.sql.functions as F  # noqa: F401
    from flink_realtime_2024_spark.sources.cdc import latest_per_key

    df = spark.createDataFrame(
        rows, "key bigint, op string, totalprice double, orderstatus string, ts_ms bigint"
    )
    got = {tuple(r) for r in latest_per_key(df).collect()}
    assert got == _reference_latest(rows)


@st.composite
def event_times(draw):
    n = draw(st.integers(min_value=1, max_value=30))
    # microsecond timestamps with gaps around the 10µs session boundary
    return sorted(
        draw(
            st.lists(
                st.integers(min_value=0, max_value=300),
                min_size=n,
                max_size=n,
                unique=True,
            )
        )
    )


def _reference_sessions(ts_list, gap):
    sessions = []
    cur = [ts_list[0]]
    for t in ts_list[1:]:
        if t - cur[-1] > gap:
            sessions.append(cur)
            cur = [t]
        else:
            cur.append(t)
    sessions.append(cur)
    return {(s[0], len(s)) for s in sessions}


@st.composite
def keyed_events(draw):
    n = draw(st.integers(min_value=2, max_value=25))
    rows = []
    for i in range(n):
        rows.append(
            (
                i,  # event_id
                draw(st.integers(min_value=0, max_value=2)),  # user_id
                draw(st.sampled_from(["purchase", "click"])),
                draw(st.integers(min_value=0, max_value=100)),  # ms
            )
        )
    return rows


def _reference_interval_pairs(rows, lo=10):
    pairs = set()
    for pid, pu, pt, pms in [r for r in rows if r[2] == "purchase"]:
        for cid, cu, ct, cms in [r for r in rows if r[2] == "click"]:
            if cu == pu and pms - lo <= cms <= pms:
                pairs.add((pid, cid))
    return pairs


@given(keyed_events())
@settings(**_SETTINGS)
def test_interval_join_matches_reference(spark, rows):
    """Keyed interval join == the quadratic reference model, boundary
    inclusive on both ends of [p.ms - 10, p.ms]."""
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, ms bigint"
    )
    p = df.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("user_id").alias("pu"), F.col("ms").alias("pms")
    )
    c = df.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id").alias("cu"), F.col("ms").alias("cms")
    )
    got = {
        (r["purchase_id"], r["click_id"])
        for r in p.join(
            c,
            (F.col("cu") == F.col("pu"))
            & F.col("cms").between(F.col("pms") - 10, F.col("pms")),
        ).collect()
    }
    assert got == _reference_interval_pairs(rows)


@given(event_times())
@settings(**_SETTINGS)
def test_session_window_matches_gaps_and_islands(spark, ts_list):
    """Spark session_window must agree with the gaps-and-islands model,
    including events exactly at the gap boundary: adjacent intervals
    MERGE (diff == gap stays in the session; only diff > gap splits)."""
    import pyspark.sql.functions as F

    gap_us = 10
    df = spark.createDataFrame([(t,) for t in ts_list], "us bigint").select(
        F.timestamp_micros(F.col("us")).alias("ts")
    )
    got = {
        (r["start_us"], r["n"])
        for r in df.groupBy(F.session_window("ts", f"{gap_us} microseconds"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_micros(F.col("session_window.start")).alias("start_us"), "n")
        .collect()
    }
    assert got == _reference_sessions(ts_list, gap_us)


@st.composite
def random_graphs(draw):
    n_edges = draw(st.integers(min_value=1, max_value=15))
    edges = []
    for _ in range(n_edges):
        a = draw(st.integers(min_value=0, max_value=11))
        b = draw(st.integers(min_value=0, max_value=11))
        if a != b:
            edges.append((min(a, b), max(a, b)))
    return edges or [(0, 1)]


def _reference_components(edges):
    """Union-find model: vertex → min id of its component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


@given(random_graphs())
@settings(**_SETTINGS)
def test_connected_components_matches_union_find(spark, edges):
    """Distributed min-label propagation must agree with a union-find
    model on arbitrary graphs: cycles, multi-edges, stars, chains."""
    from flink_realtime_2024_spark.operators.llm import connected_components

    df = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(df, "doc_a", "doc_b").collect()
    }
    assert got == _reference_components(edges)


@given(
    st.lists(
        st.lists(st.sampled_from("abc</w>x"), min_size=0, max_size=12),
        min_size=1, max_size=20,
    ),
    st.sampled_from("abcx"),
    st.sampled_from("abcx"),
)
@settings(max_examples=200, deadline=None)
def test_bpe_merge_pair_reference(seqs, a, b):
    """_bpe_merge_pair must be the canonical left-to-right
    non-overlapping rewrite: no (a,b) adjacency may survive unless its
    left symbol was itself produced by a merge this pass, and reversing
    the rewrite must reproduce the input."""
    from flink_realtime_2024_spark.operators.llm import _bpe_merge_pair

    merged = a + b
    for s in seqs:
        out = _bpe_merge_pair(list(s), a, b)
        # reversal: expanding merged symbols back yields the input
        rebuilt = []
        for tok in out:
            rebuilt.extend([a, b] if tok == merged and len(tok) > max(len(a), len(b)) else [tok])
        # guard: if 'merged' coincides with a pre-existing symbol value
        # the reversal is ambiguous — skip that case
        if merged not in s:
            assert rebuilt == list(s)
            # greedy non-overlap: walking the output left to right and
            # re-merging must be a no-op
            assert _bpe_merge_pair(out, a, b) == out or merged in (a, b)


def test_bpe_merge_expr_matches_reference(spark):
    """The JVM fold rewrite (_bpe_merge_expr, what bpe_train actually
    runs since r14) must equal _bpe_merge_pair on the adversarial
    shapes: self-pairs over runs ([a,a,a] with (a,a) — non-overlap),
    interleavings, merged-output collisions with pre-existing symbols,
    1-symbol arrays, and absent pairs."""
    from pyspark.sql import functions as F

    from flink_realtime_2024_spark.operators.llm import (
        _bpe_merge_expr,
        _bpe_merge_pair,
    )

    cases = [
        (["a", "a", "a"], "a", "a"),
        (["a", "a", "a", "a"], "a", "a"),
        (["a", "b", "a", "b"], "b", "a"),
        (["a", "b", "a", "b"], "a", "b"),
        (["ab", "a", "b"], "a", "b"),          # pre-existing token == merged
        (["a", "b", "ab", "a", "b"], "a", "b"),
        (["x"], "a", "b"),                      # 1-symbol array
        (["x", "y", "z"], "a", "b"),            # pair absent
        (["b", "a", "b", "b"], "b", "b"),
        (["a", "b", "b", "a", "b"], "b", "b"),
        (["</w>", "a", "</w>"], "a", "</w>"),
    ]
    # one Spark job over every (case, pair): group rows by pair so each
    # distinct pair gets its own column expression
    for a, b in sorted({(a, b) for _, a, b in cases}):
        rows = [(i, s) for i, (s, ca, cb) in enumerate(cases) if (ca, cb) == (a, b)]
        df = spark.createDataFrame(rows, "i int, syms array<string>")
        got = {
            r["i"]: list(r["out"])
            for r in df.select(
                "i", _bpe_merge_expr(F.col("syms"), a, b).alias("out")
            ).collect()
        }
        for i, s in rows:
            assert got[i] == _bpe_merge_pair(list(s), a, b), (s, a, b, got[i])


def test_bpe_rewrite_expr_matches_reference(spark):
    """The whole-batch JVM rewrite (_bpe_rewrite_expr — the REPLACE
    fast path plus the control-char fold fallback, what bpe_train's
    loop actually runs since r14) must equal sequential
    _bpe_merge_pair application in rank order, INCLUDING on rows whose
    symbols contain the delimiter control characters (which must route
    to the fold branch, never corrupt silently)."""
    from pyspark.sql import functions as F

    from flink_realtime_2024_spark.operators.llm import (
        _bpe_merge_pair,
        _bpe_rewrite_expr,
    )

    cases = [
        (["a", "a", "a", "a"], [("a", "a")]),            # non-overlap runs
        (["a", "b", "a", "b"], [("a", "b"), ("ab", "ab")]),  # chained batch
        (["l", "o", "w", "</w>"], [("l", "o"), ("lo", "w")]),
        (["x"], [("a", "b")]),                            # 1-symbol array
        (["ab", "a", "b"], [("a", "b")]),                 # merged == existing
        (["\x1ea", "b", "a", "b"], [("a", "b")]),         # open-delim symbol
        (["a", "\x1f", "a", "\x1f"], [("a", "\x1f")]),    # close-delim symbol
        (["\x1e", "\x1f"], [("\x1e", "\x1f")]),           # pure-delim symbols
    ]
    df = spark.createDataFrame(
        [(i, s) for i, (s, _) in enumerate(cases)], "i int, syms array<string>"
    )
    for i, (s, batch) in enumerate(cases):
        got = (
            df.filter(F.col("i") == i)
            .select(_bpe_rewrite_expr(F.col("syms"), batch).alias("out"))
            .collect()[0]["out"]
        )
        ref = list(s)
        for a, b in batch:
            ref = _bpe_merge_pair(ref, a, b)
        assert list(got) == ref, (s, batch, list(got), ref)


@st.composite
def wellformed_changelogs(draw):
    """Per key: one 'c', then 0-3 'u's, optionally a final 'd', at
    strictly increasing timestamps — the envelope sequence a real CDC
    source emits (Debezium guarantees per-key order). Prices/statuses
    arbitrary so group-migrating updates are generated."""
    rows = []
    for key in range(draw(st.integers(min_value=1, max_value=5))):
        ts = draw(st.integers(min_value=0, max_value=10))
        rows.append(
            (key, "c", float(draw(st.integers(0, 999))),
             draw(st.sampled_from(["F", "O", "P"])), ts)
        )
        for _ in range(draw(st.integers(min_value=0, max_value=3))):
            ts += 1 + draw(st.integers(0, 5))
            rows.append(
                (key, "u", float(draw(st.integers(0, 999))),
                 draw(st.sampled_from(["F", "O", "P"])), ts)
            )
        if draw(st.booleans()):
            ts += 1 + draw(st.integers(0, 5))
            rows.append((key, "d", None, None, ts))
    return rows


@given(wellformed_changelogs())
@settings(**_SETTINGS)
def test_retract_stream_invariants(spark, rows):
    """Two properties of the RowKind algebra on any well-formed
    changelog: (1) changelog_to_retract equals the pure-Python
    normalize model (before-images = previous envelope per key);
    (2) the IVM invariant — signed per-status aggregation over the
    retract stream equals aggregating the final materialized state,
    including group-migrating updates and deleted keys."""
    import pyspark.sql.functions as F
    from flink_realtime_2024_spark.operators._util import dec
    from flink_realtime_2024_spark.sources.cdc import changelog_to_retract

    df = spark.createDataFrame(
        rows, "key bigint, op string, totalprice double, orderstatus string, ts_ms bigint"
    )
    got = {
        (r["key"], r["kind"], r["price"], r["status"], r["sign"], r["ts_ms"])
        for r in changelog_to_retract(df).collect()
    }

    # reference normalize
    want = set()
    by_key: dict = {}
    for key, op, price, status, ts in sorted(
        rows, key=lambda r: (r[0], r[4], {"c": 0, "u": 1, "d": 2}[r[1]])
    ):
        prev = by_key.get(key)
        if op == "c":
            want.add((key, "+I", price, status, 1, ts))
        elif op == "u":
            want.add((key, "-U", prev[0], prev[1], -1, ts))
            want.add((key, "+U", price, status, 1, ts))
        else:
            want.add((key, "-D", prev[0], prev[1], -1, ts))
        by_key[key] = (price, status)
    assert got == want

    # IVM invariant: signed aggregate == aggregate of live final images
    agg = {
        r["status"]: (r["n"], round(r["v"], 4))
        for r in changelog_to_retract(df)
        .groupBy("status")
        .agg(
            F.sum("sign").alias("n"),
            F.sum(F.col("sign") * dec("price")).cast("double").alias("v"),
        )
        .collect()
        if r["n"] != 0 or round(r["v"], 4) != 0.0
    }
    live: dict = {}
    for key, op, price, status, ts in sorted(
        rows, key=lambda r: (r[0], r[4], {"c": 0, "u": 1, "d": 2}[r[1]])
    ):
        if op == "d":
            live.pop(key, None)
        else:
            live[key] = (price, status)
    expect: dict = {}
    for price, status in live.values():
        n, v = expect.get(status, (0, 0.0))
        expect[status] = (n + 1, round(v + price, 4))
    assert agg == {s: (n, v) for s, (n, v) in expect.items()}


@st.composite
def merge_batches(draw):
    """1-3 changelog batches over a small key space: ops arbitrary per
    batch (latest-in-batch wins by ts), ts strictly increasing across
    rows so per-key ordering is deterministic."""
    ts = 0
    batches = []
    for _ in range(draw(st.integers(1, 3))):
        rows = []
        for _ in range(draw(st.integers(1, 12))):
            ts += 1
            op = draw(st.sampled_from(["c", "u", "d"]))
            rows.append(
                (
                    draw(st.integers(0, 7)),
                    op,
                    None if op == "d" else float(draw(st.integers(0, 99))),
                    None if op == "d" else draw(st.sampled_from(["F", "O"])),
                    ts,
                )
            )
        batches.append(rows)
    return batches


@given(merge_batches())
@settings(**_SETTINGS)
def test_lakehouse_merge_matches_dict_state(spark, batches):
    """Any sequence of MERGE commits must leave the table equal to a
    trivial dict-state replay of the same batches (latest image per
    key, deletes drop) — stats pruning, file carry-over, and in-batch
    dedup can never change semantics."""
    import tempfile

    from flink_realtime_2024_spark.plans.lakehouse import LakeTable

    schema = "key bigint, op string, totalprice double, orderstatus string, ts_ms bigint"
    state: dict = {}
    table = None
    for rows in batches:
        for key, op, price, status, ts in sorted(rows, key=lambda r: r[4]):
            if op == "d":
                state.pop(key, None)
            else:
                state[key] = (op, price, status, ts)
        df = spark.createDataFrame(rows, schema)
        if table is None:
            table = LakeTable.create(
                __import__(
                    "flink_realtime_2024_spark.sources.cdc", fromlist=["latest_per_key"]
                ).latest_per_key(df),
                tempfile.mkdtemp(prefix="lake_prop_"),
                "key",
                n_files=3,
            )
        else:
            table.merge(spark, df)
    got = {
        r["key"]: (r["op"], r["totalprice"], r["orderstatus"], r["ts_ms"])
        for r in table.read(spark).collect()
    } if state else None
    if state:
        assert got == state, (got, state)
    else:
        # empty state: the snapshot may be legitimately empty
        try:
            assert table.read(spark).count() == 0
        except ValueError:
            pass  # empty-snapshot read rejects loudly — also correct


@given(merge_batches())
@settings(**_SETTINGS)
def test_lakehouse_snapshot_diff_matches_dict_diff(spark, batches):
    """snapshot_diff(v0, latest) must equal the dict-state diff of the
    replayed batches: +I for keys absent at v0, -D for keys gone, U for
    changed images — and nothing for keys merely rewritten unchanged."""
    import tempfile

    from flink_realtime_2024_spark.plans.lakehouse import LakeTable, snapshot_diff
    from flink_realtime_2024_spark.sources.cdc import latest_per_key

    schema = "key bigint, op string, totalprice double, orderstatus string, ts_ms bigint"

    def replay(state, rows):
        for key, op, price, status, ts in sorted(rows, key=lambda r: r[4]):
            if op == "d":
                state.pop(key, None)
            else:
                state[key] = (op, price, status, ts)
        return state

    s0 = replay({}, batches[0])
    if not s0:
        return  # empty creation snapshot: read() rejects, nothing to diff
    table = LakeTable.create(
        latest_per_key(spark.createDataFrame(batches[0], schema)),
        tempfile.mkdtemp(prefix="lake_dprop_"),
        "key",
        n_files=3,
    )
    s_end = dict(s0)
    for rows in batches[1:]:
        table.merge(spark, spark.createDataFrame(rows, schema))
        replay(s_end, rows)

    want = {}
    for k in set(s0) | set(s_end):
        if k not in s0:
            want[k] = "+I"
        elif k not in s_end:
            want[k] = "-D"
        elif s0[k] != s_end[k]:
            want[k] = "U"
    v = table.latest_version()
    if v == 0 or not want:
        return  # identical snapshots: diff() rejects loudly by design
    got = {r["key"]: r["kind"] for r in snapshot_diff(spark=spark, table=table, v_from=0, v_to=v).collect()}
    assert got == want, (got, want)


@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=2**32 - 1),
    st.booleans(),
)
@settings(max_examples=25, deadline=None)
def test_jpeg_roundtrip_bounded_error(h, w, seed, subsample):
    """Any dimensions (including 1×1 and non-multiples of 8/16), any
    content, either sampling mode: decode(encode(px)) must return the
    exact input shape with bounded error (q95 quant steps are small;
    4:2:0 adds chroma-averaging loss). Guards padding/crop/MCU
    arithmetic across the whole size space, not just picked shapes."""
    import numpy as np

    from flink_realtime_2024_spark.operators._jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(seed)
    # smooth-ish content: random low-res upsampled (JPEG's design target)
    base = rng.randint(0, 256, size=((h + 3) // 4, (w + 3) // 4, 3))
    px = np.clip(
        np.kron(base, np.ones((4, 4, 1)))[:h, :w].astype(np.float64)
        + rng.normal(scale=3, size=(h, w, 3)),
        0,
        255,
    ).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(px, 95, subsample=subsample))
    assert dec.shape == (h, w, 3)
    err = np.abs(dec.astype(np.int64) - px.astype(np.int64))
    bound = 48 if subsample else 32  # chroma averaging adds local error
    assert err.max() <= bound, (h, w, subsample, int(err.max()))
    assert err.mean() <= 8, (h, w, subsample, float(err.mean()))


@given(st.lists(st.tuples(st.integers(0, 2**16 - 1), st.integers(0, 2**16 - 1)),
                min_size=1, max_size=50))
@settings(max_examples=50, deadline=None)
def test_zorder_interleave_bijective(pairs):
    """The Morton key must be a bijection on 16-bit pairs (no two cells
    collide) and preserve the quadrant hierarchy: equal high bits of
    (a, b) ⇒ equal high bits of z — the property file-level pruning
    relies on (a z-range maps to a bounded rectangle)."""

    def z_py(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i + 1)
            z |= ((b >> i) & 1) << (2 * i)
        return z

    seen = {}
    for a, b in pairs:
        z = z_py(a, b)
        assert seen.setdefault(z, (a, b)) == (a, b), "collision"
        # quadrant property: top k bit-pairs of z == interleave of top k bits
        for k in (1, 4, 8):
            hi = z >> (2 * (16 - k))
            assert hi == z_py(a >> (16 - k), b >> (16 - k)), (a, b, k)


@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=256))
@settings(max_examples=50, deadline=None)
def test_mulaw_roundtrip_error_bound(samples):
    """G.711 μ-law: expand(compress(x)) must stay within the segment's
    quantization step (≤ 2^(seg+3) ≈ |x|/16 + constant) and preserve
    sign — the codec's spec guarantee, on arbitrary int16 input."""
    import numpy as np

    from flink_realtime_2024_spark.operators.multimodal import (
        _mulaw_compress,
        _mulaw_expand,
    )

    x = np.array(samples, dtype=np.int16)
    y = _mulaw_expand(_mulaw_compress(x))
    err = np.abs(y.astype(np.int64) - np.clip(x.astype(np.int64), -32635, 32635))
    bound = np.abs(x.astype(np.int64)) / 16 + 132
    assert (err <= bound).all(), int(err.max())
    nz = np.abs(x) > 132  # below the bias the codec may flush toward 0
    assert (np.sign(y[nz]) == np.sign(x[nz])).all()


@given(st.lists(st.text(alphabet="abc", min_size=1, max_size=6), min_size=2,
                max_size=12, unique=True))
@settings(**_SETTINGS)
def test_fuzzy_pairs_matches_brute_levenshtein(spark, names):
    """Deletion-neighborhood blocking on ARBITRARY short strings must
    equal the O(n²) levenshtein scan at distance ≤ 1 — exactness is a
    construction guarantee, not fixture luck."""
    from flink_realtime_2024_spark.operators.llm import fuzzy_pairs_dist1

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    truth = set()
    ns = sorted(names)
    for i, a in enumerate(ns):
        for b in ns[i + 1 :]:
            d = lev(a, b)
            if d <= 1:
                truth.add((a, b, d))
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = {
        (r["name_a"], r["name_b"], r["dist"]) for r in fuzzy_pairs_dist1(df).collect()
    }
    assert got == truth, (sorted(got - truth)[:5], sorted(truth - got)[:5])


@given(
    st.lists(st.text(alphabet="abz", min_size=1, max_size=5), min_size=2, max_size=10),
)
@settings(max_examples=6, deadline=None)
def test_bpe_train_fuzzed_vs_reference(spark, words):
    """Batched distributed BPE on RANDOM tiny corpora must equal the
    sequential pure-Python reference — fuzzes the non-interacting-batch
    acceptance bound over adversarial tie/conflict structures the
    fixture corpora don't produce."""
    from flink_realtime_2024_spark.operators.llm import bpe_train
    from .test_semantics import _bpe_reference

    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id bigint, text string"
    )
    counts: dict = {}
    for w in words:
        counts[w] = counts.get(w, 0) + 1
    ref, _ = _bpe_reference(counts, n_merges=5)
    got = [
        (r["merge_rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_train(docs, n_merges=5).orderBy("merge_rank").collect()
    ]
    assert got == ref


@given(changelogs(), st.integers(0, 10))
@settings(**_SETTINGS)
def test_merge_upsert_split_equivalence(spark, rows, split_ts):
    """Applying a changelog in two EVENT-TIME-ORDERED batches through
    merge_upsert must equal the one-shot latest-per-key materialization
    for ANY split point — the invariant dim_upsert and the lakehouse
    MERGE path rely on."""
    from flink_realtime_2024_spark.sources.cdc import latest_per_key, merge_upsert

    schema = "key bigint, op string, totalprice double, orderstatus string, ts_ms bigint"
    df = spark.createDataFrame(rows, schema)
    one_shot = {
        (r["key"], r["totalprice"], r["orderstatus"])
        for r in latest_per_key(df).collect()
    }
    b0 = df.filter(df.ts_ms < split_ts)
    b1 = df.filter(df.ts_ms >= split_ts)
    dim = None
    for batch in (b0, b1):
        if batch.isEmpty():
            continue
        dim = merge_upsert(dim, batch)
    got = (
        {(r["key"], r["totalprice"], r["orderstatus"]) for r in dim.collect()}
        if dim is not None
        else set()
    )
    assert got == one_shot


@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=3,
        max_size=30,
    ).filter(lambda es: any(a != b for a, b in es)),
)
@settings(max_examples=6, deadline=None)
def test_pagerank_micro_units_close_to_float(spark, raw_edges):
    """The BIGINT micro-unit fixpoint is an APPROXIMATION of float
    PageRank (floor-division sheds ≤1 micro-unit per term) — assert
    the drift stays ≤ iters · max_degree micro-units of the float
    reference on random small graphs, so the exact-oracle trick can't
    silently diverge from the real algorithm."""
    import numpy as np

    import pyspark.sql.functions as F

    # undirected, deduped, no self-loops — the operator's edge shape
    edges = sorted({(a, b) for a, b in raw_edges if a != b} | {
        (b, a) for a, b in raw_edges if a != b
    })
    nodes = sorted({a for a, _ in edges})
    n = len(nodes)
    deg = {a: sum(1 for x, _ in edges if x == a) for a in nodes}

    # float reference
    pr = {a: 1.0 / n for a in nodes}
    for _ in range(8):
        nxt = {a: 0.15 / n for a in nodes}
        for a, b in edges:
            nxt[b] += 0.85 * pr[a] / deg[a]
        pr = nxt

    # integer micro-unit replay (the operator's arithmetic, in python)
    scale = 10**12
    base = scale // n
    tele = (15 * base) // 100
    pri = {a: base for a in nodes}
    for _ in range(8):
        nxt = {a: 0 for a in nodes}
        for a, b in edges:
            nxt[b] += pri[a] // deg[a]
        pri = {a: tele + (85 * v) // 100 for a, v in nxt.items()}

    max_deg = max(deg.values())
    for a in nodes:
        drift_units = abs(pri[a] - pr[a] * scale)
        assert drift_units <= 8 * (max_deg + 2) * 2, (a, drift_units)


@given(
    st.text(alphabet="abcd ", min_size=60, max_size=200),
    st.integers(0, 40),
    st.integers(0, 40),
)
@settings(max_examples=40, deadline=None)
def test_winnow_shared_substring_guarantee(shared, pre_n, post_n):
    """Schleimer et al.'s winnowing theorem, fuzzed: two documents
    sharing ANY substring of length ≥ k + w − 1 must share at least one
    selected fingerprint — here the shared block is embedded at random
    offsets inside different noise prefixes/suffixes."""
    from flink_realtime_2024_spark.operators.llm import (
        _WINNOW_K,
        _WINNOW_W,
        _winnow_fingerprints,
    )

    if len(shared) < _WINNOW_K + _WINNOW_W - 1:
        return
    doc_a = "x" * pre_n + shared + "y" * post_n
    doc_b = "z" * post_n + shared + "w" * pre_n
    fa = set(_winnow_fingerprints(doc_a).tolist())
    fb = set(_winnow_fingerprints(doc_b).tolist())
    assert fa & fb, (shared[:30], pre_n, post_n)


# --- distributed rank / prefix-sum helpers vs the single-task windows ---------
#
# The round-6 helpers replace Window.orderBy() (one task, whole frame);
# these property tests pin EXACT equivalence to the windows they replace
# on adversarial shapes: duplicates (bucket-boundary ties), skew (most
# mass in one bucket), negatives, and frames smaller than n_buckets.


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-50, max_value=50), min_size=1, max_size=120
    )
)
def test_distributed_row_number_equals_window(spark, xs):
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from flink_realtime_2024_spark.operators._util import distributed_row_number

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(xs)], "id bigint, v bigint"
    )
    want = {
        (r["id"], r["rn"])
        for r in df.select(
            "id", F.row_number().over(Window.orderBy("v", "id")).alias("rn")
        ).collect()
    }
    got = {
        (r["id"], r["rn"])
        for r in distributed_row_number(
            df, key=F.col("v"), order_by=["v", "id"], out="rn", n_buckets=4
        )
        .select("id", "rn")
        .collect()
    }
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-20, max_value=20),
            st.integers(min_value=0, max_value=3),
        ),
        min_size=1,
        max_size=100,
    )
)
def test_distributed_row_number_partitioned_equals_window(spark, rows):
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from flink_realtime_2024_spark.operators._util import distributed_row_number

    df = spark.createDataFrame(
        [(i, v, f"g{g}") for i, (v, g) in enumerate(rows)],
        "id bigint, v bigint, g string",
    )
    want = {
        (r["id"], r["rn"])
        for r in df.select(
            "id",
            F.row_number()
            .over(Window.partitionBy("g").orderBy("v", "id"))
            .alias("rn"),
        ).collect()
    }
    got = {
        (r["id"], r["rn"])
        for r in distributed_row_number(
            df,
            key=F.col("v"),
            order_by=["v", "id"],
            partition_by=("g",),
            out="rn",
            n_buckets=4,
        )
        .select("id", "rn")
        .collect()
    }
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=100
    )
)
def test_distributed_running_sum_equals_window(spark, xs):
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from flink_realtime_2024_spark.operators._util import distributed_running_sum

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(xs)], "id bigint, v bigint"
    ).withColumn("d", F.col("v").cast("decimal(18,4)"))
    w = Window.orderBy("v", "id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {
        (r["id"], str(r["cum"]), str(r["tot"]))
        for r in df.select(
            "id",
            F.sum("d").over(w).alias("cum"),
            F.sum("d").over(Window.partitionBy()).alias("tot"),
        ).collect()
    }
    got = {
        (r["id"], str(r["cum"]), str(r["tot"]))
        for r in distributed_running_sum(
            df,
            key=F.col("v"),
            order_by=["v", "id"],
            val=F.col("d"),
            out="cum",
            total_out="tot",
            n_buckets=4,
        )
        .select("id", "cum", "tot")
        .collect()
    }
    assert got == want


@settings(max_examples=20, deadline=None)
@given(st.integers(min_value=1, max_value=500), st.integers(min_value=1, max_value=8))
def test_ntile_from_rank_matches_sql_ntile(spark, n, k):
    """Closed-form NTILE from a global rank == F.ntile for every (n, k):
    the first n%k tiles take ceil(n/k) rows, the rest floor(n/k)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from flink_realtime_2024_spark.operators._util import ntile_from_rank

    df = spark.range(1, n + 1).select(F.col("id").alias("r"))
    got = df.select(
        "r",
        ntile_from_rank(F.col("r"), n, k).alias("a"),
        F.ntile(k).over(Window.orderBy("r")).alias("b"),
    )
    assert got.filter(F.col("a") != F.col("b")).count() == 0


@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=2**32 - 1),
    st.booleans(),
    st.sampled_from([30, 60, 85, 95]),
)
@settings(max_examples=25, deadline=None)
def test_jpeg_progressive_equals_baseline_decode(h, w, seed, subsample, quality):
    """PROPERTY (round-7): for any dimensions, content, sampling mode,
    and quality, the progressive (SOF2) encoding must decode
    BIT-IDENTICALLY to the baseline (SOF0) encoding of the same pixels
    — both paths share the color/quant pipeline, so any divergence is
    an entropy-coding bug (DC/AC successive approximation, EOB runs,
    ZRL-in-refinement, ceil-vs-padded grid arithmetic)."""
    import numpy as np

    from flink_realtime_2024_spark.operators._jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(seed)
    base = rng.randint(0, 256, size=((h + 3) // 4, (w + 3) // 4, 3))
    px = np.clip(
        np.kron(base, np.ones((4, 4, 1)))[:h, :w].astype(np.float64)
        + rng.normal(scale=3, size=(h, w, 3)),
        0,
        255,
    ).astype(np.uint8)
    if seed % 3 == 0:
        px = px[:, :, 0]  # grayscale path
        subsample = False
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(px, quality, subsample=subsample)),
        decode_jpeg(encode_jpeg(px, quality, subsample=subsample)),
    )


@given(st.lists(st.integers(0, 100000), min_size=1, max_size=64))
@settings(max_examples=100, deadline=None)
def test_exp_golomb_roundtrip(values):
    """ue(v) write→read is the identity on arbitrary value sequences —
    the H.264 SPS parse rests on this bit arithmetic."""
    from flink_realtime_2024_spark.operators._mpeg import _BitReader, _BitWriter

    w = _BitWriter()
    for v in values:
        w.ue(v)
    r = _BitReader(w.rbsp_trailing())
    assert [r.ue() for _ in values] == values


@given(st.binary(min_size=0, max_size=256))
@settings(max_examples=100, deadline=None)
def test_emulation_prevention_roundtrip(raw):
    """EBSP strip∘insert is the identity on arbitrary bytes, and the
    inserted form never contains a start-code-emulating 00 00 0[0-3]."""
    from flink_realtime_2024_spark.operators._mpeg import _ep_insert, _ep_strip

    eb = _ep_insert(raw)
    assert _ep_strip(eb) == raw
    for i in range(len(eb) - 2):
        assert not (eb[i] == 0 and eb[i + 1] == 0 and eb[i + 2] <= 2), eb.hex()


@st.composite
def dup_corpora(draw):
    """Small corpora with duplicate families + perturbations, plus a
    tiny bucket cap, so the LSH segmentation path (chains, star,
    family stitch — r11) is exercised on shapes the hand-built
    fixtures never hit: families larger than several caps, mixed
    exact/perturbed replicas, singleton noise docs."""
    vocab = [
        "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
        "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
        "oscar", "papa", "quebec", "romeo", "sierra", "tango",
    ]
    n_base = draw(st.integers(min_value=2, max_value=4))
    bases = []
    for _ in range(n_base):
        k = draw(st.integers(min_value=4, max_value=10))
        bases.append(
            " ".join(draw(st.sampled_from(vocab)) for _ in range(k))
        )
    n_docs = draw(st.integers(min_value=6, max_value=16))
    rows = []
    for i in range(n_docs):
        text = bases[draw(st.integers(min_value=0, max_value=n_base - 1))]
        if draw(st.booleans()):  # perturbed replica
            text = text + " " + draw(st.sampled_from(vocab))
        rows.append((i + 1, text))
    cap = draw(st.sampled_from([2, 3, 4, 8]))
    return rows, cap


@given(dup_corpora())
@settings(max_examples=5, deadline=None)
def test_lsh_kernels_match_oracles_on_generated_corpora(spark, corpus):
    """Cross-engine property: on generated duplicate-family corpora
    with tiny bucket caps, the Spark kernels and the generated DuckDB
    oracles emit IDENTICAL pair sets — segmentation hash, chain order,
    star/stitch algebra, and verify thresholds all in lockstep (r11).
    Every example forces oversized buckets (families >> cap)."""
    import tempfile

    import duckdb

    from flink_realtime_2024_spark.operators.llm import (
        _minhash_oracle_sql,
        _simhash_oracle_sql,
        minhash_pairs,
        simhash_pairs,
    )

    rows, cap = corpus
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    path = tempfile.mkdtemp(prefix="lsh_prop_") + "/docs.parquet"
    docs.write.mode("overwrite").parquet(path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    mh_oracle = {
        (r[0], r[1], float(r[2]))
        for r in con.execute(_minhash_oracle_sql(bucket_cap=cap)).fetchall()
    }
    mh_got = {
        (r[0], r[1], float(r[2]))
        for r in minhash_pairs(docs, bucket_cap=cap).collect()
    }
    assert mh_got == mh_oracle, (
        f"cap={cap} spark-only={sorted(mh_got - mh_oracle)} "
        f"oracle-only={sorted(mh_oracle - mh_got)}"
    )
    sh_oracle = {
        tuple(r)
        for r in con.execute(
            _simhash_oracle_sql("b6k3", bucket_cap=cap)
        ).fetchall()
    }
    sh_got = {
        tuple(r)
        for r in simhash_pairs(docs, scheme="b6k3", bucket_cap=cap).collect()
    }
    assert sh_got == sh_oracle, (
        f"cap={cap} spark-only={sorted(sh_got - sh_oracle)} "
        f"oracle-only={sorted(sh_oracle - sh_got)}"
    )
    con.close()


@st.composite
def unicode_docs(draw):
    """Documents mixing plain words with adversarial codepoints for the
    lower()/tokenize/md5 path: case-mapping specials (İ ı ß ẞ Σ σ ς),
    combining marks, ligatures, CJK, emoji/astral, and every whitespace
    class the pinned tokenizer must (and must not) split on."""
    special = st.sampled_from(
        ["İ", "ı", "ß", "ẞ", "Σ", "σ", "ς", "ﬁ", "ﬀ", "ǅ", "ǋ",
         "é", "é", "中文", "日本語", "🦀", "𝔘𝔫𝔦", "Ⅻ",
         " ", "\t", "\n", "\r", "\x0b", "\x0c", " ", " "]
    )
    word = st.one_of(
        st.text(alphabet="abcdefgh01 ", min_size=0, max_size=12),
        special,
        st.text(min_size=0, max_size=6),  # fully random unicode
    )
    n = draw(st.integers(min_value=0, max_value=12))
    return [
        (i, draw(st.one_of(st.none(), st.tuples(*[word] * 4).map(" ".join))))
        for i in range(n)
    ]


@given(unicode_docs())
@settings(**_SETTINGS)
def test_shingle_hash_expr_udf_lockstep_on_unicode(spark, rows):
    """r12: the pure-JVM shingle hash must stay BIT-IDENTICAL to the
    Python reference UDF on ARBITRARY unicode, not just the ASCII
    fixtures — the two sides independently implement lower() (Python
    str.lower vs UTF8String.toLowerCase), the whitespace tokenizer
    (Python re vs Java regex), utf-8 encoding, and md5, and a drift in
    any one silently shifts every minhash signature. Hypothesis
    searches the case-mapping specials, combining marks, astral plane,
    and exotic whitespace where such engines classically diverge."""
    import pyspark.sql.functions as F

    from flink_realtime_2024_spark.operators.llm import (
        shingle_hash_array,
        shingle_hash_expr,
    )

    if not rows:
        return
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bad = (
        df.select(
            "doc_id",
            shingle_hash_expr("text").alias("jvm"),
            shingle_hash_array("text").alias("py"),
        )
        .filter(F.col("jvm") != F.col("py"))
        .collect()
    )
    assert not bad, [(r["doc_id"], rows[r["doc_id"]][1]) for r in bad]
