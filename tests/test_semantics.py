"""Semantic invariants the oracle comparison can't express:
CDC upsert-loop equivalence, LSH recall vs brute force, plan quality."""

from __future__ import annotations

import io
import contextlib
import re

import numpy as np
import pyspark.sql.functions as F
import pytest

from .conftest import SF_DIR


def _collect_set(df, *cols):
    return {tuple(r) for r in df.select(*cols).collect()}


def test_dim_upsert_equals_latest_row(spark):
    """Applying the changelog in micro-batches must converge to the same
    state as the one-shot latest-per-key materialization."""
    from flink_realtime_2024_spark.sources.cdc import cdc_latest_row, dim_upsert

    one_shot = _collect_set(cdc_latest_row(spark, SF_DIR), "key", "totalprice", "orderstatus")
    batched = _collect_set(dim_upsert(spark, SF_DIR), "key", "totalprice", "orderstatus")
    assert one_shot == batched


def test_minhash_finds_brute_force_pairs(spark):
    """LSH candidate generation must recover (almost) all true near-dup
    pairs found by an O(n²) brute-force shingle-Jaccard scan."""
    from flink_realtime_2024_spark.operators.llm import (
        _shingle_hashes,
        llm_dedup_minhash,
    )
    from flink_realtime_2024_spark.sources.io import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    sets = {r["doc_id"]: set(_shingle_hashes(r["text"])) for r in docs}
    ids = sorted(sets)
    truth = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = sets[a], sets[b]
            union = len(sa | sb)
            if union and len(sa & sb) / union >= 0.5:
                truth.add((a, b))
    found = _collect_set(llm_dedup_minhash(spark, SF_DIR), "doc_a", "doc_b")
    assert truth, "fixtures should contain near-duplicates"
    # no false positives (every reported pair is verified exactly)
    assert found <= truth
    # banding recall: 16x4 bands catch >=95% of j>=0.5 pairs in practice
    recall = len(found & truth) / len(truth)
    assert recall >= 0.9, f"minhash recall too low: {recall}"


@pytest.mark.parametrize("scheme", ["b6k3", "b5k2"])
def test_simhash_matches_brute_force(spark, scheme):
    """Multi-block SimHash banding has pigeonhole recall 1.0 for
    hamming ≤ 3 under BOTH registered schemes — b6k3 (C(6,3)=20 triple
    keys) and b5k2 (C(5,2)=10 pair keys: 3 flips touch ≤3 of 5 blocks,
    ≥2 stay clean, so a clean pair key survives) — and the operator
    verifies candidates with exact popcount ≤ 3, so each scheme's
    output must EQUAL the brute-force O(n²) hamming scan (the
    degenerate-collision guard _SIMHASH_BUCKET_CAP must not bind on
    fixtures). Scheme equality (b5 result == b6 result) follows from
    both equaling the same truth set."""
    from flink_realtime_2024_spark.operators._util import widen
    from flink_realtime_2024_spark.operators.llm import simhash64, simhash_pairs
    from flink_realtime_2024_spark.sources.io import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    fps = widen(docs).select("doc_id", simhash64("text").alias("fp")).collect()
    ids = np.array([r["doc_id"] for r in fps], dtype=np.int64)
    vals = np.array([r["fp"] for r in fps], dtype=np.int64).astype(np.uint64)
    truth = set()
    for i in range(len(ids)):
        ham = np.array(
            [bin(int(vals[i] ^ v)).count("1") for v in vals], dtype=np.int64
        )
        for j in np.nonzero((ham <= 3) & (ids > ids[i]))[0]:
            truth.add((int(ids[i]), int(ids[j])))
    found = _collect_set(
        simhash_pairs(docs, scheme=scheme), "doc_a", "doc_b"
    )
    assert truth, "fixtures should contain simhash near-dups"
    assert found == truth, (
        f"[{scheme}] missing={sorted(truth - found)[:5]}"
        f" extra={sorted(found - truth)[:5]}"
    )


def test_approx_percentile_near_exact(spark):
    """The GK sketch at accuracy 10000 must sit within 1% relative error
    of the exact interpolated percentile on every group."""
    from flink_realtime_2024_spark.operators.aggregates import (
        agg_approx_percentile,
        agg_percentile,
    )

    exact = {r["o_orderstatus"]: r["p50"] for r in agg_percentile(spark, SF_DIR).collect()}
    approx = {r["o_orderstatus"]: r["ap50"] for r in agg_approx_percentile(spark, SF_DIR).collect()}
    assert set(exact) == set(approx)
    for k in exact:
        assert abs(approx[k] - exact[k]) / exact[k] < 0.01, (k, approx[k], exact[k])


def test_connected_components_on_chain(spark):
    """Label propagation must close long chains (diameter >> 1), not
    just star shapes: a 12-vertex path plus a separate 2-vertex
    component and the propagation loop's fixpoint detection."""
    from flink_realtime_2024_spark.operators.llm import connected_components

    chain = [(i, i + 1) for i in range(11)] + [(100, 101)]
    edges = spark.createDataFrame(chain, "doc_a bigint, doc_b bigint")
    got = {r["doc_id"]: r["cluster_id"] for r in connected_components(edges, "doc_a", "doc_b").collect()}
    assert got == {**{i: 0 for i in range(12)}, 100: 100, 101: 100}


def test_winnow_guarantee_and_precision(spark):
    """Winnowing property (Schleimer et al.): any substring match of
    length ≥ k+w-1 shares a selected fingerprint — so a document paired
    with a lightly-edited copy of itself must be reported with high
    overlap. Precision: every reported fixture pair must have real
    char-7-gram similarity (brute-force verified)."""
    from flink_realtime_2024_spark.operators.llm import (
        _WINNOW_K,
        _winnow_fingerprints,
        llm_winnow_fingerprint,
        winnow_pipeline,
    )
    from flink_realtime_2024_spark.sources.io import load_table

    # kernel-level guarantee on a synthetic edit
    base = "the quick brown fox jumps over the lazy dog " * 5
    edited = "PREFIX! " + base + " suffix"
    fa = set(_winnow_fingerprints(base).tolist())
    fb = set(_winnow_fingerprints(edited).tolist())
    assert len(fa & fb) / min(len(fa), len(fb)) >= 0.8

    # pipeline: inject edited copies; every injected pair must be found
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    copies = (
        docs.filter(F.col("doc_id") < 10)
        .select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.concat(F.lit("edited prefix "), "text").alias("text"),
        )
    )
    found = _collect_set(
        winnow_pipeline(docs.unionByName(copies), 0.5), "doc_a", "doc_b"
    )
    expected = {(i, i + 1_000_000) for i in range(10)}
    assert expected <= found, f"missing injected pairs: {expected - found}"

    # precision on the raw fixtures: reported pairs have real overlap
    pairs = llm_winnow_fingerprint(spark, SF_DIR).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in pairs[:20]:
        ga = set(_winnow_fingerprints(texts[r["doc_a"]]).tolist())
        gb = set(_winnow_fingerprints(texts[r["doc_b"]]).tolist())
        true_overlap = len(ga & gb) / min(len(ga), len(gb))
        assert true_overlap >= 0.5, (r["doc_a"], r["doc_b"], true_overlap)


def test_neardup_cosine_recall(spark):
    """Hyperplane-LSH near-dup must recover high-cosine pairs. The driver
    fixtures contain none (max cosine ≈ 0.6), so synthetic near-dups are
    injected: 20 vectors duplicated with small perturbations."""
    from flink_realtime_2024_spark.operators.llm import neardup_cosine_pipeline
    from flink_realtime_2024_spark.sources.io import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    # fixtures alone: must be empty (no false positives on real data)
    assert neardup_cosine_pipeline(emb, 0.9).count() == 0

    base = emb.limit(20).collect()
    rng = np.random.RandomState(0)
    rows = []
    for r in base:
        v = np.array(r["embedding"], dtype=np.float64)
        v2 = v + rng.normal(scale=0.02, size=v.shape)
        v2 /= np.linalg.norm(v2)
        rows.append((int(r["vec_id"]) + 1_000_000, [float(x) for x in v2]))
    dups = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    combined = emb.select("vec_id", "embedding").unionByName(dups)
    found = _collect_set(neardup_cosine_pipeline(combined, 0.9), "vec_a", "vec_b")
    truth = {(int(r["vec_id"]), int(r["vec_id"]) + 1_000_000) for r in base}
    recall = len(found & truth) / len(truth)
    assert recall >= 0.9, f"hyperplane LSH recall too low: {recall} ({found})"


def test_knn_neighbors_match_brute_force(spark):
    """Distributed partial-topk must equal a numpy brute force."""
    from flink_realtime_2024_spark.operators.llm import llm_knn_cosine, _KNN_QUERY_MOD, _KNN_K
    from flink_realtime_2024_spark.sources.io import load_table

    emb = load_table(spark, SF_DIR, "embeddings").collect()
    ids = np.array([r["vec_id"] for r in emb])
    E = np.array([r["embedding"] for r in emb], dtype=np.float64)
    got = {}
    for r in llm_knn_cosine(spark, SF_DIR).collect():
        got.setdefault(r["query_id"], []).append(r["neighbor_id"])
    for qid in ids[ids % _KNN_QUERY_MOD == 0]:
        q = E[ids == qid][0]
        s = np.round(E @ q, 6)
        mask = ids != qid
        order = np.lexsort((ids[mask], -s[mask]))[:_KNN_K]
        expect = list(ids[mask][order])
        assert got[int(qid)] == [int(x) for x in expect], f"query {qid}"


def test_knn_ivf_recall(spark):
    """IVF approximate kNN must recover most exact top-k neighbors."""
    from flink_realtime_2024_spark.operators.llm import llm_knn_cosine, llm_knn_ivf

    exact = {}
    for r in llm_knn_cosine(spark, SF_DIR).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx = {}
    for r in llm_knn_ivf(spark, SF_DIR).collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(approx) == set(exact)
    hits = sum(len(approx[q] & exact[q]) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    recall = hits / total
    # fixtures are near-uniform on the sphere (IVF's worst case): 0.6 is
    # the floor here; clustered real embeddings sit near 1.0
    assert recall >= 0.6, f"IVF recall@k too low: {recall}"


def test_ann_self_reported_recall_column(spark):
    """Every ANN variant self-reports ``recall_at_k_vs_exact`` (r8): the
    in-row value must equal the recall computed independently against
    the exact kNN, and its mean must clear each variant's documented
    floor — so a rows-only driver recording still pins quality."""
    from flink_realtime_2024_spark.operators.llm import (
        llm_knn_cosine,
        llm_knn_int8,
        llm_knn_ivf,
        llm_knn_pq,
    )

    exact = {}
    for r in llm_knn_cosine(spark, SF_DIR).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    for fn, floor in ((llm_knn_ivf, 0.6), (llm_knn_pq, 0.2), (llm_knn_int8, 0.9)):
        rows = fn(spark, SF_DIR).collect()
        assert rows and "recall_at_k_vs_exact" in rows[0].asDict(), fn.__name__
        approx, reported = {}, {}
        for r in rows:
            approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
            reported[r["query_id"]] = r["recall_at_k_vs_exact"]
        for q in approx:
            want = len(approx[q] & exact[q]) / len(exact[q])
            assert abs(reported[q] - want) < 1e-9, (fn.__name__, q)
        mean = sum(reported.values()) / len(reported)
        assert mean >= floor, f"{fn.__name__} mean recall {mean} < {floor}"


def test_knn_ivf_partitioned_matches_and_prunes(spark):
    """The partitioned-index IVF must (1) return exactly the seeded-IVF
    reference result — recomputed here independently in numpy from the
    fixture (centroids in Knuth-hash order, rounded-dot argmax
    assignment, stable probe ranking, pruned top-k; r14 the id moved to
    a FULL DuckDB oracle with this same construction) — and (2) carry
    the probed-list filter as a PARTITION filter on the index scan, so
    unprobed lists are pruned at directory listing."""
    import numpy as np

    from flink_realtime_2024_spark.operators.llm import llm_knn_ivf_partitioned
    from flink_realtime_2024_spark.operators.llm.knn import (
        _IVF_KNUTH,
        _IVF_NCENT,
        _IVF_NPROBE,
        _KNN_K,
        _KNN_MAX_QUERIES,
        _KNN_QUERY_MOD,
    )

    rows = sorted(
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r["vec_id"],
    )
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    E = np.array([r["embedding"] for r in rows], dtype=np.float64)
    order = np.lexsort((ids, (ids * _IVF_KNUTH) % 2**32))
    C = E[order[:_IVF_NCENT]]
    cids = np.round(E @ C.T, 6).argmax(axis=1)
    qsel = np.nonzero(ids % _KNN_QUERY_MOD == 0)[0][:_KNN_MAX_QUERIES]
    expected = set()
    for qi in qsel:
        d = np.round(C @ E[qi], 6)
        probed = set(np.lexsort((np.arange(_IVF_NCENT), -d))[:_IVF_NPROBE])
        allowed = np.array(
            [cids[i] in probed and ids[i] != ids[qi] for i in range(len(ids))]
        )
        mids, ms = ids[allowed], np.round(E[allowed] @ E[qi], 6)
        for i in np.lexsort((mids, -ms))[:_KNN_K]:
            expected.add((int(ids[qi]), int(mids[i]), float(ms[i])))

    part_df = llm_knn_ivf_partitioned(spark, SF_DIR)
    got = {
        (r["query_id"], r["neighbor_id"], r["score"])
        for r in part_df.collect()
    }
    assert got == expected and len(got) > 0

    plan = _explain(part_df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "centroid_id" in m.group(1), plan


def test_knn_ivf_index_rebuilds_on_fixture_change(spark, tmp_path):
    """The parquet IVF index is content-addressed (r8): regenerating the
    fixture IN PLACE (same path, new bytes/mtime) must miss the cached
    index and rebuild — the stale-index path the r7 verdict flagged —
    and the stale digest dir must be pruned, keeping one live index per
    fixture dir."""
    import glob
    import os
    import shutil
    import tempfile

    from flink_realtime_2024_spark.operators.llm import llm_knn_ivf_partitioned

    fixture = tmp_path / "sfcopy"
    shutil.copytree(SF_DIR, fixture)
    tag = os.path.basename(str(fixture))
    pattern = os.path.join(tempfile.gettempdir(), f"ivf_index_{tag}_*")

    llm_knn_ivf_partitioned(spark, str(fixture)).collect()
    first = glob.glob(pattern)
    assert len(first) == 1, first

    # "regenerate" the fixture: same path, new mtime (the digest also
    # covers size, but mtime alone must already miss the cache)
    emb_path = fixture / "embeddings.parquet"
    st = emb_path.stat()
    os.utime(emb_path, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000_000))

    llm_knn_ivf_partitioned(spark, str(fixture)).collect()
    second = glob.glob(pattern)
    assert len(second) == 1, second
    assert second[0] != first[0], "stale index reused after fixture change"
    assert not os.path.isdir(first[0]), "stale index dir not pruned"


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_plan_quality(spark):
    """The plans we promised: pushdown reaches the scan, dims broadcast,
    top-k avoids global sorts, window top-n group-limits."""
    from flink_realtime_2024_spark.plans.registry import all_queries

    qs = all_queries()
    scan = _explain(qs["scan_parquet"].builder(spark, SF_DIR))
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", scan).group(1)
    assert "GreaterThanOrEqual(l_shipdate" in pushed and "GreaterThanOrEqual(l_quantity" in pushed
    read_schema = re.search(r"ReadSchema: struct<([^>]*)>", scan).group(1)
    assert set(c.split(":")[0] for c in read_schema.split(",")) == {
        "l_orderkey", "l_linenumber", "l_quantity", "l_shipdate",
    }

    assert "BroadcastHashJoin" in _explain(qs["join_broadcast_dim"].builder(spark, SF_DIR))
    assert "TakeOrderedAndProject" in _explain(qs["sort_limit_topk"].builder(spark, SF_DIR))
    assert "WindowGroupLimit" in _explain(qs["winfn_topn"].builder(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in _explain(qs["join_theta_range"].builder(spark, SF_DIR))

    # A2: two-phase aggregation — partial agg before the exchange
    agg_plan = _explain(qs["agg_hash_groupby"].builder(spark, SF_DIR))
    assert "partial_" in agg_plan.lower() or "HashAggregate" in agg_plan

    # A9: pivot with explicit values — no eager distinct-values job, and
    # both aggregation phases map-side combine (partial_ before every
    # Exchange); the second exchange carries only O(groups) rows
    pivot_plan = _explain(qs["agg_pivot"].builder(spark, SF_DIR))
    assert len(re.findall(r"\(\d+\) Exchange", pivot_plan)) == 2, pivot_plan
    assert "partial_pivotfirst" in pivot_plan and "partial_sum" in pivot_plan

    # r8 CUMULATE: the slice expansion must be MAP-SIDE — Generate
    # (explode) below the single Exchange, with a partial HashAggregate
    # between them, so the shuffle carries aggregated groups, not the
    # 4x-exploded events
    cum_plan = _explain(qs["sql_window_cumulate"].builder(spark, SF_DIR))
    assert len(re.findall(r"\(\d+\) Exchange", cum_plan)) == 1, cum_plan
    gen = re.search(r"\((\d+)\) Generate", cum_plan)
    exch = re.search(r"\((\d+)\) Exchange", cum_plan)
    partial = re.search(r"\((\d+)\) HashAggregate", cum_plan)
    assert gen and exch and int(gen.group(1)) < int(exch.group(1)), cum_plan
    assert "partial_" in cum_plan.lower() or partial, cum_plan


def test_no_cartesian_products_anywhere(spark):
    """Registry-wide plan sweep: no query may compile to an unconditioned
    CartesianProduct — the one plan shape that cannot survive scale.
    (BroadcastNestedLoopJoin with a range condition is allowed: that is
    the intended theta-join physical form.)"""
    from flink_realtime_2024_spark.plans.registry import all_queries

    streaming_ids = {
        # these run a stream to completion; plan inspection is meaningless
        "stream_source_smoke", "stream_split", "stream_dedup", "stream_late_split",
        "stream_stream_join", "stream_window_topn", "stream_dim_join", "stream_cdc_upsert",
        "config_routing", "dim_upsert", "scan_csv_roundtrip",
        "scan_json_roundtrip", "serving_partition_prune",
    }
    offenders = []
    for name, q in sorted(all_queries().items()):
        if name in streaming_ids:
            continue
        plan = _explain(q.builder(spark, SF_DIR))
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, f"cartesian products in: {offenders}"


def test_lineitem_scans_are_pruned(spark):
    """Column-pruning sweep: no lineitem scan in any registered query may
    read the full 11-column schema — every query projects a subset, and
    Catalyst must push that into the parquet reader."""
    import re as _re

    from flink_realtime_2024_spark.plans.registry import all_queries

    skip = {
        "stream_source_smoke", "stream_split", "stream_dedup", "stream_late_split",
        "stream_stream_join", "stream_window_topn", "stream_dim_join", "stream_cdc_upsert",
        "config_routing", "dim_upsert", "scan_csv_roundtrip",
        "scan_json_roundtrip", "serving_partition_prune",
    }
    offenders = []
    for name, q in sorted(all_queries().items()):
        if name in skip:
            continue
        plan = _explain(q.builder(spark, SF_DIR))
        for m in _re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
            cols = [c for c in m.group(1).split(",") if c.startswith("l_")]
            if len(cols) >= 11:
                offenders.append(name)
    assert not offenders, f"unpruned lineitem scans in: {offenders}"


def test_multimodal_codecs_roundtrip():
    """The decoders are REAL: encode known pixels/samples, decode the
    bytes, get the exact stats back."""
    from flink_realtime_2024_spark.operators.multimodal import (
        decode_audio,
        decode_image,
        decode_video,
        encode_bmp,
        encode_ppm,
        encode_wav,
    )

    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)  # 3x2 RGB
    for enc in (encode_bmp, encode_ppm):
        s = decode_image(enc(px))
        assert (s["width"], s["height"]) == (3, 2)
        assert s["mean_value"] == float(px.mean())

    # BMP row padding: width 3 → 9 data bytes padded to 12 per row; the
    # pad must not leak into the stats (equality above proves it)

    samples = np.array([0, 1000, -1000, 500], dtype=np.int16)
    a = decode_audio(encode_wav(samples, rate=8000))
    assert a["sample_rate"] == 8000
    assert a["duration_ms"] == 1000.0 * 4 / 8000
    assert a["mean_value"] == float(np.sqrt(np.mean(samples.astype(np.float64) ** 2)))

    with pytest.raises(ValueError):
        decode_image(b"\x89PNG----")

    # Y4M video round-trip: known luma planes → exact stats back
    from flink_realtime_2024_spark.operators.multimodal import encode_y4m

    y = np.stack([np.full((4, 6), 50, np.uint8), np.full((4, 6), 150, np.uint8)])
    u = np.zeros((2, 2, 3), np.uint8)
    v = np.zeros((2, 2, 3), np.uint8)
    vid = decode_video(encode_y4m(y, u, v, fps=(5, 1)))
    assert (vid["width"], vid["height"], vid["n_frames"]) == (6, 4, 2)
    assert vid["duration_ms"] == 400.0  # 2 frames at 5 fps
    assert vid["mean_value"] == 100.0  # (50+150)/2
    with pytest.raises(ValueError):
        decode_video(b"\x00\x00\x00\x18ftypmp42")


def test_multimodal_resize_and_frame_sample(spark):
    """resize/frame-sample kernels are exact: nearest-neighbor on a 2x2
    block pattern reproduces the blocks; frame sampling recovers known
    RMS; the pipeline emits one feature row per mime."""
    from flink_realtime_2024_spark.operators.multimodal import (
        frame_sample,
        mm_resize_stats,
        resize_nearest,
    )

    px = np.zeros((2, 2, 3), dtype=np.uint8)
    px[0, 0] = 10
    px[1, 1] = 250
    up = resize_nearest(px, 4, 4)
    assert up.shape == (4, 4, 3)
    assert (up[:2, :2] == 10).all() and (up[2:, 2:] == 250).all()
    assert (up[:2, 2:] == 0).all() and (up[2:, :2] == 0).all()

    samples = np.full(1024, 100, dtype=np.int16)
    frames = frame_sample(samples, 4, 256)
    assert frames.shape == (4, 256)
    assert float(np.sqrt(np.mean(frames.astype(np.float64) ** 2))) == 100.0

    agg = {r["mime"]: r for r in mm_resize_stats(spark, SF_DIR).collect()}
    assert set(agg) == {
        "image/bmp", "image/x-portable-pixmap", "image/png", "image/jpeg",
        "image/gif", "audio/wav", "audio/basic+wav", "video/x-yuv4mpeg"
    }
    for r in agg.values():
        assert r["n_assets"] > 0 and r["avg_feature"] > 0


def test_oracle_primitives_cross_engine(duck):
    """The five r9 oracle flips all rest on a handful of cross-engine
    primitives. This pins each one DIRECTLY (not just through the
    end-to-end hashes), so a drift in either engine's md5/regex/integer
    semantics fails here with a named cause instead of as four
    mysterious oracle mismatches.

    1. `_md5_byte_sql(k)` == byte k of Python's md5(text) — the seed
       extraction every mm_* oracle derives dims AND content from.
    2. `_seq_bytes(n, a, b, p)` == its one-line SQL twin — the content
       formula behind the mm pixel/sample oracles.
    3. `_shingle_hashes` == the minhash oracle's hashed CTE — md5-based
       shingle hashing + pinned ASCII tokenization.
    4. `simhash64` == the simhash oracle's fp CTE — per-token md5 bit
       accumulation packed MSB-first."""
    import hashlib

    import pandas as pd

    from flink_realtime_2024_spark.operators.llm import _shingle_hashes, simhash64
    from flink_realtime_2024_spark.operators.multimodal import _md5_byte_sql, _seq_bytes

    # 1. seed bytes
    rows = duck.execute(
        "SELECT doc_id, COALESCE(text, '') AS t FROM documents ORDER BY doc_id LIMIT 50"
    ).fetchall()
    for k in (0, 5, 15):
        got = dict(
            duck.execute(
                "WITH h AS (SELECT doc_id, md5(COALESCE(text, '')) AS hx "
                "FROM documents ORDER BY doc_id LIMIT 50) "
                f"SELECT doc_id, {_md5_byte_sql(k)} FROM h"
            ).fetchall()
        )
        for doc_id, t in rows:
            assert got[doc_id] == hashlib.md5(t.encode("utf-8")).digest()[k]

    # 2. content sequence formula
    for n, a, b, p in [(1, 0, 11, 251), (500, 255, 17, 239), (2883, 77, 13, 241)]:
        sql = duck.execute(
            "SELECT list_transform(generate_series(0, ? - 1), "
            "i -> (? + ? * i + (i * i) % ?) % 256)", [n, a, b, p]
        ).fetchone()[0]
        assert np.array_equal(np.array(sql, dtype=np.int64), _seq_bytes(n, a, b, p))

    # 3. shingle hashes (minhash oracle's `hashed` CTE, verbatim shape)
    sql_sh = duck.execute("""
      WITH toks AS (
        SELECT doc_id, list_filter(
          regexp_split_to_array(lower(COALESCE(text, '')), '[ \t\n\r\f\v]+'),
          x -> x <> '') AS tk
        FROM documents ORDER BY doc_id LIMIT 50
      ), grams AS (
        SELECT doc_id, CASE WHEN len(tk) >= 3 THEN
            list_transform(generate_series(1, len(tk) - 2),
                           i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])
          ELSE [array_to_string(tk, ' ')] END AS gs
        FROM toks
      )
      SELECT doc_id, list_sort(list_distinct(
        [CAST(('0x' || substr(md5(g), 1, 16))::UBIGINT AS HUGEINT) FOR g IN gs]
      )) FROM grams
    """).fetchall()
    py_sh = {
        doc_id: [int(x) for x in _shingle_hashes(t)] for doc_id, t in rows
    }
    for doc_id, hs in sql_sh:
        assert [int(h) for h in hs] == py_sh[doc_id], f"shingle drift doc {doc_id}"

    # 4. simhash fingerprints (simhash oracle's fp CTE)
    sql_fp = dict(duck.execute("""
      WITH tok AS (
        SELECT DISTINCT doc_id, t AS token
        FROM (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 50),
             LATERAL unnest(regexp_split_to_array(lower(COALESCE(text, '')),
                                                  '[ \t\n\r\f\v]+')) AS u(t)
        WHERE t <> ''
      ), hx AS (SELECT doc_id, md5(token) AS h FROM tok),
      bits AS (
        SELECT doc_id, b,
               SUM(CASE WHEN ((strpos('0123456789abcdef', substr(h, b // 4 + 1, 1)) - 1)
                              >> (3 - (b % 4))) & 1 = 1 THEN 1 ELSE -1 END) AS acc
        FROM hx, LATERAL (SELECT unnest(generate_series(0, 63)) AS b) bb
        GROUP BY doc_id, b
      )
      SELECT doc_id, SUM(CASE WHEN acc > 0 THEN CAST(1 AS HUGEINT) << (63 - b)
                              ELSE CAST(0 AS HUGEINT) END)
      FROM bits GROUP BY doc_id
    """).fetchall())
    py_fp = simhash64.func(pd.Series([t for _, t in rows]))
    for (doc_id, _), f in zip(rows, py_fp):
        f_u = int(f) + (1 << 64 if int(f) < 0 else 0)
        assert int(sql_fp.get(doc_id, 0)) == f_u, f"simhash drift doc {doc_id}"


def test_shingle_hash_expr_matches_udf(spark):
    """r12 (verdict #1): the pure-JVM shingle hash powering the minhash
    kernel must stay BIT-IDENTICAL to the Python reference UDF — same
    md5-derived values, same hash-level dedup, same UNSIGNED sort order
    of the int64 views — or every minhash signature silently drifts
    from the DuckDB _MD5_U64_TERMS oracle. Pinned on hand-picked edge
    cases (null / empty / whitespace-only / sub-3-token / mixed-case /
    duplicate shingles / a hash ≥ 2^63 forcing the unsigned-sort flip)
    plus the full test corpus, comparing both columns inside one frame
    so the JVM and Arrow paths see identical input rows."""
    from flink_realtime_2024_spark.operators.llm import (
        shingle_hash_array,
        shingle_hash_expr,
    )

    edge = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, ""),
            (3, None),
            (4, "one two"),
            (5, "single"),
            (6, " \t\n "),
            (7, "ALPHA Beta GAMMA delta Epsilon ZETA"),
            (8, "a b c a b c a b c a b c"),
            (9, "  leading and   trailing\tmixed\nwhitespace  "),
        ],
        "doc_id long, text string",
    )
    corpus = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    for df in (edge, corpus):
        diff = (
            df.select(
                "doc_id",
                shingle_hash_expr("text").alias("jvm"),
                shingle_hash_array("text").alias("py"),
            )
            .filter(F.col("jvm") != F.col("py"))
            .count()
        )
        assert diff == 0
    # the unsigned-order branch is actually exercised: some corpus doc
    # must hold BOTH a negative-int64-view hash and a positive one
    straddles = (
        corpus.select(shingle_hash_expr("text").alias("sh"))
        .filter(
            (F.element_at("sh", 1) >= 0) & (F.element_at("sh", -1) < 0)
        )
        .count()
    )
    assert straddles > 0, "corpus never exercised the unsigned sort flip"


def test_jpeg_block_constant_roundtrip_exact():
    """The mm full-oracle contract for the LOSSY class: images built
    from `_jpeg_block_values` (per-8×8-block constants v = 128 + 5m)
    decode back BIT-EXACTLY under quality-85 quantization, for BOTH the
    baseline and progressive encoders. This is the property that lets a
    DuckDB oracle state the decoded pixel sums of a Huffman-coded JPEG;
    if a quant-table, DCT, or rounding change breaks it, this test
    fails before the driver's hash does."""
    from flink_realtime_2024_spark.operators._jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
        _quality_tables,
    )
    from flink_realtime_2024_spark.operators.multimodal import _jpeg_block_values

    ql, qc = _quality_tables(85)
    # the exactness argument requires DC quant step 5 (so DC = 8m ⇄ 40m)
    assert ql[0, 0] == 5 and qc[0, 0] == 5
    for s, w, h in [(0, 8, 8), (7, 31, 9), (123, 17, 31), (255, 24, 24)]:
        v = _jpeg_block_values(w, h, s)
        px1 = np.repeat(np.repeat(v, 8, axis=0), 8, axis=1)[:h, :w]
        px = np.repeat(px1[:, :, None], 3, axis=2)
        for enc in (encode_jpeg, encode_jpeg_progressive):
            assert np.array_equal(decode_jpeg(enc(px, quality=85)), px), (
                f"lossy roundtrip not exact: {enc.__name__} {w}x{h} seed {s}"
            )


def test_mulaw_canonical_codes_roundtrip_exact():
    """The other lossy-class oracle contract: samples synthesized as
    μ-law EXPANSIONS of canonical code points survive compress→expand
    unchanged (companding is the identity on its own output), so the
    SQL expansion formula states the decoded values exactly."""
    from flink_realtime_2024_spark.operators.multimodal import (
        _mulaw_compress,
        _mulaw_expand,
    )

    codes = np.arange(256, dtype=np.uint8)
    samples = _mulaw_expand(codes)
    assert np.array_equal(_mulaw_expand(_mulaw_compress(samples)), samples)
    # and the SQL formula: mag = ((u%16)*8 + 132) * 2^((u//16)%8) - 132
    u = (255 - codes.astype(np.int64)) % 256
    mag = ((u % 16) * 8 + 132) * (1 << ((u // 16) % 8)) - 132
    assert np.array_equal(np.abs(samples.astype(np.int64)), mag)


def test_multimodal_pipeline_decodes_real_bytes(spark):
    """End-to-end: synthesized BMP/PPM/PNG/WAV(PCM+μ-law)/Y4M payloads
    flow through the mapInPandas decode kernel; spot-check a few assets
    against a local re-decode of the same bytes."""
    from flink_realtime_2024_spark.operators.multimodal import (
        DECODE_STATS_SCHEMA,
        build_assets,
        decode_audio,
        decode_image,
        decode_stats,
        mm_decode_stats,
    )

    agg = {r["mime"]: r for r in mm_decode_stats(spark, SF_DIR).collect()}
    assert set(agg) == {
        "image/bmp", "image/x-portable-pixmap", "image/png", "image/jpeg",
        "image/gif", "audio/wav", "audio/basic+wav", "video/x-yuv4mpeg"
    }
    for mime, r in agg.items():
        assert r["n_assets"] > 0 and r["total_values"] > 0
        assert r["pooled_mean_value"] is not None
        if mime.startswith("image/"):
            assert r["avg_width"] > 0 and r["avg_height"] > 0
        else:
            assert r["avg_duration_ms"] > 0

    assets = build_assets(spark, SF_DIR)
    decoded = {
        r["asset_id"]: r
        for r in assets.mapInPandas(decode_stats, DECODE_STATS_SCHEMA)
        .filter(F.col("asset_id") < 9)
        .collect()
    }
    from flink_realtime_2024_spark.operators.multimodal import decode_video

    for r in assets.filter(F.col("asset_id") < 9).collect():
        dec = (
            decode_image
            if r["mime"].startswith("image/")
            else decode_video if r["mime"].startswith("video/") else decode_audio
        )
        local = dec(bytes(r["payload"]))
        got = decoded[r["asset_id"]]
        assert got["mean_value"] == pytest.approx(local["mean_value"], abs=1e-9)
        if r["mime"].startswith("image/"):
            assert (got["width"], got["height"]) == (local["width"], local["height"])


def test_kernel_queries_are_rerun_deterministic(spark):
    """Exactly-once under task retries requires every Python kernel to
    be a pure function of its input rows: running each kernel-backed
    query twice must give identical results (no per-run randomness, no
    partition-order sensitivity in the output set)."""
    from flink_realtime_2024_spark.plans.registry import all_queries

    qs = all_queries()
    for name in (
        "llm_dedup_minhash",
        "llm_dedup_simhash",
        "llm_winnow_fingerprint",
        "llm_knn_ivf",
        "mm_decode_stats",
    ):
        a = {tuple(r) for r in qs[name].builder(spark, SF_DIR).collect()}
        b = {tuple(r) for r in qs[name].builder(spark, SF_DIR).collect()}
        assert a == b, f"{name} differs across reruns"


def test_observation_metrics_single_pass(spark):
    """Operator counters via the Observation API: metric values arrive
    with the action itself (no second scan), and match an independent
    recomputation — the Flink metric-counter contract."""
    from flink_realtime_2024_spark.observability import observe_counts
    from flink_realtime_2024_spark.sources.io import load_table

    ev = load_table(spark, SF_DIR, "events")
    parsed = ev.select(
        "event_id", F.get_json_object("props", "$.missing").alias("m")
    )
    obs_df, obs = observe_counts(
        parsed,
        "parse",
        n_rows=F.count(F.lit(1)),
        n_null=F.count(F.when(F.col("m").isNull(), 1)),
    )
    n_out = obs_df.count()  # the action; metrics ride along
    got = obs.get
    assert got["n_rows"] == n_out == ev.count()
    assert got["n_null"] == n_out  # $.missing never present


def test_pq_reconstruction_and_recall(spark):
    """PQ quality gates: (1) reconstruction preserves direction — mean
    cosine between each vector and its decoded codes well above the
    ~0 of random pairs (fixtures' max off-diag cosine is ~0.6);
    (2) ADC top-k recall vs exact kNN beats random-guessing by a wide
    margin on uniform-sphere fixtures (PQ's hardest case)."""
    from flink_realtime_2024_spark.operators.llm import (
        _pq_train,
        llm_knn_cosine,
        llm_knn_pq,
        pq_encode,
        pq_reconstruct,
    )
    from flink_realtime_2024_spark.sources.io import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    books = _pq_train(emb)
    E = np.array([r["embedding"] for r in emb.collect()], dtype=np.float64)
    R = pq_reconstruct(pq_encode(E, books), books)
    cos = (E * R).sum(1) / (np.linalg.norm(E, axis=1) * np.linalg.norm(R, axis=1))
    assert cos.mean() > 0.55, f"mean reconstruction cosine too low: {cos.mean():.3f}"

    exact, approx = {}, {}
    for r in llm_knn_cosine(spark, SF_DIR).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in llm_knn_pq(spark, SF_DIR).collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(approx) == set(exact)
    hits = sum(len(approx[q] & exact[q]) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    recall = hits / total
    # k=5 of 500: random ≈ 0.01; uniform sphere is PQ's worst case
    assert recall >= 0.2, f"PQ recall@k too low: {recall}"


def test_pq_seeded_determinism_and_recall(spark):
    """llm_knn_pq_seeded (r14 full-oracle PQ): (1) the seeded codebooks
    are a deterministic function of the corpus — two independent builds
    are bit-identical and shaped (m, k, d/m); (2) the rounded-distance
    encoder agrees with the unrounded one almost everywhere (rounding
    exists for oracle parity, not to change assignments); (3) ADC
    recall vs exact kNN stays above the random floor (uniform-sphere
    fixtures are PQ's worst case, and seeded codebooks trade quality
    for oracle-checkability — the floor is accordingly below the
    Lloyd-trained gate in test_pq_reconstruction_and_recall)."""
    from flink_realtime_2024_spark.operators.llm import (
        _PQ_K,
        _PQ_M,
        _pq_seeded_books,
        _pq_seeded_encode,
        llm_knn_cosine,
        llm_knn_pq_seeded,
        pq_encode,
    )
    from flink_realtime_2024_spark.sources.io import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    books = _pq_seeded_books(emb)
    again = _pq_seeded_books(emb)
    assert books.shape[0] == _PQ_M and books.shape[1] == _PQ_K
    assert np.array_equal(books, again)

    E = np.array([r["embedding"] for r in emb.collect()], dtype=np.float64)
    rounded = _pq_seeded_encode(E, books)
    plain = pq_encode(E, books)
    agree = (rounded == plain).mean()
    assert agree > 0.99, f"1e-6 quantization moved {1 - agree:.2%} of codes"

    exact, approx = {}, {}
    for r in llm_knn_cosine(spark, SF_DIR).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in llm_knn_pq_seeded(spark, SF_DIR).collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(approx) == set(exact)
    hits = sum(len(approx[q] & exact[q]) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    recall = hits / total
    # k=5 of 500: random ≈ 0.01
    assert recall >= 0.1, f"seeded-PQ recall@k too low: {recall}"


def test_hll_union_estimates_close_to_exact(spark):
    """agg_hll_union is rows-only (DataSketches estimates are
    engine-specific); pin the semantics here: the merged region-level
    estimate must be within 5% of the exact distinct customer count."""
    from flink_realtime_2024_spark.operators.aggregates import agg_hll_union
    from flink_realtime_2024_spark.sources.io import load_table

    est = {r["n_regionkey"]: r["est_customers"] for r in agg_hll_union(spark, SF_DIR).collect()}
    customer = load_table(spark, SF_DIR, "customer")
    nation = load_table(spark, SF_DIR, "nation")
    exact = {
        r["n_regionkey"]: r["exact"]
        for r in customer.join(
            nation, customer.c_nationkey == nation.n_nationkey
        )
        .groupBy("n_regionkey")
        .agg(F.countDistinct("c_custkey").alias("exact"))
        .collect()
    }
    assert set(est) == set(exact)
    for k, e in exact.items():
        assert abs(est[k] - e) <= max(1, 0.05 * e), (k, est[k], e)


def test_funnel_is_single_wide_shuffle(spark):
    """analytics_funnel's contract: ONE exchange on user_id feeds all
    three chained window-mins (same partitioning ⇒ reused), plus only
    the tiny single-partition exchange for the global rollup — never
    the 5-exchange staged groupBy+join shape, and no join at all."""
    from flink_realtime_2024_spark.plans.registry import all_queries

    plan = _explain(all_queries()["analytics_funnel"].builder(spark, SF_DIR))
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges <= 2, plan
    assert "Join" not in plan, plan


# =============================================================================
# Round-3 additions: bloom decontamination, k-means, SemDeDup, int8 kNN
# =============================================================================


def test_bloom_decontaminate_equals_exact(spark):
    """The bloom-pruned plan must produce EXACTLY the exact-join result
    (the bloom only prunes; false positives are re-verified)."""
    from flink_realtime_2024_spark.operators.llm import (
        llm_decontaminate,
        llm_decontaminate_bloom,
    )

    exact = _collect_set(
        llm_decontaminate(spark, SF_DIR), "doc_id", "n_overlap", "contaminated"
    )
    bloom = _collect_set(
        llm_decontaminate_bloom(spark, SF_DIR), "doc_id", "n_overlap", "contaminated"
    )
    assert exact == bloom


def test_kmeans_equals_sequential_reference(spark):
    """EXACT assignment equivalence against a single-node NumPy replay
    of the same schedule (init = first k vectors by vec_id, 8 Lloyd
    rounds, mean → renormalize, empty cluster keeps its centroid).

    Why exactness is legitimate to assert despite distributed float
    summation: the only nondeterminism in the Spark path is the ORDER
    in which per-batch partial sums are reduced, which perturbs each
    centroid coordinate by at most ~n·ε ≈ 1e-13 relative. An argmax
    assignment can only differ if some vector's best-vs-second-best
    dot-product margin is below that noise floor — so this test also
    measures the minimum margin at EVERY round of the reference replay
    and asserts it is ≥ 1e-9, four orders of magnitude above the noise.
    With that margin the distributed and sequential assignments are
    equal by induction over rounds (equal assignments ⇒ same cluster
    member sets ⇒ sums differ only in addition order ⇒ next-round
    centroids within noise ⇒ equal assignments again), not by luck.
    If a future fixture ever trips the margin guard, THAT failure —
    not a flaky mismatch — is the signal the corpus has a genuine
    decision-boundary tie and the id must stay rows-only."""
    from flink_realtime_2024_spark.operators.llm import (
        _KMEANS_K,
        _KMEANS_ROUNDS,
        kmeans_assign,
    )
    from flink_realtime_2024_spark.sources.io import load_table

    rows = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    E = np.array([r["embedding"] for r in rows], dtype=np.float64)
    order = np.argsort(ids, kind="stable")
    k = min(_KMEANS_K, len(ids))
    cent = E[order[:k]].copy()
    min_margin = np.inf
    for _ in range(_KMEANS_ROUNDS):
        dots = E @ cent.T
        part = np.partition(dots, dots.shape[1] - 2, axis=1)
        min_margin = min(min_margin, float((part[:, -1] - part[:, -2]).min()))
        a = dots.argmax(axis=1)
        for c in range(k):
            sel = E[a == c]
            if len(sel):
                m = sel.sum(axis=0) / len(sel)
                nrm = np.linalg.norm(m)
                if nrm > 0:
                    cent[c] = m / nrm
    dots = E @ cent.T
    part = np.partition(dots, dots.shape[1] - 2, axis=1)
    min_margin = min(min_margin, float((part[:, -1] - part[:, -2]).min()))
    ref = dict(zip(ids.tolist(), dots.argmax(axis=1).tolist()))

    assert min_margin >= 1e-9, (
        f"argmax margin {min_margin} is within float-reduction noise: "
        "exact equivalence is not assertable on this corpus"
    )
    got = {
        r["vec_id"]: r["cluster_id"]
        for r in kmeans_assign(load_table(spark, SF_DIR, "embeddings")).collect()
    }
    assert got == ref, (
        f"distributed k-means diverged from the sequential reference on "
        f"{sum(1 for v in got if got[v] != ref[v])}/{len(ref)} vectors"
    )


def test_ann_training_margins_support_oracle_exactness(spark):
    """The r14 llm_knn_ivf / llm_knn_pq oracle flips replay each Lloyd
    training in DuckDB SQL; like the k-means flip, the replay is exact
    only if every argmax/argmin decision clears the cross-engine
    float-reduction noise floor (~1e-13 relative). This guard replays
    both training schedules on the kernels' own Knuth-hash-ordered
    sample and asserts the minimum best-vs-second-best margin at EVERY
    round (and the final full-corpus assignment/encode) is ≥ 1e-9 —
    measured 2.9e-5 (IVF) and 8.7e-7 (PQ) on the shipped fixtures. If
    a future fixture trips this, THAT failure is the signal the corpus
    has a decision-boundary tie and the ids must revert to rows-only."""
    import pyspark.sql.functions as F

    from flink_realtime_2024_spark.operators.llm import (
        _IVF_KNUTH,
        _IVF_NCENT,
        _IVF_TRAIN_BUDGET,
        _PQ_K,
        _PQ_M,
    )
    from flink_realtime_2024_spark.sources.io import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    sample = np.array(
        [
            r["embedding"]
            for r in emb.select("vec_id", "embedding")
            .orderBy((F.col("vec_id") * F.lit(_IVF_KNUTH)) % F.lit(2**32), "vec_id")
            .limit(_IVF_TRAIN_BUDGET)
            .collect()
        ],
        dtype=np.float64,
    )
    corpus = np.array(
        [r["embedding"] for r in emb.select("embedding").collect()],
        dtype=np.float64,
    )

    def min_margin_desc(D):  # best minus second-best (maximization)
        part = np.partition(D, D.shape[1] - 2, axis=1)
        return float((part[:, -1] - part[:, -2]).min())

    # IVF: 10 cosine Lloyd rounds, then the full-corpus assignment
    cent = sample[:_IVF_NCENT].copy()
    ivf_margin = np.inf
    for _ in range(10):
        D = sample @ cent.T
        ivf_margin = min(ivf_margin, min_margin_desc(D))
        a = D.argmax(axis=1)
        for c in range(_IVF_NCENT):
            mem = sample[a == c]
            if len(mem):
                m = mem.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cent[c] = m / n
    ivf_margin = min(ivf_margin, min_margin_desc(corpus @ cent.T))
    assert ivf_margin >= 1e-9, (
        f"IVF argmax margin {ivf_margin} within reduction noise — "
        "llm_knn_ivf's full oracle is not assertable on this corpus"
    )
    # the probe-set CUT is a raw-dot rank decision too: each query
    # probes its top _IVF_NPROBE centroids, so the rank-nprobe vs
    # rank-(nprobe+1) gap must also clear the noise floor (measured
    # 6.1e-4 at sf0.01) — an argmax-only guard would miss a tied cut
    from flink_realtime_2024_spark.operators.llm import (
        _IVF_NPROBE,
        _KNN_MAX_QUERIES,
        _KNN_QUERY_MOD,
    )

    qrows = (
        emb.select("vec_id", "embedding")
        .filter(F.col("vec_id") % _KNN_QUERY_MOD == 0)
        .orderBy("vec_id")
        .limit(_KNN_MAX_QUERIES)
        .collect()
    )
    Qm = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qd = np.sort(Qm @ cent.T, axis=1)[:, ::-1]
    cut_margin = float((qd[:, _IVF_NPROBE - 1] - qd[:, _IVF_NPROBE]).min())
    assert cut_margin >= 1e-9, (
        f"IVF probe-cut margin {cut_margin} within reduction noise — "
        "llm_knn_ivf's full oracle is not assertable on this corpus"
    )

    # PQ: per-subspace Euclidean Lloyd rounds, then full-corpus encode
    d = sample.shape[1]
    dsub = d // _PQ_M
    pq_margin = np.inf
    for mi in range(_PQ_M):
        sub = sample[:, mi * dsub : (mi + 1) * dsub]
        cw = sub[:_PQ_K].copy()
        for _ in range(10):
            d2 = ((sub[:, None, :] - cw[None, :, :]) ** 2).sum(-1)
            pq_margin = min(pq_margin, min_margin_desc(-d2))
            a = d2.argmin(axis=1)
            for c in range(_PQ_K):
                mem = sub[a == c]
                if len(mem):
                    cw[c] = mem.mean(axis=0)
        csub = corpus[:, mi * dsub : (mi + 1) * dsub]
        d2 = ((csub[:, None, :] - cw[None, :, :]) ** 2).sum(-1)
        pq_margin = min(pq_margin, min_margin_desc(-d2))
    assert pq_margin >= 1e-9, (
        f"PQ argmin margin {pq_margin} within reduction noise — "
        "llm_knn_pq's full oracle is not assertable on this corpus"
    )


def test_kmeans_deterministic_and_better_than_random(spark):
    """Fixed init + fixed rounds ⇒ bit-stable assignment across runs;
    quality: mean cosine-to-own-centroid must beat assigning everything
    to the global mean direction (the 1-cluster baseline)."""
    from flink_realtime_2024_spark.operators.llm import kmeans_assign
    from flink_realtime_2024_spark.sources.io import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    a1 = kmeans_assign(emb).select("vec_id", "cluster_id", "embedding").collect()
    a2 = kmeans_assign(emb).select("vec_id", "cluster_id").collect()
    m1 = {r["vec_id"]: r["cluster_id"] for r in a1}
    m2 = {r["vec_id"]: r["cluster_id"] for r in a2}
    assert m1 == m2, "k-means assignment is not deterministic"

    E = np.array([r["embedding"] for r in a1], dtype=np.float64)
    labels = np.array([r["cluster_id"] for r in a1])
    # in-cluster centroid cosine
    score = 0.0
    for c in np.unique(labels):
        sel = E[labels == c]
        cent = sel.mean(axis=0)
        n = np.linalg.norm(cent)
        if n > 0:
            score += float((sel @ (cent / n)).sum())
    score /= len(E)
    g = E.mean(axis=0)
    g /= np.linalg.norm(g)
    baseline = float((E @ g).mean())
    assert score > baseline + 0.05, f"kmeans no better than 1 cluster: {score} vs {baseline}"


def test_semantic_dedup_finds_injected_dups(spark):
    """SemDeDup on fixtures alone: zero dups (near-uniform sphere).
    With injected near-copies: every copy must be flagged with its
    original as keeper (same cluster ⇒ cosine ≈ 1 ≥ τ)."""
    from flink_realtime_2024_spark.operators.llm import kmeans_assign, semdedup_pipeline
    from flink_realtime_2024_spark.sources.io import load_table

    base_df = load_table(spark, SF_DIR, "embeddings")
    base = base_df.limit(10).collect()
    rng = np.random.RandomState(1)
    rows = []
    for r in base:
        v = np.array(r["embedding"], dtype=np.float64)
        v2 = v + rng.normal(scale=0.01, size=v.shape)
        v2 /= np.linalg.norm(v2)
        rows.append((int(r["vec_id"]) + 1_000_000, [float(x) for x in v2]))
    dups = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    combined = base_df.select("vec_id", "embedding").unionByName(dups)

    res = semdedup_pipeline(kmeans_assign(combined)).collect()
    flagged = {r["vec_id"]: r["keeper_vec_id"] for r in res if r["is_dup"] == 1}
    for r in base:
        copy_id = int(r["vec_id"]) + 1_000_000
        assert copy_id in flagged, f"injected dup {copy_id} not flagged"
        assert flagged[copy_id] == int(r["vec_id"])


def test_knn_int8_recall(spark):
    """Int8 quantization at 64 dims loses <1% score precision — top-5
    must match the exact kNN almost everywhere."""
    from flink_realtime_2024_spark.operators.llm import llm_knn_cosine, llm_knn_int8

    exact = {}
    for r in llm_knn_cosine(spark, SF_DIR).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx = {}
    for r in llm_knn_int8(spark, SF_DIR).collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(approx) == set(exact)
    hits = sum(len(approx[q] & exact[q]) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    assert hits / total >= 0.9, f"int8 recall too low: {hits / total}"


def test_pack_sequences_layout_independent(spark):
    """Packing must be a pure function of the data: the same (doc_id,
    n_tok) rows produce byte-identical bins whether the input arrives
    in 1 partition or 17, shuffled or sorted — the property that makes
    a 100 TB packing run reproducible. Also: bin budget respected
    except for single oversized docs, and bins are contiguous in
    doc_id order within a shard."""
    from flink_realtime_2024_spark.operators.llm import (
        _PACK_BUDGET,
        pack_pipeline,
    )

    rng = np.random.RandomState(7)
    rows = [(int(i), int(t)) for i, t in enumerate(rng.randint(1, 3000, size=400))]
    df = spark.createDataFrame(rows, "doc_id bigint, n_tok bigint")

    a = {
        (r["doc_id"]): (r["bucket"], r["bin_id"])
        for r in pack_pipeline(df.repartition(1)).collect()
    }
    shuffled = spark.createDataFrame(list(reversed(rows)), "doc_id bigint, n_tok bigint")
    b = {
        (r["doc_id"]): (r["bucket"], r["bin_id"])
        for r in pack_pipeline(shuffled.repartition(17)).collect()
    }
    assert a == b, "packing depends on input layout"

    packed = pack_pipeline(df).collect()
    fills: dict = {}
    for r in packed:
        key = (r["bucket"], r["bin_id"])
        fills.setdefault(key, []).append(r["n_tok"])
    for key, toks in fills.items():
        if len(toks) > 1:
            assert sum(toks) <= _PACK_BUDGET, (key, sum(toks))


def _bpe_reference(word_counts, n_merges):
    """Pure-Python Sennrich-style BPE trainer: returns the merge list
    [(rank, left, right, merged, count)] with (count desc, left, right)
    tie-breaking — the exact contract bpe_train promises."""
    syms = {w: tuple(list(w) + ["</w>"]) for w in word_counts}
    merges = []
    for rank in range(n_merges):
        counts = {}
        for w, c in word_counts.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + c
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((rank, a, b, a + b, cnt))
        for w in syms:
            s = list(syms[w])
            res, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            syms[w] = tuple(res)
    return merges, syms


def test_bpe_train_matches_reference(spark):
    """Distributed BPE training must produce the exact merge table a
    sequential reference implementation produces (same tie-breaking),
    and the encoder's per-word token counts must match the reference's
    final symbol tables."""
    from flink_realtime_2024_spark.operators.llm import bpe_train, bpe_encode_counts

    texts = [
        "low low low low low",
        "lower lower newest newest",
        "newest newest newest newest",
        "wider wider wider new new",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )

    word_counts = {}
    for t in texts:
        for w in t.split():
            word_counts[w] = word_counts.get(w, 0) + 1
    ref_merges, ref_syms = _bpe_reference(word_counts, n_merges=10)

    got = [
        (r["merge_rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_train(docs, n_merges=10).orderBy("merge_rank").collect()
    ]
    assert got == ref_merges

    # batched rounds (the default) must be bit-identical to strict
    # 1-merge-per-round training — the _bpe_select_batch exactness claim
    got_seq = [
        (r["merge_rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_train(docs, n_merges=10, merges_per_round=1)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got_seq == ref_merges

    enc = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_encode_counts(
            docs, [(m[1], m[2]) for m in ref_merges]
        ).collect()
    }
    for i, t in enumerate(texts):
        words = t.split()
        expect = sum(len(ref_syms[w]) for w in words)
        assert enc[i] == (len(words), expect)

    # the encoder's tokenizer must be the TRAINER'S (Java/RE2 ASCII \s),
    # not Python str.split(): NULL text is zero words (not the word
    # 'none'), and U+00A0 — Unicode whitespace but not ASCII \s — is
    # word-internal, so 'low\xa0low' is ONE word on both engines
    tricky = spark.createDataFrame(
        [(100, None), (101, "low low")], "doc_id bigint, text string"
    )
    enc2 = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_encode_counts(
            tricky, [(m[1], m[2]) for m in ref_merges]
        ).collect()
    }
    assert enc2[100] == (0, 0)
    assert enc2[101][0] == 1


def test_bpe_batched_matches_reference_tie_heavy(spark):
    """Adversarial fixture for batched merge selection: many pair counts
    tie and top pairs share symbols, so naive disjoint-prefix batching
    would reorder merges. The batched trainer must still reproduce the
    sequential reference exactly (batch acceptance falls back to the
    argmax when the 4×c_guard exactness bound can't be met)."""
    from flink_realtime_2024_spark.operators.llm import bpe_train

    # 'abab'-family words create chained pairs (a,b),(b,a) with close,
    # frequently-tying counts; 'zz'/'zy' exercise the merged-symbol
    # occupancy rule (pre-existing spelling equal to a merge output)
    texts = [
        "abab abab abab baba baba",
        "abba abba aabb aabb aabb",
        "zz zz zz zy zy zzy zzy",
        "ab ab ab ba ba ba ba",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    word_counts = {}
    for t in texts:
        for w in t.split():
            word_counts[w] = word_counts.get(w, 0) + 1
    ref_merges, _ = _bpe_reference(word_counts, n_merges=12)
    got = [
        (r["merge_rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_train(docs, n_merges=12).orderBy("merge_rank").collect()
    ]
    assert got == ref_merges


def test_bpe_train_branches_match_reference(spark, monkeypatch):
    """The r15 loop has three code paths: the delimited-string fast loop
    (n_ctrl == 0, narrow width), the array+fold fallback (any word
    containing the chr(30)/chr(31) delimiters), and the plain-groupBy
    wide branch (derived width ≥ session shuffle width, which restores
    map-side partial aggregation). All three must reproduce the
    sequential reference exactly."""
    import flink_realtime_2024_spark.operators.llm.text as X
    from flink_realtime_2024_spark.operators.llm import bpe_train

    # (a) control-char corpus → n_ctrl > 0 → array+fold loop end to end
    texts = [
        "low low low low low",
        "lower lower newest newest",
        f"sp{X._BPE_TOK_OPEN}ike sp{X._BPE_TOK_OPEN}ike wider wider",
        f"od{X._BPE_TOK_CLOSE}d new new newest newest",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    word_counts: dict = {}
    for t in texts:
        for w in t.split():
            word_counts[w] = word_counts.get(w, 0) + 1
    ref_merges, _ = _bpe_reference(word_counts, n_merges=8)
    got = [
        (r["merge_rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_train(docs, n_merges=8).orderBy("merge_rank").collect()
    ]
    assert got == ref_merges

    # (b) clean corpus forced onto the WIDE branch: a 1-row-per-task
    # budget makes the derived width exceed the session shuffle width,
    # so the loop must take the plain-groupBy (partial-agg) shape and
    # still match the narrow fast loop's reference result
    texts2 = [
        "low low low low low",
        "lower lower newest newest",
        "newest newest newest newest",
        "wider wider wider new new",
    ]
    docs2 = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts2)], "doc_id bigint, text string"
    )
    wc2: dict = {}
    for t in texts2:
        for w in t.split():
            wc2[w] = wc2.get(w, 0) + 1
    ref2, _ = _bpe_reference(wc2, n_merges=8)
    monkeypatch.setattr(X, "_BPE_PAIR_ROWS_PER_TASK", 1)
    got2 = [
        (r["merge_rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_train(docs2, n_merges=8).orderBy("merge_rank").collect()
    ]
    assert got2 == ref2


def test_fuzzy_pairs_deletion_neighborhood_guarantee(spark):
    """Deletion-neighborhood blocking must find EVERY pair at edit
    distance ≤ 1 — substitution, insertion, deletion — and nothing at
    distance ≥ 2 (verify filter)."""
    from flink_realtime_2024_spark.operators.llm import fuzzy_pairs_dist1

    names = ["gear", "bear", "gears", "ear", "gopher", "widget", "widgit", "wídget"]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in fuzzy_pairs_dist1(df).collect()
    }
    expect = set()
    def lev(a, b):
        import functools
        @functools.lru_cache(None)
        def d(i, j):
            if i == 0 or j == 0:
                return i + j
            return min(d(i-1, j) + 1, d(i, j-1) + 1,
                       d(i-1, j-1) + (a[i-1] != b[j-1]))
        return d(len(a), len(b))
    for i, a in enumerate(names):
        for b in names[i+1:]:
            x, y = sorted((a, b))
            if lev(x, y) <= 1:
                expect.add((x, y, lev(x, y)))
    assert got == expect and len(expect) >= 4


def test_bucketed_join_has_no_exchange(spark):
    """Both join sides are bucketed by the join key, so the SMJ and the
    per-order aggregate must run with ZERO shuffle exchanges — the
    whole point of paying the bucketed write once."""
    from flink_realtime_2024_spark.plans.warehouse import warehouse_bucketed_join

    df = warehouse_bucketed_join(spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "SortMergeJoin" in plan
    exchanges = [
        l for l in plan.splitlines()
        if re.search(r"\bExchange\b", l) and "BroadcastExchange" not in l
    ]
    assert exchanges == [], f"unexpected shuffle exchanges: {exchanges}"
    assert "BroadcastExchange" not in plan


def test_driver_rotation_self_computes(tmp_path):
    """From round 5 the driver-sample prefix derives from the committed
    CORRECTNESS recordings: unrecorded ids come right after flagship,
    recorded ids follow stalest-first; before a round-4 recording
    exists the computation declines (returns None)."""
    import json
    from flink_realtime_2024_spark.plans.registry import _auto_rotation, all_queries

    names = list(all_queries())
    flagship = "flagship_revenue_by_nation"
    ok = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
    rows_only = {"rows_match": None, "err": "no_oracle"}
    # r1-r3 only → must decline (round-4 prefix is hand-pinned)
    r3_only = names[60]  # recorded in r3, absent from the r4 recording
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps({r3_only: ok}))
    assert _auto_rotation(str(tmp_path)) is None

    # add a round-4 recording → rotation activates. One id failed its
    # r4 check, one was rows-only (no_oracle — NOT a failure).
    r4_ids = [n for n in names[:50] if n != r3_only]
    failed_id = r4_ids[10]
    r4 = {n: dict(ok) for n in r4_ids}
    r4[failed_id] = {"rows_match": True, "schema_match": True,
                     "hash_match": False, "err": None}
    r4[r4_ids[11]] = dict(rows_only)
    (tmp_path / "CORRECTNESS_r04.json").write_text(json.dumps(r4))
    order = _auto_rotation(str(tmp_path))
    assert order is not None
    assert order[0] == flagship
    assert set(order) == set(names)  # a permutation of the registry
    pos = {n: i for i, n in enumerate(order)}
    # last round's red comes immediately after flagship, before never-checked
    assert pos[failed_id] == 1
    never = [n for n in names if n not in r4 and n not in (flagship, r3_only)]
    recorded_ok = [n for n in r4_ids if n not in (flagship, failed_id)]
    # every never-recorded id precedes every green recorded one
    assert max(pos[n] for n in never) < min(pos[n] for n in recorded_ok)
    # staleness: the id last seen in r3 sorts before everything seen in r4
    assert pos[r3_only] < min(pos[n] for n in recorded_ok)
    # rows-only is not treated as a failure
    assert pos[r4_ids[11]] > max(pos[n] for n in never)


def test_retract_stream_group_migration(spark):
    """Retract algebra on a handcrafted changelog where an update MOVES
    a row between groups (status P→F) and a key is created then deleted:
    the signed aggregate must migrate the contribution across groups and
    net the deleted key to zero — the exact case append-only semantics
    cannot express (Flink retract mode's motivation)."""
    import pyspark.sql.functions as F
    from flink_realtime_2024_spark.sources.cdc import changelog_to_retract
    from flink_realtime_2024_spark.operators._util import dec

    rows = [
        (1, "c", 100.0, "P", 1000),  # created P@100
        (1, "u", 150.0, "F", 2000),  # moves to F@150 — must retract P
        (2, "c", 50.0, "P", 1500),   # stays P@50
        (3, "c", 70.0, "O", 1200),   # created then deleted — nets to 0
        (3, "d", None, None, 1800),
    ]
    log = spark.createDataFrame(
        rows, "key bigint, op string, totalprice double, orderstatus string, ts_ms bigint"
    )
    retract = changelog_to_retract(log)
    kinds = {
        (r["key"], r["kind"], r["status"], r["price"]) for r in retract.collect()
    }
    assert (1, "+I", "P", 100.0) in kinds
    assert (1, "-U", "P", 100.0) in kinds, "before-image must be recovered"
    assert (1, "+U", "F", 150.0) in kinds
    assert (3, "-D", "O", 70.0) in kinds, "delete must retract the last image"

    agg = {
        r["status"]: (r["n"], r["v"])
        for r in retract.groupBy("status")
        .agg(
            F.sum("sign").alias("n"),
            F.sum(F.col("sign") * dec("price")).cast("double").alias("v"),
        )
        .collect()
    }
    assert agg["F"] == (1, 150.0), "update's contribution migrated to F"
    assert agg["P"] == (1, 50.0), "P retains only key 2 after retraction"
    assert agg["O"] == (0, 0.0), "create+delete nets to zero"


def test_wav_chunk_walk_tolerates_noncanonical_layout():
    """A WAV with a LIST chunk BEFORE fmt/data (legal RIFF, produced by
    many encoders) must parse identically to the canonical layout in
    BOTH consumers — decode_audio and the resize_stats kernel share
    _wav_parse, so fixed-offset mis-parses are structurally impossible."""
    import struct as st
    import numpy as np
    from flink_realtime_2024_spark.operators.multimodal import (
        _wav_parse,
        decode_audio,
        encode_wav,
    )

    rng = np.random.RandomState(11)
    samples = rng.randint(-3000, 3000, size=512).astype(np.int16)
    canonical = encode_wav(samples, rate=8000)
    # rebuild with an INFO LIST chunk injected before fmt
    fmt_and_data = canonical[12:]
    info = b"INFOISFT" + st.pack("<I", 6) + b"spark\x00"
    list_chunk = b"LIST" + st.pack("<I", len(info)) + info
    body = list_chunk + fmt_and_data
    weird = b"RIFF" + st.pack("<I", 4 + len(body)) + b"WAVE" + body

    ftag, ch, rate, bits, got = _wav_parse(weird)
    assert (ftag, ch, rate, bits) == (1, 1, 8000, 16)
    assert np.array_equal(got, samples)
    assert decode_audio(weird) == decode_audio(canonical)


def test_png_roundtrip_and_all_filters():
    """decode_png must invert encode_png exactly AND reverse every
    scanline filter type (Sub/Up/Average/Paeth), proven by a test-local
    encoder that FORWARD-filters each row with a chosen type."""
    import struct as st
    import zlib
    import numpy as np
    from flink_realtime_2024_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.RandomState(7)
    for (h, w) in [(1, 1), (3, 5), (16, 11), (24, 24)]:
        px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(px)), px)

    # forward-filter each row with filter type (row index % 5)
    px = rng.randint(0, 256, size=(12, 9, 3), dtype=np.uint8)
    h, w, bpp = 12, 9, 3
    stride = w * bpp
    flat = px.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    for y in range(h):
        f = y % 5
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, dtype=np.int32)
        a = np.concatenate([np.zeros(bpp, dtype=np.int32), cur[:-bpp]])
        c = np.concatenate([np.zeros(bpp, dtype=np.int32), prev[:-bpp]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - a
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            enc = cur - (a + prev) // 2
        else:
            p = a + prev - c
            pa, pb, pc = np.abs(p - a), np.abs(p - prev), np.abs(p - c)
            pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, prev, c))
            enc = cur - pred
        raw.append(f)
        raw.extend((enc & 0xFF).astype(np.uint8).tobytes())

    def chunk(tag, body):
        return st.pack(">I", len(body)) + tag + body + st.pack(
            ">I", zlib.crc32(tag + body) & 0xFFFFFFFF
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", st.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(payload), px)


def test_mulaw_codec_properties():
    """μ-law expand∘compress must be sign-preserving, monotone, and
    within the codec's worst-case quantization error; a full WAV
    round-trip through decode_audio must report the expanded RMS."""
    import numpy as np
    from flink_realtime_2024_spark.operators.multimodal import (
        _mulaw_compress,
        _mulaw_expand,
        decode_audio,
        encode_wav_mulaw,
    )

    s = np.linspace(-32000, 32000, 4001).astype(np.int16)
    rt = _mulaw_expand(_mulaw_compress(s))
    assert np.all(np.sign(rt) == np.sign(s)) or np.all(np.abs(s[np.sign(rt) != np.sign(s)]) < 64)
    # worst-case μ-law quantization step at max amplitude is 1024
    assert np.max(np.abs(rt.astype(np.int32) - s.astype(np.int32))) <= 1024
    # monotone non-decreasing reconstruction over increasing input
    assert np.all(np.diff(rt.astype(np.int32)) >= 0)

    wav = encode_wav_mulaw(s, rate=8000)
    info = decode_audio(wav)
    assert info["sample_rate"] == 8000
    expect_rms = float(np.sqrt(np.mean(rt.astype(np.float64) ** 2)))
    assert abs(info["mean_value"] - expect_rms) < 1e-9


def test_jpeg_roundtrip_and_structure():
    """Baseline JFIF codec (operators/_jpeg.py): flat blocks survive
    exactly (DC-only), smooth content reconstructs above 40 dB PSNR,
    grayscale 1-component payloads decode, dimensions/padding are
    honored for non-multiple-of-8 sizes, and unsupported JPEG classes
    are rejected loudly rather than mis-decoded."""
    import numpy as np
    import pytest as _pytest

    from flink_realtime_2024_spark.operators._jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    # flat color: every block is DC-only → quantized exactly
    flat = np.full((16, 16, 3), 128, dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(flat, 90)), flat)

    # smooth gradients at odd dimensions (edge padding + crop)
    yy, xx = np.mgrid[0:37, 0:29]
    sm = np.stack([(yy * 3) % 256, (xx * 5) % 256, (yy + xx) % 256], -1).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(sm, 90))
    assert dec.shape == sm.shape
    err = dec.astype(float) - sm.astype(float)
    psnr = 10 * np.log10(255.0**2 / (err**2).mean())
    assert psnr > 40.0, psnr

    # quality monotonicity: higher quality → lower error
    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=(24, 24, 3), dtype=np.uint8)
    errs = []
    for q in (30, 70, 95):
        d = decode_jpeg(encode_jpeg(px, q)).astype(float)
        errs.append(((d - px) ** 2).mean())
    assert errs[0] > errs[1] > errs[2], errs

    # grayscale single-component path
    g = rng.randint(0, 256, size=(8, 8), dtype=np.uint8)
    dg = decode_jpeg(encode_jpeg(g, 95))
    assert dg.shape == (8, 8, 3)
    assert np.abs(dg[:, :, 0].astype(int) - g.astype(int)).mean() < 10

    # loud rejection of what we don't implement (never mis-decode):
    # a baseline scan header (Ss=0..Se=63) re-labeled SOF2 is a
    # MALFORMED progressive stream — progressive DC scans require Se=0
    bad = bytearray(encode_jpeg(flat, 90))
    sof = bytes(bad).find(b"\xff\xc0")
    bad[sof + 1] = 0xC2
    with _pytest.raises(ValueError):
        decode_jpeg(bytes(bad))
    # arithmetic-coded SOF9 stays rejected
    bad[sof + 1] = 0xC9
    with _pytest.raises(ValueError):
        decode_jpeg(bytes(bad))


def test_jpeg_progressive_roundtrip():
    """Progressive JPEG (SOF2, T.81 Annex G): the six-scan successive-
    approximation encoding must decode BIT-IDENTICALLY to the baseline
    encoding of the same pixels (same quant pipeline → same
    coefficients → same IDCT), across 4:4:4, 4:2:0 (including odd
    ceil-grid vs MCU-padded-grid shapes), and grayscale — exercising
    DC first/refine, AC first (EOB runs, ZRL), and AC refinement with
    interleaved correction bits."""
    import numpy as np

    from flink_realtime_2024_spark.operators._jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(7)
    cases = [
        ((16, 16, 3), False),  # 4:4:4 aligned
        ((24, 40, 3), False),  # 4:4:4 rectangular
        ((20, 20, 3), True),   # 4:2:0
        ((33, 50, 3), True),   # 4:2:0, ceil grid ≠ 16-padded grid
        ((17, 23), False),     # grayscale, odd dims
    ]
    for shape, sub in cases:
        px = rng.randint(0, 256, size=shape, dtype=np.uint8)
        prog = encode_jpeg_progressive(px, quality=85, subsample=sub)
        # the container really is progressive
        assert b"\xff\xc2" in prog and b"\xff\xc0" not in prog.split(b"\xff\xda")[0]
        assert np.array_equal(
            decode_jpeg(prog), decode_jpeg(encode_jpeg(px, quality=85, subsample=sub))
        ), (shape, sub)
    # sparse-coefficient content (smooth gradient + speckles) drives the
    # ZRL / long-zero-run branches of the refinement coder
    for q in (30, 75, 95):
        base = np.outer(np.linspace(0, 255, 41), np.ones(57))
        px = np.clip(base + rng.normal(0, 3, (41, 57)), 0, 255).astype(np.uint8)
        px3 = np.stack([px, np.roll(px, 3, 0), np.roll(px, 5, 1)], axis=-1)
        assert np.array_equal(
            decode_jpeg(encode_jpeg_progressive(px3, quality=q)),
            decode_jpeg(encode_jpeg(px3, quality=q)),
        ), q


def test_jpeg_progressive_decoder_eob_runs():
    """Progressive decoder vs a HAND-CONSTRUCTED multi-block AC scan
    using an EOB run LONGER than 1 (EOB1 = run of 2 with appended bit),
    which our encoder never emits — proving the decoder implements the
    T.81 §G.1.2.2 EOBn contract, not just its own encoder's subset."""
    import struct

    import numpy as np

    from flink_realtime_2024_spark.operators._jpeg import (
        _HuffEncoder,
        _BitWriter,
        decode_jpeg,
    )

    # 8x32 grayscale → 4 blocks. DC scan gives each block DC=0; the AC
    # first scan sets block0 k=1 to +1<<Al, then EOB1(run=2, extra bit
    # 0 → 2 blocks all-zero), then block3 k=1 to -1<<Al. EOBn symbols
    # (0x10…) aren't in the baseline Annex-K tables, so the scan uses a
    # custom DHT — exactly what real progressive encoders emit.
    ac_bits = [0, 3] + [0] * 14  # three symbols, all 2-bit codes
    ac_vals = [0x00, 0x10, 0x01]  # EOB, EOB1, run0/size1
    dc_bits = [1] + [0] * 15
    dc_vals = [0x00]
    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes([16] * 64)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 8, 32, 1)
    out += struct.pack("BBB", 1, 0x11, 0)
    for (bits, vals), tc_th in (((dc_bits, dc_vals), 0x00), ((ac_bits, ac_vals), 0x10)):
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
    # DC first scan: four zero diffs
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + struct.pack("BB", 1, 0x00)
    out += struct.pack("BBB", 0, 0, 0x01)  # Ss=0 Se=0 Ah=0 Al=1
    dc = _HuffEncoder(dc_bits, dc_vals)
    wtr = _BitWriter()
    for _ in range(4):
        wtr.put(dc.code[0], dc.size[0])
    wtr.flush()
    out += wtr.out
    # AC first scan with a 2-block EOB run in the middle
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + struct.pack("BB", 1, 0x10)
    out += struct.pack("BBB", 1, 63, 0x01)  # Ss=1 Se=63 Ah=0 Al=1
    ac = _HuffEncoder(ac_bits, ac_vals)
    wtr = _BitWriter()
    wtr.put(ac.code[0x01], ac.size[0x01])  # block0: run0/size1 at k=1
    wtr.put(1, 1)                          # amplitude +1
    wtr.put(ac.code[0x00], ac.size[0x00])  # EOB for rest of block0
    wtr.put(ac.code[0x10], ac.size[0x10])  # EOB1: run = 2 + 1 appended bit
    wtr.put(0, 1)                          # appended bit 0 → run 2
    wtr.put(ac.code[0x01], ac.size[0x01])  # block3: run0/size1 at k=1
    wtr.put(0, 1)                          # amplitude -1
    wtr.put(ac.code[0x00], ac.size[0x00])  # EOB for rest of block3
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"
    img = decode_jpeg(bytes(out))
    assert img.shape == (8, 32, 3)
    # reference: same coefficients through the baseline path
    coef = np.zeros((8, 32), np.int64)
    blocks = np.zeros((4, 64), np.int64)
    blocks[0][1] = (1 << 1) * 16   # dequant: coef<<Al then * qtab=16
    blocks[3][1] = (-1 << 1) * 16
    from flink_realtime_2024_spark.operators._jpeg import _ZIGZAG, _D

    for b in range(4):
        z = np.zeros(64)
        z[_ZIGZAG] = blocks[b]
        pix = _D.T @ z.reshape(8, 8) @ _D + 128.0
        coef[:, b * 8 : (b + 1) * 8] = np.round(np.clip(pix, 0, 255))
    assert np.array_equal(img[:, :, 0].astype(np.int64), coef)


def test_jpeg_decoder_independent_of_encoder():
    """Decoder checked against a HAND-CONSTRUCTED entropy stream, not
    our own encoder (no shared-bug blind spot): a 1-block grayscale
    JPEG whose scan encodes DC diff = +2 and a single AC coefficient,
    built bit-by-bit from the T.81 Annex-K code tables, must decode to
    the analytically computed IDCT pixels."""
    import struct
    import numpy as np

    from flink_realtime_2024_spark.operators._jpeg import (
        _D,
        _HUFF_AC_LUMA,
        _HUFF_DC_LUMA,
        _HuffEncoder,
        _UNZIGZAG,
        decode_jpeg,
    )

    qtab = np.ones((8, 8), dtype=np.int32)  # quant table of all 1s
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes([1] * 64)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 8, 1) + bytes([1, 0x11, 0])
    for (bits, vals), tcth in ((_HUFF_DC_LUMA, 0x00), (_HUFF_AC_LUMA, 0x10)):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tcth)
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])

    # entropy stream by hand: DC size=2 bits amp=binary(2)='10';
    # AC (run=0,size=1) amp='1' (+1) at zigzag index 1; then EOB
    dc = _HuffEncoder(*_HUFF_DC_LUMA)
    ac = _HuffEncoder(*_HUFF_AC_LUMA)
    stream_bits = ""
    stream_bits += format(dc.code[2], f"0{dc.size[2]}b") + "10"   # DC = +2
    stream_bits += format(ac.code[0x11], f"0{ac.size[0x11]}b") + "1"  # AC[1] = +1
    stream_bits += format(ac.code[0x00], f"0{ac.size[0x00]}b")    # EOB
    stream_bits += "1" * (-len(stream_bits) % 8)                  # 1-pad
    stream = bytearray()
    for i in range(0, len(stream_bits), 8):
        b = int(stream_bits[i : i + 8], 2)
        stream.append(b)
        if b == 0xFF:
            stream.append(0x00)
    out += bytes(stream) + b"\xff\xd9"

    # analytic reference: coefficients → IDCT → +128 level shift
    z = np.zeros(64)
    z[0], z[1] = 2.0, 1.0
    coeff = z[_UNZIGZAG].reshape(8, 8) * qtab
    expect = np.clip(np.round(_D.T @ coeff @ _D + 128.0), 0, 255).astype(np.uint8)

    got = decode_jpeg(bytes(out))
    assert np.array_equal(got[:, :, 0], expect), (got[:, :, 0], expect)


def test_jpeg_420_subsampling():
    """4:2:0 mode (the camera/browser default layout): 16×16 MCU
    interleave + 2×2-mean chroma downsample must roundtrip — flat
    images exactly, smooth gradients above 40 dB PSNR at every
    dimension class (MCU-aligned, odd, sub-MCU) — and must emit
    smaller payloads than 4:4:4 on the same content."""
    import numpy as np

    from flink_realtime_2024_spark.operators._jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    flat = np.full((32, 32, 3), 200, dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(flat, 90, subsample=True)), flat)

    for shape in [(16, 16), (37, 29), (8, 8)]:
        yy, xx = np.mgrid[0 : shape[0], 0 : shape[1]]
        px = np.stack([(yy * 3) % 256, (xx * 5) % 256, (yy + xx) % 256], -1).astype(
            np.uint8
        )
        dec = decode_jpeg(encode_jpeg(px, 90, subsample=True))
        assert dec.shape == px.shape
        err = dec.astype(float) - px.astype(float)
        psnr = 10 * np.log10(255.0**2 / (err**2).mean())
        assert psnr > 40.0, (shape, psnr)

    yy, xx = np.mgrid[0:48, 0:40]
    sm = np.stack([(yy * 2) % 256, (xx * 3) % 256, (yy * xx) % 256], -1).astype(np.uint8)
    assert len(encode_jpeg(sm, 85, subsample=True)) < len(encode_jpeg(sm, 85))


def test_mix_schedule_prefix_property(spark):
    """Stride scheduling's defining property: every prefix of the
    schedule contains the target mixture within one stride per domain
    (|count_d(L) - w_d·L| ≤ 1 + w_d·stride slack) — checked at many
    prefix lengths, plus per-domain within-order determinism."""
    from flink_realtime_2024_spark.operators.llm import llm_mix_schedule

    rows = llm_mix_schedule(spark, SF_DIR).orderBy("position").collect()
    langs = [r["lang"] for r in rows]
    n = len(rows)

    def weight(lang):
        return {"en": 0.5, "de": 0.2, "fr": 0.2}.get(lang, 0.1)

    present = sorted(set(langs))
    total_w = sum(weight(d) for d in present)
    # test prefixes BEFORE any domain exhausts (after exhaustion the
    # remaining domains legitimately absorb its share)
    exhaust = min(
        int(langs.count(d) * total_w / weight(d)) for d in present
    )
    for frac in (0.2, 0.5, 0.9):
        L = max(1, int(exhaust * frac))
        prefix = langs[:L]
        for d in present:
            share = weight(d) / total_w
            got = prefix.count(d)
            # stride scheduling keeps every prefix within ~1 stride of
            # the target share
            assert abs(got - share * L) <= 1.0 / share + 1, (d, L, got, share * L)

    # positions are a permutation
    pos = [r["position"] for r in rows]
    assert sorted(pos) == list(range(1, n + 1))


def test_gif_roundtrip_and_structure():
    """GIF89a codec (operators/_gif.py): lossless LZW round-trip on
    random palettes/indices including the hard paths — KwKwK
    self-reference, constant-run dictionary growth, and the 4096-entry
    table reset — plus container structure (magic, screen descriptor
    dims, trailer)."""
    import numpy as np

    from flink_realtime_2024_spark.operators._gif import decode_gif, encode_gif

    rng = np.random.RandomState(11)
    pal = rng.randint(0, 256, size=(256, 3)).astype(np.uint8)
    for h, w in ((1, 1), (5, 3), (24, 31)):
        idx = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
        g = encode_gif(idx, pal)
        assert g[:6] == b"GIF89a" and g[-1:] == b"\x3b"
        import struct

        sw, sh = struct.unpack_from("<HH", g, 6)
        assert (sw, sh) == (w, h)
        assert (decode_gif(g) == pal[idx]).all()
    # constant image: long runs grow single-prefix chains
    idx = np.zeros((64, 64), dtype=np.uint8)
    assert (decode_gif(encode_gif(idx, pal)) == pal[idx]).all()
    # large random image: forces ≥1 dictionary reset at code 4095
    idx = rng.randint(0, 256, size=(300, 300)).astype(np.uint8)
    assert (decode_gif(encode_gif(idx, pal)) == pal[idx]).all()


def test_gif_rejects_malformed():
    import numpy as np
    import pytest as _pytest

    from flink_realtime_2024_spark.operators._gif import decode_gif, encode_gif

    with _pytest.raises(ValueError):
        decode_gif(b"NOTAGIF")
    pal = np.zeros((256, 3), dtype=np.uint8)
    g = encode_gif(np.zeros((4, 4), dtype=np.uint8), pal)
    # truncate inside the LZW stream → loud failure, not garbage pixels
    with _pytest.raises(ValueError):
        decode_gif(g[: len(g) // 2])


def test_jpeg_restart_intervals():
    """DRI + RSTn (T.81 §F.2.1.3.1, round-7): encodings with restart
    markers — baseline AND progressive, every sampling mode — must
    decode bit-identically to the marker-free encoding (restarts only
    resynchronize: byte-align, reset DC predictors / EOB runs). Also
    decodes a REAL third-party camera-style JPEG with restart markers
    when one is present on the system (independent-encoder check)."""
    import os

    import numpy as np
    import pytest as _pytest

    from flink_realtime_2024_spark.operators._jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(5)
    for shape, sub in [((24, 40, 3), False), ((33, 50, 3), True), ((17, 23), False)]:
        px = rng.randint(0, 256, size=shape, dtype=np.uint8)
        ref = decode_jpeg(encode_jpeg(px, 85, subsample=sub))
        for ri in (1, 3, 7):
            base = encode_jpeg(px, 85, subsample=sub, restart_interval=ri)
            prog = encode_jpeg_progressive(px, 85, subsample=sub, restart_interval=ri)
            assert b"\xff\xdd" in base and b"\xff\xdd" in prog  # DRI present
            assert np.array_equal(decode_jpeg(base), ref), (shape, sub, ri)
            assert np.array_equal(decode_jpeg(prog), ref), (shape, sub, ri)

    # independent-encoder evidence: any real restart-marker JPEG on disk
    real = "/root/.rustup/toolchains/stable-x86_64-unknown-linux-gnu/share/doc/rust/html/embedded-book/assets/verify.jpeg"
    if not os.path.exists(real):
        _pytest.skip("no third-party restart-marker JPEG on this system")
    data = open(real, "rb").read()
    assert b"\xff\xdd" in data.split(b"\xff\xda")[0]
    img = decode_jpeg(data)
    assert img.shape[2] == 3 and img.shape[0] > 100 and img.shape[1] > 100


def test_winnow_oracle_ascii_precondition():
    """The llm_winnow_fingerprint FULL oracle (round-7) hashes per
    CHARACTER in DuckDB but per UTF-8 BYTE in the Spark kernel — equal
    only on ASCII text. This pins the precondition for every fixture
    SF, so a future non-ASCII documents fixture fails HERE with a named
    reason instead of as an inexplicable oracle hash-mismatch in the
    driver. (The kernel itself is unicode-correct; only the DuckDB
    recomputation assumes ASCII.)"""
    import glob

    import duckdb

    for path in sorted(glob.glob("/root/testdata/sf*/documents.parquet")):
        n = duckdb.connect().execute(
            f"SELECT count(*) FROM read_parquet('{path}') "
            "WHERE text ~ '[^\\x00-\\x7F]'"
        ).fetchone()[0]
        assert n == 0, (
            f"{path}: {n} non-ASCII documents — the winnow oracle's "
            "char-ord == utf8-byte identity no longer holds; either "
            "restrict the oracle or extend it to byte-level hashing"
        )


def test_mpeg_structure_codecs():
    """MP3 frame walk and H.264 SPS parse are REAL and spec-pinned:
    byte-level fixtures derived by hand from ISO 11172-3 / ITU-T H.264,
    not just encoder/decoder self-agreement."""
    import numpy as np

    from flink_realtime_2024_spark.operators._mpeg import (
        _ep_insert,
        _ep_strip,
        encode_h264,
        encode_mp3,
        parse_h264,
        parse_mp3,
    )

    rng = np.random.RandomState(3)
    # 128 kbps (idx 9) at 44100 Hz (idx 0): header must be ff fb 90 00
    # and the frame length 144*128000/44100 = 417 bytes exactly
    p = encode_mp3(n_frames=3, bitrate_idx=9, sr_idx=0, rng=rng)
    assert p[:4] == bytes([0xFF, 0xFB, 0x90, 0x00])
    assert len(p) == 3 * 417
    m = parse_mp3(p)
    assert (m["bitrate_kbps"], m["sample_rate"], m["n_frames"]) == (128, 44100, 3)
    assert m["duration_ms"] == 3 * 1152 * 1000.0 / 44100

    # ID3v2 syncsafe size: 1000 = 0b111_1101000 → bytes 00 00 07 68
    p = encode_mp3(n_frames=2, bitrate_idx=1, sr_idx=2, rng=rng, id3_size=1000)
    assert p[:3] == b"ID3" and p[6:10] == bytes([0x00, 0x00, 0x07, 0x68])
    assert parse_mp3(p)["n_frames"] == 2

    # ID3v2.4 with FOOTER flag (0x10): the syncsafe size covers only
    # the tag body; a 10-byte "3DI" footer follows it. The skip must
    # add those 10 bytes or sync is lost 10 bytes early (ADVICE r8).
    bare = encode_mp3(n_frames=2, bitrate_idx=1, sr_idx=2, rng=rng)
    body = bytes(range(1, 33))  # 32-byte tag body, no embedded 0xFF
    tag = (
        b"ID3\x04\x00\x10" + bytes([0, 0, 0, len(body)]) + body
        + b"3DI\x04\x00\x10" + bytes([0, 0, 0, len(body)])
    )
    assert parse_mp3(tag + bare)["n_frames"] == 2

    with pytest.raises(ValueError):
        parse_mp3(b"\xff\xfb\x90\x00junk")  # truncated mid-frame loses sync
    # dirty-corpus inputs fail as ValueError, not IndexError/TypeError:
    # a curation kernel sees truncated tags and tagless stubs at scale
    with pytest.raises(ValueError):
        parse_mp3(b"ID3\x03\x00")  # truncated ID3v2 header
    with pytest.raises(ValueError):
        parse_mp3(b"\x00\x00")  # no sync at all → lost-sync error
    with pytest.raises(ValueError):
        parse_mp3(b"ID3\x03\x00\x00\x00\x00\x00\x00")  # tag only, 0 frames

    # MPEG-2 LSF (ISO 13818-3): 64 kbps (V2-table idx 8) @ 22050 Hz →
    # header ff f3 80 00, frame length 72*64000/22050 = 208, 576
    # samples per frame
    frame = bytes([0xFF, 0xF3, 0x80, 0x00]) + bytes(204)
    m = parse_mp3(frame * 2)
    assert (m["bitrate_kbps"], m["sample_rate"], m["n_frames"]) == (64, 22050, 2)
    assert m["duration_ms"] == 2 * 576 * 1000.0 / 22050
    # MPEG-2.5 (version bits 00): 8 kbps (idx 1) @ 8000 Hz → ff e3 18,
    # frame length 72*8000/8000 = 72
    frame = bytes([0xFF, 0xE3, 0x18, 0x00]) + bytes(68)
    m = parse_mp3(frame * 3)
    assert (m["bitrate_kbps"], m["sample_rate"], m["n_frames"]) == (8, 8000, 3)
    assert m["duration_ms"] == 3 * 576 * 1000.0 / 8000
    with pytest.raises(ValueError):
        parse_mp3(bytes([0xFF, 0xEB, 0x90, 0x00]) + bytes(413))  # version 01 reserved

    # hand-derived SPS for 64x48 baseline (decoded bit-by-bit from the
    # spec: ue(0) ue(0) ue(2) ue(1) 0 ue(3) ue(2) 1 0 0 0 stop+pad)
    p = encode_h264(64, 48, 2, rng)
    assert p[:4] == b"\x00\x00\x00\x01"
    assert p[4:11] == bytes.fromhex("6742001eda11c4")
    assert parse_h264(p) == {"width": 64, "height": 48, "n_frames": 2}

    # cropping path: a foreign SPS carrying a crop rectangle (4:2:0
    # units are 2 px) must yield non-multiple-of-16 dims
    from flink_realtime_2024_spark.operators._mpeg import _BitWriter

    w = _BitWriter()
    w.u(66, 8); w.u(0, 8); w.u(30, 8)
    w.ue(0); w.ue(0); w.ue(2); w.ue(1); w.u(0, 1)
    w.ue(4 - 1)   # 64 px wide in mbs
    w.ue(3 - 1)   # 48 px tall
    w.u(1, 1); w.u(0, 1)
    w.u(1, 1)                      # frame_cropping_flag
    w.ue(0); w.ue(3); w.ue(0); w.ue(1)  # crop right 6 px, bottom 2 px
    w.u(0, 1)
    sps = b"\x00\x00\x00\x01" + bytes([0x67]) + _ep_insert(w.rbsp_trailing())
    assert parse_h264(sps + b"\x00\x00\x01\x65\x10") == {
        "width": 58, "height": 46, "n_frames": 1
    }
    # adjacent start codes (empty NAL from stray zero padding) are
    # skipped, not an IndexError; a slice-less SPS-only stream parses
    assert parse_h264(sps + b"\x00\x00\x01" + b"\x00\x00\x01\x65\x10") == {
        "width": 58, "height": 46, "n_frames": 1
    }
    with pytest.raises(ValueError):
        parse_h264(b"no start code here")

    # emulation prevention: 00 00 01/02/03 sequences survive the EBSP trip
    for raw in (b"\x00\x00\x01", b"\x00\x00\x00\x00\x03ab\x00\x00\x02"):
        assert _ep_strip(_ep_insert(raw)) == raw
    assert _ep_insert(b"\x00\x00\x01") == b"\x00\x00\x03\x01"


def test_mm_stream_meta_pipeline(spark):
    """mm_stream_meta end-to-end: every document yields a parsed stream
    row; MP3 rows carry audio fields, H.264 rows carry dims; no parse
    failures across the whole fixture corpus."""
    from flink_realtime_2024_spark.operators.multimodal import mm_stream_meta

    rows = mm_stream_meta(spark, SF_DIR).collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert len(rows) == n_docs
    for r in rows:
        if r["mime"] == "audio/mpeg":
            assert r["sample_rate"] in (44100, 48000, 32000)
            assert 32 <= r["bitrate_kbps"] <= 320 and r["width"] is None
            assert r["duration_ms"] > 0
        else:
            assert r["mime"] == "video/h264"
            assert r["width"] % 16 == 0 and r["height"] % 16 == 0
            assert r["sample_rate"] is None and r["n_frames"] >= 2


def test_stream_meta_tolerant_isolates_corrupt_rows(spark):
    """Error isolation for the 100 TB scan: one corrupt payload in a
    batch yields a typed error row (null metadata + parse_error) while
    every other row still parses — the task, and hence the stage, never
    fails. Checked at the kernel level (pure pandas generator) and
    through the real mapInPandas plumbing."""
    import numpy as np
    import pandas as pd

    from flink_realtime_2024_spark.operators._mpeg import encode_h264, encode_mp3
    from flink_realtime_2024_spark.operators.multimodal import (
        STREAM_META_TOLERANT_SCHEMA,
        stream_meta_tolerant,
    )

    rng = np.random.RandomState(7)
    pdf = pd.DataFrame(
        {
            "asset_id": [1, 2, 3, 4],
            "mime": ["audio/mpeg", "video/h264", "audio/mpeg", "video/h264"],
            "payload": [
                encode_mp3(n_frames=3, bitrate_idx=9, sr_idx=0, rng=rng),
                encode_h264(64, 48, 2, rng),
                b"ID3\x03\x00",            # truncated ID3v2 header
                b"no start code at all",   # not Annex-B
            ],
        }
    )
    out = pd.concat(stream_meta_tolerant([pdf]))
    assert len(out) == 4
    good = out[out["parse_error"].isna()]
    bad = out[out["parse_error"].notna()]
    assert sorted(good["asset_id"]) == [1, 2] and sorted(bad["asset_id"]) == [3, 4]
    assert good.set_index("asset_id").loc[1, "bitrate_kbps"] == 128
    assert good.set_index("asset_id").loc[2, "width"] == 64
    assert bad["parse_error"].str.startswith("ValueError").all()
    assert bad[["width", "height", "sample_rate", "n_frames"]].isna().all().all()

    # the same batch through real mapInPandas: the job completes
    sdf = spark.createDataFrame(pdf).mapInPandas(
        stream_meta_tolerant, STREAM_META_TOLERANT_SCHEMA
    )
    collected = sdf.collect()
    assert len(collected) == 4
    assert sum(r["parse_error"] is not None for r in collected) == 2


def test_html_extract_semantics_and_plan(spark):
    """llm_html_extract: every synthesized page has exactly 4 blocks of
    which the nav and footer (link density >= 0.5) are dropped and the
    content + mixed blocks kept; the plan is a single narrow scan with
    zero exchanges and the output struct is computed once (lambda-bound,
    not re-inlined per column)."""
    from flink_realtime_2024_spark.operators.llm import llm_html_extract

    df = llm_html_extract(spark, SF_DIR)
    rows = df.collect()
    assert len(rows) > 0
    for r in rows:
        assert r["n_blocks"] == 4
        assert r["n_kept"] == 2
        # kept = full content block + "See more on <snippet>" block
        assert r["main_len"] > 0
        assert r["main_prefix"] and "<" not in r["main_prefix"]
        assert "nav1" not in (r["main_prefix"] or "")

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "per-row extraction must not shuffle"
    # the expensive regex pipeline appears once, in one Project node
    assert plan.count("regexp_extract_all(concat(") <= 1


def test_decode_stats_tolerant_isolates_corrupt_rows(spark):
    """decode_stats_tolerant: corrupt media payloads and unknown mimes
    become typed error rows (null stats + decode_error, checksum still
    recorded for quarantine audits) while valid assets in the same
    batch decode normally — same contract as stream_meta_tolerant."""
    import numpy as np
    import pandas as pd

    from flink_realtime_2024_spark.operators.multimodal import (
        DECODE_STATS_TOLERANT_SCHEMA,
        decode_stats_tolerant,
        encode_bmp,
    )

    rng = np.random.RandomState(11)
    good_bmp = encode_bmp(rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8))
    pdf = pd.DataFrame(
        {
            "asset_id": [1, 2, 3],
            "mime": ["image/bmp", "image/png", "application/x-unknown"],
            "payload": [good_bmp, b"\x89PNG\r\n\x1a\n truncated", b"????"],
        }
    )
    out = pd.concat(decode_stats_tolerant([pdf]))
    assert len(out) == 3
    good = out[out["decode_error"].isna()]
    bad = out[out["decode_error"].notna()]
    assert list(good["asset_id"]) == [1] and sorted(bad["asset_id"]) == [2, 3]
    assert good.iloc[0]["width"] == 8 and good.iloc[0]["height"] == 8
    assert bad["checksum"].notna().all()  # quarantine audit trail survives
    assert bad[["width", "height", "duration_ms", "mean_value"]].isna().all().all()

    sdf = spark.createDataFrame(pdf).mapInPandas(
        decode_stats_tolerant, DECODE_STATS_TOLERANT_SCHEMA
    )
    collected = sdf.collect()
    assert len(collected) == 3
    assert sum(r["decode_error"] is not None for r in collected) == 2


def test_html_extract_expr_on_foreign_markup(spark):
    """html_extract_expr is a reusable primitive, not a fixture-bound
    query: hand-written markup with tag attributes, mixed-case tags,
    and unquoted hrefs segments and scores correctly."""
    from flink_realtime_2024_spark.operators.llm import html_extract_expr

    page = (
        '<HTML><BODY>'
        '<P class="nav"><a href=/>Home</a> <a href=/about>About</a></P>'
        '<p id="main">Actual article text long enough to be kept easily.</p>'
        '<p><A HREF="x">subscribe</A></p>'
        '</BODY></HTML>'
    )
    r = (
        spark.createDataFrame([(page,)], "html string")
        .select(html_extract_expr(F.col("html")).alias("r"))
        .select("r.*")
        .collect()[0]
    )
    # nav (density 18/10) and subscribe (18/9) dropped; article kept
    assert r["n_blocks"] == 3
    assert r["n_kept"] == 1
    assert r["main_prefix"].startswith("Actual article text")
    assert "<" not in r["main_prefix"]


def test_lsh_bucket_cap_degrades_to_chain(spark):
    """r10 (found by the 100× probe): buckets past the degenerate-
    collision cap must NOT be dropped — a duplicate family larger than
    the cap previously vanished entirely (measured recall 0.0 on
    100-replica families). The cap's contract is now: all-pairs up to
    the cap, a sorted consecutive CHAIN past it — O(n) pairs that keep
    the family ONE connected component while still bounding the
    quadratic enumeration."""
    from flink_realtime_2024_spark import (
        connected_components,
        minhash_pairs,
        simhash_pairs,
    )

    n = 8
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta iota kappa")
         for i in range(1, n + 1)],
        "doc_id long, text string",
    )
    all_pairs = n * (n - 1) // 2  # 28 — what an uncapped bucket emits

    for kernel, kwargs in (
        (minhash_pairs, {"bucket_cap": 4}),
        (simhash_pairs, {"bucket_cap": 4}),
        (simhash_pairs, {"scheme": "b5k2", "bucket_cap": 4}),
    ):
        pairs = kernel(docs, **kwargs).select("doc_a", "doc_b")
        got = pairs.count()
        assert 0 < got < all_pairs, (kernel.__name__, kwargs, got)
        comp = connected_components(pairs, "doc_a", "doc_b")
        clusters = {r["cluster_id"] for r in comp.collect()}
        members = {r["doc_id"] for r in comp.collect()}
        assert members == set(range(1, n + 1)), (kernel.__name__, kwargs)
        assert len(clusters) == 1, (kernel.__name__, kwargs)


@pytest.mark.parametrize("scheme", ["b6k3", "b5k2"])
def test_simhash_first_combo_emission_is_exact(spark, scheme):
    """r14 opt pin for the first-matching-combo emission on
    simhash_pairs' uncapped path (each qualifying pair feeds the
    verify/distinct exchange from exactly ONE combo instead of every
    matching one). Two layers:

    1. Mask algebra (pure Python): for random fingerprint pairs, the
       first index t with xor & _simhash_combo_masks[t] == 0 must equal
       the reference enumeration that compares the combo's extracted
       block values directly — the exactness the Spark-side when-chain
       filter rests on.
    2. End-to-end: on a duplicate-heavy corpus (families of identical
       and " vN"-perturbed docs, whose hamming-0/low-hamming pairs
       previously surfaced from up to all 20 combos) the output must
       still EQUAL the brute-force hamming ≤ 3 truth set — a wrong
       first_t drops a pair entirely, which this catches."""
    import random

    from flink_realtime_2024_spark.operators._util import widen
    from flink_realtime_2024_spark.operators.llm import simhash64, simhash_pairs
    from flink_realtime_2024_spark.operators.llm.lsh import (
        _SIMHASH_SCHEMES,
        _simhash_combo_masks,
        _simhash_combos,
    )

    # --- 1. mask algebra vs direct block comparison
    blocks, _ = _SIMHASH_SCHEMES[scheme]
    combos = _simhash_combos(scheme)
    masks = [m & ((1 << 64) - 1) for m in _simhash_combo_masks(scheme)]
    rng = random.Random(14)
    for _ in range(500):
        fa = rng.getrandbits(64)
        # flip 0-4 random bits so matching combos actually occur
        fb = fa
        for _b in range(rng.randint(0, 4)):
            fb ^= 1 << rng.randrange(64)
        x = fa ^ fb

        def blockval(fp, bi):
            off, w = blocks[bi]
            return (fp >> off) & ((1 << w) - 1)

        ref = next(
            (
                t
                for t, combo in enumerate(combos)
                if all(blockval(fa, bi) == blockval(fb, bi) for bi in combo)
            ),
            None,
        )
        got = next((t for t, m in enumerate(masks) if x & m == 0), None)
        assert got == ref, (hex(fa), hex(fb), got, ref)

    # --- 2. end-to-end equality on a duplicate-heavy corpus
    base = [
        "alpha beta gamma delta epsilon zeta",
        "the quick brown fox jumps over the lazy dog",
        "lorem ipsum dolor sit amet consectetur adipiscing",
        "completely unrelated text about spark shuffles",
    ]
    rows = []
    did = 0
    for b in base:
        for rep in range(12):  # identical + lightly perturbed family
            did += 1
            rows.append((did, b if rep == 0 else f"{b} v{rep}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    fps = widen(docs).select("doc_id", simhash64("text").alias("fp")).collect()
    ids = np.array([r["doc_id"] for r in fps], dtype=np.int64)
    vals = np.array([r["fp"] for r in fps], dtype=np.int64).astype(np.uint64)
    truth = set()
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[j] > ids[i] and bin(int(vals[i] ^ vals[j])).count("1") <= 3:
                truth.add((int(ids[i]), int(ids[j])))
    assert truth, "constructed corpus must contain hamming<=3 families"

    found = _collect_set(simhash_pairs(docs, scheme=scheme), "doc_a", "doc_b")
    assert found == truth, (
        f"[{scheme}] missing={sorted(truth - found)[:5]}"
        f" extra={sorted(found - truth)[:5]}"
    )


def test_simhash_chain_order_matches_oracle_on_mixed_sign_bucket(spark, tmp_path):
    """Cross-engine pin for the cap-degrade chain's SORT ORDER (r10
    review find): Spark sorts chain members by the SIGNED int64
    fingerprint, so the generated DuckDB oracle must reinterpret its
    unsigned fpu as signed before ordering — on a bucket containing
    fingerprints of BOTH signs, unsigned ordering gives a different
    adjacency and hence a different emitted pair set. The corpus here
    is constructed (searched offline) so that eleven docs share one
    b6k3 banding key with mixed-sign fingerprints; bucket_cap=2 forces
    that bucket through the chain path in both engines, and the
    signed-vs-unsigned orderings provably emit DIFFERENT pair sets on
    it — re-measured after the r11 segmentation rewrite: 23 pairs
    under signed order, 4-pair symmetric difference vs unsigned — so
    this test fails against an oracle that sorts by raw fpu."""
    import duckdb

    from flink_realtime_2024_spark.operators._util import widen
    from flink_realtime_2024_spark.operators.llm import (
        _simhash_oracle_sql,
        simhash64,
        simhash_pairs,
    )

    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango"
    )
    rows = [(i + 1, f"{base} {w}") for i, w in enumerate(
        ["w190tok", "w404tok", "w717tok", "w754tok", "w758tok", "w1900tok",
         "w2600tok", "w3047tok", "w3060tok", "w4044tok", "w4698tok"]
    )]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fps = [
        r["fp"]
        for r in widen(docs).select(simhash64("text").alias("fp")).collect()
    ]
    assert {f < 0 for f in fps} == {True, False}, "need mixed-sign fps"

    path = str(tmp_path / "docs.parquet")
    docs.write.parquet(path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    oracle = {
        (r[0], r[1], r[2])
        for r in con.execute(_simhash_oracle_sql("b6k3", bucket_cap=2)).fetchall()
    }
    got = {
        tuple(r)
        for r in simhash_pairs(docs, scheme="b6k3", bucket_cap=2).collect()
    }
    assert got == oracle, (
        f"spark-only={sorted(got - oracle)} oracle-only={sorted(oracle - got)}"
    )


def test_lsh_mega_bucket_segmentation_bounds_partitions_and_pairs(spark):
    """r11 (verdict #1): an oversized bucket must never become a
    single-reducer sort. The kernels segment mega buckets by a
    portable doc hash mod ceil(n/cap), so every row_number window
    partition holds ~cap docs; star + family-stitch links keep the
    family ONE component across segments at O(n) total pairs. This
    pins all three contracts on a 600-doc duplicate family with
    cap=16 (the r10 single chain would have sorted all 600 rows × 16
    bands in one task each)."""
    from flink_realtime_2024_spark.operators._util import widen
    from flink_realtime_2024_spark.operators.llm import (
        _seg_hash,
        minhash_bands_from_hashes,
        minhash_pairs,
        shingle_hash_expr,
        simhash_pairs,
    )
    from flink_realtime_2024_spark import connected_components

    n, cap = 600, 16
    nseg = (n + cap - 1) // cap  # 38
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta iota kappa")
         for i in range(1, n + 1)],
        "doc_id long, text string",
    )

    # 1) window-partition bound: rebuild the kernel's (bucket, seg)
    # grouping from its own building blocks and assert no partition
    # exceeds 4×cap (expected size is exactly cap under a uniform
    # hash; 4× absorbs binomial variance with huge margin)
    # persist barrier between the JVM shingle expression and the
    # banding UDF, exactly like the kernel's signature store — a
    # lambda-bearing expression must not feed a pandas UDF argument
    # directly (Spark 4.1 ExtractPythonUDFs bug; see
    # shingle_hash_expr's COMPOSITION PITFALL note)
    store = (
        widen(docs)
        .select("doc_id", shingle_hash_expr("text").alias("sh"))
        .persist()
    )
    try:
        sigs = store.select(
            "doc_id", minhash_bands_from_hashes("sh").alias("bs")
        ).select(
            "doc_id", F.posexplode("bs.bands").alias("band", "band_hash")
        )
        max_part = (
            sigs.withColumn("seg", F.pmod(_seg_hash("doc_id"), F.lit(nseg)))
            .groupBy("band", "band_hash", "seg")
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
    finally:
        store.unpersist()
    assert max_part <= 4 * cap, f"segment partition {max_part} > {4 * cap}"

    # 2) + 3) O(n) pair output and full connectivity, both kernels
    for kernel, kwargs in (
        (minhash_pairs, {"bucket_cap": cap}),
        (simhash_pairs, {"bucket_cap": cap}),
    ):
        pairs = kernel(docs, **kwargs).select("doc_a", "doc_b")
        got = pairs.count()
        assert 0 < got <= 10 * n, (kernel.__name__, got)  # vs n(n-1)/2=179700
        comp = connected_components(pairs, "doc_a", "doc_b").collect()
        assert {r["doc_id"] for r in comp} == set(range(1, n + 1)), kernel.__name__
        assert len({r["cluster_id"] for r in comp}) == 1, kernel.__name__


def test_segmented_bucket_pairs_carries_align_with_id_swap(spark):
    """r11 advice: carry columns must be swapped in lockstep with the
    least/greatest doc_a/doc_b normalization — fp_a must be doc_a's
    fingerprint in every emitted structure (chain, star, stitch), not
    merely 'one of the two' (which only symmetric consumers tolerate).
    Encodes each doc's carry as doc_id*100 so misalignment is visible
    per row."""
    from flink_realtime_2024_spark.operators.llm import _segmented_bucket_pairs

    rows = [
        # (bucket, seg, doc_id, fam, fp) — two segments, two families,
        # doc ids deliberately NOT ordered like the (fam, doc_id) chain
        (1, 0, 5, "fB", 500), (1, 0, 2, "fA", 200), (1, 0, 9, "fA", 900),
        (1, 1, 7, "fB", 700), (1, 1, 1, "fB", 100), (1, 1, 4, "fA", 400),
    ]
    over = spark.createDataFrame(
        rows, "b int, seg int, doc_id long, fam string, fp long"
    )
    pairs = _segmented_bucket_pairs(
        over, ("b",), "fam", ("fam", "doc_id"), carry=("fp",)
    ).collect()
    assert pairs, "no pairs emitted (test vacuous)"
    for r in pairs:
        assert r["doc_a"] < r["doc_b"]
        assert r["fp_a"] == r["doc_a"] * 100, r
        assert r["fp_b"] == r["doc_b"] * 100, r


def test_minhash_segmented_chain_matches_oracle(spark, tmp_path):
    """Cross-engine pin for the r11 minhash segmentation: two 6-doc
    exact duplicate families with bucket_cap=4 force every family
    bucket through the segmented chain + star + stitch path (nseg=2)
    in BOTH engines; the emitted (doc_a, doc_b, jaccard) sets must be
    identical — any drift in the portable segmentation hash, the
    full-signature chain order, or the stitch algebra fails here at
    sf-test speed instead of at the sf0.01 driver gate."""
    import duckdb

    from flink_realtime_2024_spark.operators.llm import (
        _minhash_oracle_sql,
        minhash_pairs,
    )
    from flink_realtime_2024_spark import connected_components

    fam_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    fam_b = "one two three four five six seven eight nine ten eleven"
    rows = [(i, fam_a) for i in range(1, 7)] + [
        (100 + i, fam_b) for i in range(1, 7)
    ] + [(900, "lone wolf document completely different from both families")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    path = str(tmp_path / "docs.parquet")
    docs.write.parquet(path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    oracle = {
        (r[0], r[1], float(r[2]))
        for r in con.execute(_minhash_oracle_sql(bucket_cap=4)).fetchall()
    }
    pairs = minhash_pairs(docs, bucket_cap=4)
    got = {(r[0], r[1], float(r[2])) for r in pairs.collect()}
    assert got == oracle, (
        f"spark-only={sorted(got - oracle)} oracle-only={sorted(oracle - got)}"
    )
    comp = connected_components(
        pairs.select("doc_a", "doc_b"), "doc_a", "doc_b"
    ).collect()
    clusters = {}
    for r in comp:
        clusters.setdefault(r["cluster_id"], set()).add(r["doc_id"])
    assert set(range(1, 7)) in clusters.values()
    assert {100 + i for i in range(1, 7)} in clusters.values()


def test_minhash_interleaved_families_in_shared_bucket(spark, tmp_path):
    """Adversarial pin for the r11 fsig-ordered chain (r10 advice #1):
    two exact 6-doc duplicate families whose texts have shingle-Jaccard
    0.2632 (< 0.5 — cross-family links MUST be pruned) but whose
    band-2 and band-11 minima COLLIDE (searched offline), with doc_ids
    interleaved (evens vs odds) so a doc_id-ordered chain through the
    shared bucket would alternate families on every link. With
    bucket_cap=4 the shared 12-doc buckets go through the segmented
    chain + stitch path in both engines. Pins: exact oracle lockstep on
    the interleaved-bucket configuration, zero cross-family pairs, and
    both families fully connected."""
    import duckdb

    from flink_realtime_2024_spark.operators.llm import (
        _minhash_oracle_sql,
        minhash_pairs,
    )
    from flink_realtime_2024_spark import connected_components

    x = ("alpha bravo charlie delta echo foxtrot golf hotel india "
         "juliet kilo lima mike november")
    y = ("w66236x w61753x w46863x w41134x w11066x foxtrot golf hotel "
         "india juliet kilo lima w17022x november")
    fam_a = {2 * i for i in range(1, 7)}       # 2..12 even
    fam_b = {2 * i - 1 for i in range(1, 7)}   # 1..11 odd
    rows = [(i, x) for i in sorted(fam_a)] + [(i, y) for i in sorted(fam_b)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    path = str(tmp_path / "docs.parquet")
    docs.write.parquet(path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    oracle = {
        (r[0], r[1], float(r[2]))
        for r in con.execute(_minhash_oracle_sql(bucket_cap=4)).fetchall()
    }
    pairs = minhash_pairs(docs, bucket_cap=4)
    got = {(r[0], r[1], float(r[2])) for r in pairs.collect()}
    assert got == oracle, (
        f"spark-only={sorted(got - oracle)} oracle-only={sorted(oracle - got)}"
    )
    # precision: no cross-family pair survives the Jaccard verify
    for a, b, j in got:
        same = ({a, b} <= fam_a) or ({a, b} <= fam_b)
        assert same, (a, b, j)
        assert j == 1.0
    # connectivity: each family is ONE component
    comp = connected_components(
        pairs.select("doc_a", "doc_b"), "doc_a", "doc_b"
    ).collect()
    clusters: dict = {}
    for r in comp:
        clusters.setdefault(r["cluster_id"], set()).add(r["doc_id"])
    assert fam_a in clusters.values()
    assert fam_b in clusters.values()


def test_lsh_kernels_release_their_caches(spark):
    """r10 verdict #8: the LSH kernels persist internal frames (the
    signature store, the exploded key frame); a library consumer
    looping the kernel must not accumulate storage. The kernels now
    materialize their result eagerly and unpersist before returning —
    after a kernel call returns, the SQL cache manager must be empty
    again."""
    from flink_realtime_2024_spark.operators.llm import (
        minhash_pairs,
        simhash_pairs,
    )
    from flink_realtime_2024_spark.sources.io import drop_all_caches

    drop_all_caches(spark)
    cache_manager = spark._jsparkSession.sharedState().cacheManager()
    assert cache_manager.isEmpty()
    docs = spark.createDataFrame(
        [(i, f"document number {i} with some shared tokens alpha beta")
         for i in range(1, 40)],
        "doc_id long, text string",
    )
    for kernel in (minhash_pairs, simhash_pairs):
        out = kernel(docs)
        out.collect()
        assert cache_manager.isEmpty(), kernel.__name__


def test_noaqe_clone_checkpoints_preserve_partitioning(spark):
    """r14 (verdict #7 mechanism): pagerank's co-partitioned loop rests
    on two facts this test pins directly, because a regression is
    silent (results stay bit-identical, only the plan degrades to two
    O(edges) exchanges per round):

    1. a ``localCheckpoint`` taken under the ``_noaqe_session`` clone
       preserves HashPartitioning — a self-join of two such frames on
       the partitioning key plans with ZERO exchanges;
    2. building ``analytics_pagerank`` leaves the clone's adaptive conf
       false even though ``load_table`` re-runs ``session.prepare``
       (which re-applies adaptive=true) on it, and never touches the
       caller's session conf."""
    import pyspark.sql.functions as F
    from pyspark import StorageLevel

    from flink_realtime_2024_spark.plans.analytics import (
        _noaqe_session,
        analytics_pagerank,
    )

    s = _noaqe_session(spark)
    s.conf.set("spark.sql.adaptive.enabled", "false")
    a = (
        s.range(0, 1000)
        .select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
        .repartition(8, "k")
        .localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
    )
    b = a.withColumnRenamed("v", "w").withColumnRenamed("k", "kk")
    prev = {
        key: s.conf.get(key, None)
        for key in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        plan = _explain(a.join(b, F.col("k") == F.col("kk")))
    finally:
        for key, val in prev.items():
            if val is not None:
                s.conf.set(key, val)
            else:
                try:
                    s.conf.unset(key)
                except Exception:
                    pass
    assert "Exchange" not in plan, plan

    analytics_pagerank(spark, SF_DIR)
    clone = spark._flink_rt_noaqe_session
    assert clone.conf.get("spark.sql.adaptive.enabled") == "false"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_recursive_twin_levels_are_exchange_free(spark):
    """r14 self-review finding (applied): spelled `rn == prev + 1`,
    Catalyst extracts the increment into the join keys, widening them
    to (rn, o_custkey) and re-shuffling BOTH sides of every level —
    silently defeating the o_custkey co-partitioning the twin's
    docstring claims. The residual spelling (rn − prev = 1) plus the
    _noaqe_session checkpoints must yield a 5-level plan with ZERO
    exchanges (broadcast disabled so toy-scale stats can't hide a
    shuffle behind a BHJ)."""
    from flink_realtime_2024_spark.plans.sql_api import (
        sql_recursive_cte_iterative,
    )

    sql_recursive_cte_iterative(spark, SF_DIR)  # memoizes the clone
    s = spark._flink_rt_noaqe_session
    prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    try:
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = _explain(sql_recursive_cte_iterative(spark, SF_DIR))
    finally:
        if prev is not None:
            s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        else:
            try:
                s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            except Exception:
                pass
    assert re.search(r"\(\d+\) Exchange", plan) is None, plan
