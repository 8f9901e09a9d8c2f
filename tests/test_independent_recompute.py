"""Independent recomputation pins for the rows-only operator family
(VERDICT r3 #8).

The driver grades MinHash/SimHash/winnowing/ANN operators rows-only because
their hashing is engine-specific (Spark ``xxhash64``) or their result is
approximate by construction, so no DuckDB SQL oracle can honestly reproduce
them.  This module closes the gap from the other side: a from-scratch pure
Python / numpy reimplementation of each pipeline recomputes the exact
expected rows on the driver fixture and pins the Spark result against them.

Independence argument: the only shared artifact is the *public* xxHash64
algorithm specification (Y. Collet, github.com/Cyan4973/xxHash — BSD, spec
in doc/xxhash_spec.md), reimplemented here from the spec and pinned against
its published test vectors BEFORE any Spark comparison; Spark's
``xxhash64(...)`` is that same public function seeded with 42 and chained
across arguments (spark/unsafe XXH64.java).  Everything downstream
(shingling, banding, majority bits, winnowing minima, LSH hyperplanes,
union-find clustering) is recomputed with plain Python sets/loops — no
Spark, no DataFrame API — so an implementation bug on either side breaks
the pin.

Floating-point discipline: the Spark side folds arrays sequentially
(``F.aggregate``), which IEEE-754 doubles replicate bitwise with an ordered
Python loop; the one BLAS step (LSH signature matmul) is reproduced with the
same numpy call at the same (n, d) shape, and only its *sign* matters.
"""

from __future__ import annotations

import math
import struct
from collections import defaultdict

import numpy as np
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMALL

# ---------------------------------------------------------------------------
# Pure-Python xxHash64 (public spec; no Spark, no external xxhash package)
# ---------------------------------------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, inp: int) -> int:
    return (_rotl((acc + inp * _P2) & _M64, 31) * _P1) & _M64


def xxh64(data: bytes, seed: int) -> int:
    """XXH64 of ``data`` with ``seed`` per the published spec; unsigned."""
    seed &= _M64
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        acc = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            acc = ((acc ^ _round(0, v)) * _P1 + _P4) & _M64
    else:
        acc = (seed + _P5) & _M64
    acc = (acc + n) & _M64
    while i + 8 <= n:
        k = _round(0, int.from_bytes(data[i : i + 8], "little"))
        acc = (_rotl(acc ^ k, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        acc = (
            _rotl(acc ^ ((int.from_bytes(data[i : i + 4], "little") * _P1) & _M64), 23)
            * _P2
            + _P3
        ) & _M64
        i += 4
    while i < n:
        acc = (_rotl(acc ^ ((data[i] * _P5) & _M64), 11) * _P1) & _M64
        i += 1
    acc ^= acc >> 33
    acc = (acc * _P2) & _M64
    acc ^= acc >> 29
    acc = (acc * _P3) & _M64
    acc ^= acc >> 32
    return acc


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


_SPARK_SEED = 42  # Spark's default xxhash64 seed (XxHash64 expression)


def xxh64_spark(*vals) -> int:
    """Spark's ``F.xxhash64(*cols)``: per-argument XXH64 chained through the
    seed, starting at 42; signed-long result.  Argument encodings follow
    Spark's HashExpression: str -> UTF-8 bytes, ('i', v) -> 4-byte LE int,
    plain int -> 8-byte LE long."""
    h = _SPARK_SEED
    for v in vals:
        if isinstance(v, str):
            b = v.encode("utf-8")
        elif isinstance(v, tuple) and v[0] == "i":
            b = struct.pack("<i", v[1])
        else:
            b = struct.pack("<q", v)
        h = xxh64(b, h)
    return _signed(h)


def test_xxh64_public_vectors():
    """Pin the reimplementation to published xxHash64 test vectors first —
    the Spark comparisons below are only meaningful if this passes."""
    assert xxh64(b"", 0) == 0xEF46DB3751D8E999
    # python-xxhash README canonical example
    assert xxh64(b"Nobody inspects the spammish repetition", 0) == 0xFBCEA83C8A378BF1


def test_xxh64_matches_spark_engine(spark):
    """The engine implements the same public function: probe strings across
    every length class (empty / <4 / <8 / <32 / stripes), longs (both
    signs), and the chained multi-arg forms the dedup family uses."""
    from pyspark.sql import functions as F

    strings = ["", "a", "abc", "abcd", "abcdefg", "abcdefgh", "hello world",
               "x" * 31, "x" * 32, "x" * 33, "The quick brown fox jumps over the lazy dog",
               "héllo wörld ünïcode"]
    df = spark.createDataFrame([(s,) for s in strings], ["s"])
    got = [r.h for r in df.select(F.xxhash64("s").alias("h")).collect()]
    assert got == [xxh64_spark(s) for s in strings]

    longs = [0, 1, -1, 42, -(2**63), 2**63 - 1, 123456789012345]
    dfl = spark.createDataFrame([(v,) for v in longs], "v: long")
    got = [r.h for r in dfl.select(F.xxhash64("v").alias("h")).collect()]
    assert got == [xxh64_spark(v) for v in longs]

    # chained (long, int-literal) — the MinHash permutation form
    got = [
        r.h
        for r in dfl.select(F.xxhash64("v", F.lit(7)).alias("h")).collect()
    ]
    assert got == [xxh64_spark(v, ("i", 7)) for v in longs]


# ---------------------------------------------------------------------------
# Fixture corpus via pyarrow (no Spark on the recompute side)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def docs_pdf():
    t = pq.read_table(f"{SF_SMALL}/documents.parquet", columns=["doc_id", "text"])
    return t.to_pandas()


@pytest.fixture(scope="module")
def emb_pdf():
    t = pq.read_table(f"{SF_SMALL}/embeddings.parquet", columns=["vec_id", "embedding"])
    return t.to_pandas()


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


# ---------------------------------------------------------------------------
# SimHash family
# ---------------------------------------------------------------------------

SIMHASH_BITS = 48


def _expected_simhash(text: str) -> int:
    # Spark split(text, " ") keeps empty tokens (limit -1); so does
    # Python's str.split(" ")
    counts = [0] * SIMHASH_BITS
    for w in text.split(" "):
        h = xxh64_spark(w) & _M64
        for j in range(SIMHASH_BITS):
            counts[j] += 1 if (h >> j) & 1 else -1
    return sum((1 << j) for j in range(SIMHASH_BITS) if counts[j] > 0)


@pytest.fixture(scope="module")
def expected_simhashes(docs_pdf):
    return {
        int(r.doc_id): _expected_simhash(r.text) for r in docs_pdf.itertuples()
    }


def test_simhash_recompute(spark, expected_simhashes):
    from hands_on_iceberg_compression_spark.operators.dedup import q_simhash

    got = {r.doc_id: r.simhash for r in q_simhash(spark, SF_SMALL).collect()}
    assert got == expected_simhashes


def test_simhash_near_dup_recompute(spark, expected_simhashes):
    """The banded join has pigeonhole recall 1.0 for Hamming <= 3, so its
    output must equal the brute-force all-pairs census — recomputed here
    over the pure-Python simhashes."""
    from hands_on_iceberg_compression_spark.operators.dedup import (
        HAMMING_MAX,
        q_simhash_near_dup,
    )

    ids = sorted(expected_simhashes)
    expected = sorted(
        (a, b, (expected_simhashes[a] ^ expected_simhashes[b]).bit_count())
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if (expected_simhashes[a] ^ expected_simhashes[b]).bit_count() <= HAMMING_MAX
    )
    got = _rows(q_simhash_near_dup(spark, SF_SMALL), ["doc_a", "doc_b", "hamming"])
    assert got == expected


# ---------------------------------------------------------------------------
# MinHash + LSH family (and connected components over its verified pairs)
# ---------------------------------------------------------------------------


def _trigram_set(text: str) -> set[int]:
    """Distinct trigram HASHES — r19: the engine hashes the three words
    directly (multi-arg xxhash64) instead of building a 'w1 w2 w3' string
    and hashing that; the recompute mirrors the new encoding."""
    words = text.split(" ")
    if len(words) < 3:
        return set()
    return {
        xxh64_spark(words[i], words[i + 1], words[i + 2])
        for i in range(len(words) - 2)
    }


def _expected_verified_pairs(docs_pdf):
    from hands_on_iceberg_compression_spark.operators.dedup import (
        LSH_BANDS,
        MINHASH_JACCARD_THRESHOLD,
        MINHASH_PERMS,
    )

    grams = {int(r.doc_id): _trigram_set(r.text) for r in docs_pdf.itertuples()}
    rows_per_band = MINHASH_PERMS // LSH_BANDS
    perm_bytes = [struct.pack("<i", i) for i in range(MINHASH_PERMS)]
    buckets: dict[int, list[int]] = defaultdict(list)
    for doc_id, gset in grams.items():
        if not gset:
            continue
        # xxhash64(sh, i) chains through the seed: the inner xxhash64 of the
        # 8-byte shingle hash is permutation-invariant — hoist it (gset
        # already holds the signed trigram hashes)
        bases = [xxh64(struct.pack("<q", g), _SPARK_SEED) for g in gset]
        sig = [
            min(_signed(xxh64(pb, base)) for base in bases) for pb in perm_bytes
        ]
        for b in range(LSH_BANDS):
            # r20: band bucket = ONE long, xxhash64(band id as INT literal,
            # signature slice) — the band id is hashed INTO the bucket so
            # the engine's explode emits a bare long array (no struct)
            sl = sig[b * rows_per_band : (b + 1) * rows_per_band]
            buckets[xxh64_spark(("i", b), *sl)].append(doc_id)
    cands = set()
    for members in buckets.values():
        members = sorted(set(members))
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                cands.add((a, b))
    out = []
    for a, b in sorted(cands):
        inter = len(grams[a] & grams[b])
        union = len(grams[a] | grams[b])
        j = inter / union
        if round(j, 6) >= MINHASH_JACCARD_THRESHOLD:
            out.append((a, b, j))
    return out


@pytest.fixture(scope="module")
def expected_pairs(docs_pdf):
    return _expected_verified_pairs(docs_pdf)


def test_minhash_lsh_pairs_recompute(spark, expected_pairs):
    from hands_on_iceberg_compression_spark.operators.dedup import q_minhash_lsh_pairs

    got = _rows(q_minhash_lsh_pairs(spark, SF_SMALL), ["doc_a", "doc_b", "jaccard"])
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in expected_pairs]
    for (_, _, gj), (_, _, ej) in zip(got, expected_pairs):
        assert abs(gj - ej) <= 1e-6
    assert len(got) > 0  # the fixture is built to contain near-dup clusters


def test_cluster_sizes_recompute(spark, expected_pairs):
    """Union-find over the recomputed verified-pair graph must reproduce the
    engine's min-label-propagation cluster-size histogram exactly."""
    from hands_on_iceberg_compression_spark.operators.dedup import (
        q_dedup_cluster_sizes,
    )

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _ in expected_pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    sizes = defaultdict(int)
    for v in parent:
        sizes[find(v)] += 1
    hist = defaultdict(int)
    for s in sizes.values():
        hist[s] += 1
    expected = sorted(hist.items())
    got = _rows(q_dedup_cluster_sizes(spark, SF_SMALL), ["cluster_size", "n_clusters"])
    assert got == expected


# ---------------------------------------------------------------------------
# Winnowing fingerprints
# ---------------------------------------------------------------------------


def test_winnow_fingerprints_recompute(spark, docs_pdf):
    from hands_on_iceberg_compression_spark.operators.textops import (
        WINNOW_K,
        WINNOW_W,
        q_winnow_fingerprints,
    )

    expected = {}
    for r in docs_pdf.itertuples():
        words = r.text.split(" ")
        n = len(words)
        if n < WINNOW_K:
            continue
        g = [
            xxh64_spark(" ".join(words[i : i + WINNOW_K]))
            for i in range(n - WINNOW_K + 1)
        ]
        last0 = n - WINNOW_K
        hi = max(1, last0 - (WINNOW_W - 2))
        mins = [min(g[s - 1 : s - 1 + WINNOW_W]) for s in range(1, hi + 1)]
        fps = sorted(set(mins))
        expected[int(r.doc_id)] = (len(fps), ",".join(str(x) for x in fps))

    got = {
        r.doc_id: (r.n_fingerprints, r.fingerprints)
        for r in q_winnow_fingerprints(spark, SF_SMALL).collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# ANN family: exact kNN, LSH, IVF, and the recall census
# ---------------------------------------------------------------------------


def _unit_vectors(emb_pdf):
    """Sequential-fold normalization, replicating F.aggregate's evaluation
    order bitwise (float32 -> double casts are exact)."""
    units = {}
    for r in emb_pdf.itertuples():
        acc = 0.0
        vec = [float(x) for x in r.embedding]
        for x in vec:
            acc = acc + x * x
        nrm = math.sqrt(acc)
        units[int(r.vec_id)] = [x / nrm for x in vec]
    return units


def _fold_dot(a: list[float], b: list[float]) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _topk(sims: list[tuple[int, float]], k: int) -> list[tuple[int, int, float]]:
    """rank/n_id/sim triples ordered by (sim desc, n_id) — the engine's
    deterministic tie-break."""
    ranked = sorted(sims, key=lambda t: (-t[1], t[0]))[:k]
    return [(rank + 1, nid, sim) for rank, (nid, sim) in enumerate(ranked)]


@pytest.fixture(scope="module")
def units(emb_pdf):
    return _unit_vectors(emb_pdf)


@pytest.fixture(scope="module")
def expected_exact_topk(units):
    from hands_on_iceberg_compression_spark.operators.similarity import (
        N_QUERIES,
        TOPK,
    )

    out = {}
    for q in range(N_QUERIES):
        sims = [(n, _fold_dot(units[q], u)) for n, u in units.items() if n != q]
        out[q] = _topk(sims, TOPK)
    return out


def test_knn_bruteforce_recompute(spark, expected_exact_topk):
    from hands_on_iceberg_compression_spark.operators.similarity import (
        q_knn_bruteforce,
    )

    got = q_knn_bruteforce(spark, SF_SMALL).collect()
    exp = {
        (q, rank): (nid, sim)
        for q, rows in expected_exact_topk.items()
        for rank, nid, sim in rows
    }
    assert len(got) == len(exp)
    for r in got:
        nid, sim = exp[(r.q_id, r.rank)]
        assert r.n_id == nid
        assert abs(r.sim - sim) <= 1e-6


def _expected_lsh_topk(units):
    """Multi-table multi-probe LSH recomputed: hyperplanes from the same
    public seeded numpy PRNG, signatures from one matmul at the engine's
    batch shape (only the sign is load-bearing), candidates and rerank in
    plain Python."""
    from hands_on_iceberg_compression_spark.operators.similarity import (
        LSH_SEED,
        LSH_TABLES,
        N_QUERIES,
        TARGET_BUCKET,
        TOPK,
        _adaptive_bits,
    )

    n = len(units)
    bits = _adaptive_bits(n, TARGET_BUCKET)
    dim = len(next(iter(units.values())))
    rng = np.random.RandomState(LSH_SEED)
    planes = rng.standard_normal((LSH_TABLES, bits, dim)).reshape(
        LSH_TABLES * bits, dim
    ).T
    ids = sorted(units)
    mat = np.array([units[i] for i in ids])
    hyp = (mat @ planes) > 0
    weights = (2 ** np.arange(bits)).astype(np.int64)
    sigs = hyp.reshape(len(ids), LSH_TABLES, bits) @ weights  # n x tables

    buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
    for row, vid in enumerate(ids):
        for t in range(LSH_TABLES):
            buckets[(t, int(sigs[row, t]))].append(vid)

    out = {}
    for q in range(N_QUERIES):
        qrow = ids.index(q)
        cands = set()
        for t in range(LSH_TABLES):
            base = int(sigs[qrow, t])
            for probe in [base] + [base ^ (1 << j) for j in range(bits)]:
                for vid in buckets.get((t, probe), ()):
                    if vid != q:
                        cands.add(vid)
        sims = [(nid, _fold_dot(units[q], units[nid])) for nid in cands]
        out[q] = _topk(sims, TOPK)
    return out


def _expected_ivf_topk(units):
    from hands_on_iceberg_compression_spark.operators.similarity import (
        IVF_CENTROIDS,
        IVF_PROBES,
        N_QUERIES,
        TOPK,
    )

    centroids = {c: units[c] for c in range(IVF_CENTROIDS)}
    assign = {}
    for vid, u in units.items():
        best = max(
            centroids, key=lambda c: (_fold_dot(u, centroids[c]), -c)
        )
        assign[vid] = best
    lists = defaultdict(list)
    for vid, c in assign.items():
        lists[c].append(vid)

    out = {}
    for q in range(N_QUERIES):
        ranked = sorted(
            centroids, key=lambda c: (-_fold_dot(units[q], centroids[c]), c)
        )[:IVF_PROBES]
        cands = [vid for c in ranked for vid in lists[c] if vid != q]
        sims = [(nid, _fold_dot(units[q], units[nid])) for nid in cands]
        out[q] = _topk(sims, TOPK)
    return out


def test_ann_lsh_recompute(spark, units):
    from hands_on_iceberg_compression_spark.operators.similarity import q_ann_lsh

    expected = {
        (q, rank): (nid, sim)
        for q, rows in _expected_lsh_topk(units).items()
        for rank, nid, sim in rows
    }
    got = q_ann_lsh(spark, SF_SMALL).collect()
    assert len(got) == len(expected)
    for r in got:
        nid, sim = expected[(r.q_id, r.rank)]
        assert r.n_id == nid
        assert abs(r.sim - sim) <= 1e-6


def test_ann_ivf_recompute(spark, units):
    from hands_on_iceberg_compression_spark.operators.similarity import q_ann_ivf

    expected = {
        (q, rank): (nid, sim)
        for q, rows in _expected_ivf_topk(units).items()
        for rank, nid, sim in rows
    }
    got = q_ann_ivf(spark, SF_SMALL).collect()
    assert len(got) == len(expected)
    for r in got:
        nid, sim = expected[(r.q_id, r.rank)]
        assert r.n_id == nid
        assert abs(r.sim - sim) <= 1e-6


def test_ann_recall_recompute(spark, units, expected_exact_topk):
    """The driver-visible recall census must match the recall of the
    recomputed indexes against the recomputed exact baseline — exact row
    pins, not just >= floors."""
    from hands_on_iceberg_compression_spark.operators.similarity import q_ann_recall

    exact = {
        (q, nid)
        for q, rows in expected_exact_topk.items()
        for _, nid, _ in rows
    }
    expected_rows = []
    for method, topk in (
        ("ivf", _expected_ivf_topk(units)),
        ("lsh", _expected_lsh_topk(units)),
    ):
        approx = {(q, nid) for q, rows in topk.items() for _, nid, _ in rows}
        hits = len(exact & approx)
        expected_rows.append((method, len(exact), hits, round(hits / len(exact), 4)))

    got = [
        (r.method, r.n_exact, r.n_hits, r.recall_at_k)
        for r in q_ann_recall(spark, SF_SMALL).orderBy("method").collect()
    ]
    assert [g[:3] for g in got] == [e[:3] for e in expected_rows]
    for g, e in zip(got, expected_rows):
        assert abs(g[3] - e[3]) <= 1e-4


# ---------------------------------------------------------------------------
# Multimodal feature extraction (Python decode path)
# ---------------------------------------------------------------------------


def test_mm_features_recompute(spark, docs_pdf):
    """The mapInPandas feature extractor is rows-only for the driver (the
    decode is a Python path, not SQL) — pin it here instead: payload bytes,
    crc32, head_hex, and the 8-d byte-histogram moments are all recomputed
    from the raw text with zlib + plain loops, no Spark."""
    import zlib

    from hands_on_iceberg_compression_spark.operators.multimodal import q_mm_features

    got = {r.doc_id: r for r in q_mm_features(spark, SF_SMALL).collect()}
    assert set(got) == {int(r.doc_id) for r in docs_pdf.itertuples()}
    for r in docs_pdf.itertuples():
        payload = r.text.encode("utf-8")
        g = got[int(r.doc_id)]
        assert g.n_bytes == len(payload)
        assert g.crc32 == (zlib.crc32(payload) & 0xFFFFFFFF)
        assert g.head_hex == payload[:8].hex()
        if payload:
            arr = list(payload[:1024])
            n = len(arr)
            mean = sum(arr) / n
            var = sum((x - mean) ** 2 for x in arr) / n
            exp = [
                float(n), round(mean, 4), round(var, 4), float(min(arr)),
                float(max(arr)), float(arr[0]), float(arr[-1]),
                float(sum(arr) % 997),
            ]
        else:
            exp = [0.0] * 8
        feat = [float(x) for x in g.feature.split(",")]
        assert len(feat) == 8
        assert all(abs(a - b) <= 1e-9 for a, b in zip(feat, exp)), (g.doc_id, feat, exp)


def test_knn_vectorized_recompute(spark, expected_exact_topk):
    """The numpy-matmul kNN must agree with the recomputed exact baseline:
    same ids and ranks, sims within BLAS-vs-fold noise (their gap is
    ~1e-16; neighbor sim gaps are ~1e-3, so ranks cannot legitimately
    differ)."""
    from hands_on_iceberg_compression_spark.operators.similarity import (
        q_knn_vectorized,
    )

    exp = {
        (q, rank): (nid, sim)
        for q, rows in expected_exact_topk.items()
        for rank, nid, sim in rows
    }
    got = q_knn_vectorized(spark, SF_SMALL).collect()
    assert len(got) == len(exp)
    for r in got:
        nid, sim = exp[(r.q_id, r.rank)]
        assert r.n_id == nid
        assert abs(r.sim - sim) <= 1e-6


def test_near_dup_lsh_recompute(spark, units):
    """The sub-quadratic near-dup pair query: recompute the LSH candidate
    pair space (TARGET_BUCKET_PAIRS-derived bits) and the exact rerank,
    then pin the top-NEAR_DUP_TOPK rows."""
    from hands_on_iceberg_compression_spark.operators.similarity import (
        LSH_SEED,
        LSH_TABLES,
        NEAR_DUP_TOPK,
        TARGET_BUCKET_PAIRS,
        _adaptive_bits,
        q_near_dup_lsh,
    )

    n = len(units)
    bits = _adaptive_bits(n, TARGET_BUCKET_PAIRS)
    dim = len(next(iter(units.values())))
    rng = np.random.RandomState(LSH_SEED)
    planes = rng.standard_normal((LSH_TABLES, bits, dim)).reshape(
        LSH_TABLES * bits, dim
    ).T
    ids = sorted(units)
    mat = np.array([units[i] for i in ids])
    hyp = (mat @ planes) > 0
    weights = (2 ** np.arange(bits)).astype(np.int64)
    sigs = hyp.reshape(len(ids), LSH_TABLES, bits) @ weights

    buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
    for row, vid in enumerate(ids):
        for t in range(LSH_TABLES):
            buckets[(t, int(sigs[row, t]))].append(vid)
    cands = set()
    for members in buckets.values():
        members = sorted(set(members))
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                cands.add((a, b))
    ranked = sorted(
        (
            (a, b, round(_fold_dot(units[a], units[b]), 6))
            for a, b in cands
        ),
        key=lambda t: (-t[2], t[0], t[1]),
    )[:NEAR_DUP_TOPK]

    got = [
        (r.id_a, r.id_b, r.sim)
        for r in q_near_dup_lsh(spark, SF_SMALL).collect()
    ]
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in ranked]
    for (_, _, gs), (_, _, es) in zip(got, ranked):
        assert abs(gs - es) <= 1e-6


def test_ann_ivf_kmeans_recompute(spark, units):
    """Lloyd-refined IVF pinned against a pure-Python k-means replica.
    Distributed per-dimension means differ from the sequential fold at
    ~1e-16, which only matters if an assignment or probe ranking is
    near-tied at that scale — on the fixture the gaps are ~1e-3, so ids
    and ranks must match exactly (sims compare on the raw unit vectors and
    replicate bitwise)."""
    from hands_on_iceberg_compression_spark.operators.similarity import (
        IVF_CENTROIDS,
        IVF_PROBES,
        KMEANS_ITERS,
        N_QUERIES,
        TOPK,
        q_ann_ivf_kmeans,
    )

    dim = len(next(iter(units.values())))
    centroids = {c: list(units[c]) for c in range(IVF_CENTROIDS)}
    for _ in range(KMEANS_ITERS):
        assign = {
            vid: max(centroids, key=lambda c: (_fold_dot(u, centroids[c]), -c))
            for vid, u in units.items()
        }
        sums = {c: [0.0] * dim for c in centroids}
        counts = {c: 0 for c in centroids}
        for vid, c in assign.items():
            counts[c] += 1
            for p, x in enumerate(units[vid]):
                sums[c][p] += x
        for c in centroids:
            if counts[c]:
                centroids[c] = [s / counts[c] for s in sums[c]]

    assign = {
        vid: max(centroids, key=lambda c: (_fold_dot(u, centroids[c]), -c))
        for vid, u in units.items()
    }
    lists = defaultdict(list)
    for vid, c in assign.items():
        lists[c].append(vid)

    expected = {}
    for q in range(N_QUERIES):
        probed = sorted(
            centroids, key=lambda c: (-_fold_dot(units[q], centroids[c]), c)
        )[:IVF_PROBES]
        cands = [vid for c in probed for vid in lists[c] if vid != q]
        sims = [(nid, _fold_dot(units[q], units[nid])) for nid in cands]
        for rank, nid, sim in _topk(sims, TOPK):
            expected[(q, rank)] = (nid, sim)

    got = q_ann_ivf_kmeans(spark, SF_SMALL).collect()
    assert len(got) == len(expected)
    for r in got:
        nid, sim = expected[(r.q_id, r.rank)]
        assert r.n_id == nid
        assert abs(r.sim - sim) <= 1e-6


# ---------------------------------------------------------------------------
# Generator DSL (A1-A9 through the driver surface)
# ---------------------------------------------------------------------------


def test_gen_narrow_sample_recompute(spark):
    """The deterministic data generator, replicated row-for-row in pure
    Python: every draw is xxhash64(id, column, salt, seed[, slot]) -> pmod
    2^40 -> double, so the same public-spec hash plus IEEE double ops
    reproduce ints, doubles, md5-block strings, enums, timestamps, array
    lengths/slots, and the nullable gates exactly."""
    import datetime as dt
    import hashlib
    import math

    from hands_on_iceberg_compression_spark.operators.advanced import (
        q_gen_narrow_sample,
    )

    DEN = 1 << 40
    SEED = 42

    def uni(rid, name, salt, *extra):
        h = xxh64_spark(rid, name, salt, ("i", SEED), *extra)
        return (h % DEN) / float(DEN)

    def md5str(rid, name, length, *extra):
        out = ""
        for b in range((length + 31) // 32):
            parts = [str(rid), name, f"str{b}", str(SEED)] + [str(e) for e in extra]
            out += hashlib.md5("|".join(parts).encode()).hexdigest()
        return out[:length]

    t0 = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())
    t1 = int(dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc).timestamp())
    STATUS = ("new", "paid", "delivered", "canceled")
    COUNTRY = ("KZ", "US", "DE", "TR", "PL")
    TAGS = ("alpha", "beta", "gamma", "delta")

    def expected_row(rid):
        amount = None
        if not uni(rid, "amount", "null") < 0.05:
            amount = round(0 + uni(rid, "amount", "val") * 10000, 6)
        country = None
        if not uni(rid, "country", "null") < 0.02:
            u = uni(rid, "country", "val")
            country = COUNTRY[math.floor(u * len(COUNTRY))]
        age = None
        if not uni(rid, "age", "null") < 0.03:
            age = 18 + math.floor(uni(rid, "age", "val") * 61)
        note = None
        if not uni(rid, "note", "null") < 0.1:
            note = md5str(rid, "note", 8)
        tags = None
        if not uni(rid, "tags", "null") < 0.1:
            n = 1 + math.floor(uni(rid, "tags", "len") * 3)
            tags = ",".join(
                TAGS[math.floor(uni(rid, "tags", "val", ("i", i)) * len(TAGS))]
                for i in range(1, n + 1)
            )
        ts = dt.datetime.fromtimestamp(
            t0 + math.floor(uni(rid, "created_at", "val") * (t1 - t0)),
            tz=dt.timezone.utc,
        ).replace(tzinfo=None)
        return {
            "id": rid,
            "user_name": md5str(rid, "user_name", 16),
            "amount": amount,
            "created_at": ts,
            "status": STATUS[math.floor(uni(rid, "status", "val") * len(STATUS))],
            "country": country,
            "age": age,
            "note": note,
            "tags": tags,
        }

    got = {r.id: r for r in q_gen_narrow_sample(spark, SF_SMALL).collect()}
    assert len(got) == 1000
    n_null = 0
    for rid in range(1, 1001):
        e = expected_row(rid)
        g = got[rid]
        for k, v in e.items():
            gv = getattr(g, k)
            if v is None:
                assert gv is None, (rid, k, gv)
                n_null += 1
            elif k == "amount":
                assert abs(gv - v) <= 1e-6, (rid, k, gv, v)
            else:
                assert gv == v, (rid, k, gv, v)
    assert n_null > 100  # the nullable gates actually fire
